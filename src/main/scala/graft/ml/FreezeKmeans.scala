package graft.ml

import org.apache.spark.ml.clustering.KMeansModel
import org.apache.spark.ml.feature.StandardScalerModel

/** One-off trainer behind [[FrozenJobKmeans]]'s constants (mq15): fits
  * the reference-shaped job clusterer (`models/job_clustering_kmeans`
  * metadata — scale → k-means k=5 seed=42, the exact pipeline
  * [[Pipelines.kmeans]] builds and mq02 trains) on the sf0.01
  * featurized postings, then writes every SERVING constant as Scala
  * literals: the scaler's per-feature (mean, std) and the 5 fitted
  * centroids in SCALED space. Assignment needs nothing else — it is an
  * argmin of squared L2 over published numbers, so the frozen replay
  * is independent of the trainer entirely.
  *
  * Constants go to a UTF-8 FILE, not just stdout (sbt's console
  * charset mangles non-ASCII — the r14 freeze-tool lesson; these are
  * all digits, but the discipline stands).
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.ml.FreezeKmeans"
  */
object FreezeKmeans {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Sessions.local("graft-freeze-kmeans",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    import org.apache.spark.sql.functions._
    val cols = "salary_final" +: graft.queries.MlQueries.jobFeatureCols
    // the exact mq02 training frame (limit is a no-op at sf0.01's
    // 12,857 rows; the fill touches nothing after the postings filters
    // but is kept for shape fidelity)
    val feats = graft.queries.MlQueries.featurizedJobs(spark, dir)
      .select(cols.map(col): _*)
      .limit(50000)
      .na.fill(0.0)
      .coalesce(8).cache()
    val n = feats.count()
    val model = Pipelines.kmeans(cols.toArray).fit(feats)
    val scaler = model.stages(1).asInstanceOf[StandardScalerModel]
    val km = model.stages.last.asInstanceOf[KMeansModel]
    val means = scaler.mean.toArray
    val stds = scaler.std.toArray
    val cents = km.clusterCenters.map(_.toArray)
    require(cents.length == 5 && cents.forall(_.length == cols.length),
      s"unexpected centroid layout: ${cents.length} × ${cents.head.length}")
    // Spark's StandardScaler maps a ZERO-VARIANCE feature to 0.0 (it
    // never divides by a zero std), so that feature is the constant 0
    // in scaled space — and the fitted centroids' coordinate there is
    // exactly 0.0 too (the mean of all-zero values). It contributes 0
    // to every squared distance, so the frozen serving arithmetic DROPS
    // it; the assertion below is what makes the drop sound.
    val live = stds.indices.filter(stds(_) > 0.0)
    val dead = stds.indices.filterNot(stds(_) > 0.0)
    dead.foreach { i =>
      require(cents.forall(_(i) == 0.0),
        s"zero-variance feature ${cols(i)} has a nonzero centroid coord " +
          "— the drop-it rule would change distances") }
    val sb = new StringBuilder
    sb ++= s"// frozen from Pipelines.kmeans(k=5, seed=42) fit on $dir " +
      s"($n rows), features = (salary_final, exp_final, 15 flags); " +
      s"zero-variance (dropped): ${dead.map(cols(_)).mkString(",")}\n"
    sb ++= "val featureNames: Seq[String] = Seq(\n  " +
      live.map(i => s""""${cols(i)}"""").mkString(", ") + ")\n"
    sb ++= "val means: Seq[Double] = Seq(\n  " +
      live.map(means(_)).mkString(", ") + ")\n"
    sb ++= "val stds: Seq[Double] = Seq(\n  " +
      live.map(stds(_)).mkString(", ") + ")\n"
    sb ++= "val centroids: Seq[Seq[Double]] = Seq(\n"
    cents.foreach { c =>
      sb ++= "  Seq(" + live.map(c(_)).mkString(", ") + "),\n" }
    sb ++= ")\n"
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/tmp/frozen_kmeans.txt"),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(sb.toString)
    println("written to /tmp/frozen_kmeans.txt (UTF-8)")
    spark.stop()
  }
}

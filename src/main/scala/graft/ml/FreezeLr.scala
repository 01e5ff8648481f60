package graft.ml

import org.apache.spark.ml.classification.LogisticRegressionModel
import org.apache.spark.ml.feature.StringIndexerModel

/** One-off trainer behind [[FrozenAttractivenessLr]]'s constants (mq14):
  * fits the reference-shaped attractiveness logistic
  * (job_attractiveness_logistic_v2 metadata — indexed/one-hot city +
  * position_level over the numeric pair, regParam=0.01, the exact
  * pipeline [[Pipelines.attractivenessLogistic]] builds and mq05
  * trains) on the full sf0.01 featurized postings, then prints every
  * serving constant as the Scala literals to paste into
  * FrozenAttractivenessLr: intercept, the two numeric weights, and the
  * per-category one-hot weights keyed by the LABEL STRING (the
  * StringIndexer's fitted ordering is data-dependent; publishing
  * label→weight pairs makes the frozen replay independent of it).
  * LBFGS on fixed data from the default initial point is
  * deterministic, so a re-run re-derives the same constants.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.ml.FreezeLr"
  */
object FreezeLr {

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Sessions.local("graft-freeze-lr",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    import org.apache.spark.sql.functions._
    val feats = graft.queries.MlQueries.featurizedJobs(spark, dir)
      .withColumn("is_hot", (col("salary_final") > 25).cast("double"))
      .select(col("city"), col("position_level"), col("salary_final"),
        col("exp_final"), col("is_hot"))
      .coalesce(8).cache()
    val n = feats.count()
    val model = Pipelines
      .attractivenessLogistic(Array("salary_final", "exp_final")).fit(feats)
    val cityIdx = model.stages(0).asInstanceOf[StringIndexerModel]
    val posIdx = model.stages(1).asInstanceOf[StringIndexerModel]
    val lr = model.stages.last.asInstanceOf[LogisticRegressionModel]
    val cityLabels = cityIdx.labelsArray(0)
    val posLabels = posIdx.labelsArray(0)
    val w = lr.coefficients.toArray
    // assembler layout: [salary_final, exp_final] ++ city_vec ++ pos_vec.
    // handleInvalid=keep adds one indexer slot for unseen values; OHE's
    // default dropLast drops exactly that slot, so each one-hot block
    // has one weight PER SEEN LABEL and an unseen/null value scores all
    // blocks zero — the frozen CASE replays that as its ELSE 0.0.
    require(w.length == 2 + cityLabels.length + posLabels.length,
      s"unexpected coefficient layout: ${w.length} weights for " +
        s"2 numeric + ${cityLabels.length} city + ${posLabels.length} pos")
    val sb = new StringBuilder
    sb ++= s"// frozen from LogisticRegression(regParam=0.01) fit on $dir " +
      s"($n rows), features = (salary_final, exp_final, city one-hot, " +
      "position_level one-hot), label is_hot = salary_final > 25\n"
    sb ++= s"val intercept: Double = ${lr.intercept}\n"
    sb ++= s"val wSalary: Double = ${w(0)}\n"
    sb ++= s"val wExp: Double = ${w(1)}\n"
    sb ++= "val cityWeights: Seq[(String, Double)] = Seq(\n"
    cityLabels.zipWithIndex.foreach { case (l, i) =>
      sb ++= s"""  ("$l", ${w(2 + i)}),\n""" }
    sb ++= ")\nval posWeights: Seq[(String, Double)] = Seq(\n"
    posLabels.zipWithIndex.foreach { case (l, i) =>
      sb ++= s"""  ("$l", ${w(2 + cityLabels.length + i)}),\n""" }
    sb ++= ")\n"
    // stdout mangles non-ASCII under sbt's console charset — the paste
    // source of truth is the UTF-8 file
    java.nio.file.Files.write(java.nio.file.Paths.get("/tmp/frozen_lr.txt"),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(sb.toString)
    println("written to /tmp/frozen_lr.txt (UTF-8)")
    spark.stop()
  }
}

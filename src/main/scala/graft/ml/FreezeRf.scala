package graft.ml

import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}

/** One-off trainer behind [[FrozenSalaryRf]]'s constants (mq13): fits
  * the reference-shaped salary forest (train_random_forest.py features,
  * a deliberately SMALL serving model — 3 trees, depth 3, seed 42 — the
  * "publish a trained model's parameters" move of jq08's centroids) on
  * the sf0.01 featurized postings and prints each tree as the Scala
  * literal to paste into FrozenSalaryRf. Re-run to re-freeze:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.ml.FreezeRf"
  */
object FreezeRf {

  private def render(n: Node): String = n match {
    case l: LeafNode => s"L(${l.prediction})"
    case i: InternalNode => i.split match {
      case c: ContinuousSplit =>
        s"S(${c.featureIndex}, ${c.threshold}, ${render(i.leftChild)}, ${render(i.rightChild)})"
      case other => throw new IllegalStateException(
        s"unexpected split type ${other.getClass} — all 16 features are continuous")
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Sessions.local("graft-freeze-rf",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    import org.apache.spark.sql.functions._
    val featCols = graft.queries.MlQueries.jobFeatureCols
    val feats = graft.queries.MlQueries.featurizedJobs(spark, dir)
      .select((col("salary_final") +: featCols.map(col)): _*)
      .na.fill(0.0).coalesce(8).cache()
    // raw features, no scaler stage: tree splits are scale-invariant,
    // and raw-unit thresholds make the frozen replay a plain
    // comparison on the ETL columns in BOTH engines
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featCols).setOutputCol("features")
      .transform(feats)
    val rf = new org.apache.spark.ml.regression.RandomForestRegressor()
      .setLabelCol("salary_final").setFeaturesCol("features")
      .setNumTrees(3).setMaxDepth(3).setSeed(42)
      .fit(assembled)
    println(s"// frozen from RandomForestRegressor(numTrees=3, maxDepth=3, " +
      s"seed=42) fit on $dir (${feats.count()} rows), features = " +
      featCols.mkString("(", ", ", ")"))
    rf.trees.zipWithIndex.foreach { case (t, i) =>
      println(s"// tree $i (weight ${rf.treeWeights(i)})")
      println(render(t.rootNode) + ",")
    }
    spark.stop()
  }
}

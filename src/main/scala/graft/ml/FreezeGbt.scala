package graft.ml

import org.apache.spark.ml.tree.{ContinuousSplit, InternalNode, LeafNode, Node}
import org.apache.spark.sql.functions._

/** One-off trainer behind [[FrozenSkillGbt]]'s constants (mq17): fits
  * the reference-shaped hot-score GBT (train_gbt.py:147-153 —
  * maxIter=50, maxDepth=5, seed=42) on the sf0.01 per-skill aggregate
  * and prints the ensemble — every tree plus its boosting weight — as
  * the Scala literal to paste into FrozenSkillGbt. Like [[FreezeRf]]
  * it trains on RAW features (tree splits are scale-invariant, and
  * mq04's scaler stage would put thresholds in scaled units the oracle
  * could only reach through frozen means/stds); unlike the forest
  * AVERAGE the GBT serves a boosting-WEIGHTED sum, so the weights are
  * part of the published model.
  *
  * Before printing, the replay column (the exact arithmetic
  * [[FrozenSkillGbt.scoreCol]] will serve) is validated against
  * `model.transform`'s prediction on every training row. NOT bitwise:
  * spark.ml's GBT predict is `blas.dot(treePredictions, treeWeights)`
  * and the netlib dot may VECTORIZE the reduction (measured: 7 of 10
  * rows differ in the last ulps vs a sequential fold), so the gate is
  * a 1e-12 relative bound — the replay's own determinism (Spark side ≡
  * DuckDB side) is what mq17 hash-checks, and THAT is exact because
  * both sides spell out the same left-associated sum. Re-run to
  * re-freeze:
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 sbt "runMain graft.ml.FreezeGbt"
  */
object FreezeGbt {

  private def render(n: Node): String = n match {
    case l: LeafNode => s"L(${l.prediction})"
    case i: InternalNode => i.split match {
      case c: ContinuousSplit =>
        s"S(${c.featureIndex}, ${c.threshold}, ${render(i.leftChild)}, ${render(i.rightChild)})"
      case other => throw new IllegalStateException(
        s"unexpected split type ${other.getClass} — all 4 features are continuous")
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = graft.Sessions.local("graft-freeze-gbt",
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt)
    val featCols = FrozenSkillGbt.featureNames
    val skills = graft.queries.MlQueries.skillHotFrame(spark, dir)
      .select((col("skill") +: col("skill_hot_score") +:
        featCols.map(c => col(c).cast("double").as(c))): _*)
      .coalesce(1) // ~10 skill rows: 50 boosting iterations × 32 near-empty tasks is pure overhead
      .cache()
    val assembled = new org.apache.spark.ml.feature.VectorAssembler()
      .setInputCols(featCols.toArray).setOutputCol("features")
      .transform(skills)
    val gbt = new org.apache.spark.ml.regression.GBTRegressor()
      .setLabelCol("skill_hot_score").setFeaturesCol("features")
      .setMaxIter(50).setMaxDepth(5).setSeed(42)
      .fit(assembled)
    // replay-vs-transform validation over every training row (see the
    // scaladoc: blas.dot may vectorize, so within-1e-12-relative, not
    // bitwise — the Spark↔DuckDB replay itself IS bitwise)
    val replayed = gbt.transform(assembled).withColumn("replay",
      FrozenSkillGbt.scoreColOf(
        gbt.trees.map(t => toFrozen(t.rootNode)).toSeq,
        gbt.treeWeights.toSeq,
        i => col(featCols(i))))
    val maxRel = replayed.agg(max(abs(col("replay") - col("prediction")) /
        greatest(abs(col("prediction")), lit(1e-300)))).head().getDouble(0)
    println(s"// replay vs model.transform: max relative diff $maxRel")
    require(maxRel < 1e-12,
      s"replay diverged from model.transform: max relative diff $maxRel")
    println(s"// frozen from GBTRegressor(maxIter=50, maxDepth=5, seed=42) " +
      s"fit on $dir (${skills.count()} skill rows), features = " +
      featCols.mkString("(", ", ", ")"))
    println(s"// treeWeights: Seq(${gbt.treeWeights.mkString(", ")})")
    gbt.trees.zipWithIndex.foreach { case (t, i) =>
      println(s"// tree $i")
      println(render(t.rootNode) + ",")
    }
    spark.stop()
  }

  /** spark.ml node → the frozen ADT (used by the validation pass). */
  def toFrozen(n: Node): FrozenSkillGbt.Node = n match {
    case l: LeafNode => FrozenSkillGbt.L(l.prediction)
    case i: InternalNode => i.split match {
      case c: ContinuousSplit => FrozenSkillGbt.S(c.featureIndex,
        c.threshold, toFrozen(i.leftChild), toFrozen(i.rightChild))
      case other => throw new IllegalStateException(
        s"unexpected split type ${other.getClass}")
    }
  }
}

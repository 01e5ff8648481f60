package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * A table sorted by ONE column gives perfect file-level min/max pruning
  * on that column and none on any other: every x-stripe file spans the
  * full y range, so a predicate on y touches every file. Interleaving
  * the bits of both dimensions into one sort key gives each file a small
  * BOUNDING BOX in (x, y) space — file min/max stats then prune scans
  * filtered on x, on y, or both. This is how lakehouse engines cluster
  * 100 TB fact tables for two-dimensional access (date × tenant,
  * lang × length); parquet row-group stats do the skipping for free at
  * read time. Pure Column bit arithmetic — codegen'd, no UDF.
  */
object ZOrder {

  /** Morton code of two columns already quantized to [0, 2^bits):
    * bit i of `a` lands at position 2i, bit i of `b` at 2i+1. */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_.bitwiseOR(_))

  /** Affine quantization of a bounded numeric column to [0, 2^bits). */
  def quantize(c: Column, minV: Column, maxV: Column, bits: Int): Column = {
    val buckets = math.pow(2, bits)
    val span = (maxV - minV).cast("double") + 1.0
    floor((c - minV).cast("double") / span * buckets).cast("long")
  }

  /** Cluster `df` into `nFiles` contiguous z-ranges over (colA, colB).
    * Bounds for quantization come from one tiny broadcast aggregate (no
    * driver collect); the range partitioning on the z-value is what makes
    * each output file a compact bounding box. */
  def cluster(df: DataFrame, colA: String, colB: String,
      nFiles: Int, bits: Int = 16): DataFrame = {
    val bounds = df.agg(
      min(col(colA)).as("__amin"), max(col(colA)).as("__amax"),
      min(col(colB)).as("__bmin"), max(col(colB)).as("__bmax"))
    df.crossJoin(broadcast(bounds))
      .withColumn("__z", zValue(
        quantize(col(colA), col("__amin"), col("__amax"), bits),
        quantize(col(colB), col("__bmin"), col("__bmax"), bits), bits))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z", "__amin", "__amax", "__bmin", "__bmax")
  }
}

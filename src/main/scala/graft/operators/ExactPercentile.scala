package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact per-group quantiles with bounded executor memory — the 100 TB
  * replacement for Spark's `percentile` aggregate, which buffers every
  * value of a group inside ONE task's aggregation buffer (the round-1
  * review's canonical scale-killer).
  *
  * Bucket-and-refine, fully declarative (no collect, no driver loops —
  * every intermediate is a DataFrame, the heavy ones never leave the
  * executors):
  *
  *   1. per-group (min, max, count): one hash-agg shuffle of three
  *      numbers per group;
  *   2. per-(group, equi-width bucket) histogram: one hash-agg shuffle of
  *      one long per POPULATED bucket (≤ nBuckets rows per group);
  *   3. locate, on the tiny histogram frame only: cumulative counts via a
  *      window over buckets, then a broadcast range-join pins each
  *      quantile's two neighbor GLOBAL ranks (h = q(n−1), 1-indexed
  *      ⌊h⌋+1 and ⌊h⌋+2) to their (bucket, in-bucket rank);
  *   4. refine: rows of boundary buckets only survive a broadcast semi
  *      join; a window sort WITHIN each boundary bucket (disk-spillable —
  *      a pathological all-equal-values bucket degrades to an external
  *      sort, never an OOM) ranks them, an equi-join on (group, bucket,
  *      in-bucket rank) picks the neighbor values, and the final
  *      interpolation `lower + frac·(upper − lower)` matches
  *      `percentile` / `quantile_cont` exactly.
  *
  * Cost: three scans of (group, value) — all fully parallel — vs one scan
  * that cannot parallelize beyond the group count and holds whole groups
  * in memory. Groups with zero non-null values are absent from the output
  * (the caller sees the same groups a non-null-counting aggregate would).
  */
object ExactPercentile {

  /** @param qs       quantiles in [0,1]
    * @param outNames one output column name per q
    * @return one row per group: groupCol, outNames… (exact continuous
    *         quantiles of valueCol) */
  def quantiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double], outNames: Seq[String], nBuckets: Int = 8192): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1), "qs must be in [0,1]")
    require(qs.size == outNames.size, "one output name per quantile")

    // Narrow (group, value) base. The three passes below each re-scan it;
    // with column pruning the scan is two columns wide, so re-reading
    // beats materializing (measured: repartition+cache variants were
    // 1.6-2× slower at sf0.1). At cluster scale callers that already paid
    // for an expensive upstream transform should pass in a cached frame.
    val base = df
      .select(col(groupCol).as("g"), col(valueCol).cast("double").as("v"))
      .filter(col("v").isNotNull)

    // 1. per-group extent + count (tiny: one row per group)
    val stats = base.groupBy(col("g"))
      .agg(min(col("v")).as("mn"), max(col("v")).as("mx"),
        count(col("v")).as("n"))

    // equi-width bucket id over the group's [mn, mx]; max value clamped
    // into the top bucket; single-valued groups collapse to bucket 0
    def bucket: Column =
      when(col("mx") === col("mn"), lit(0L)).otherwise(
        least(lit(nBuckets - 1L),
          floor((col("v") - col("mn")) / ((col("mx") - col("mn")) / nBuckets))
            .cast("long")))

    // 2. per-(group, populated bucket) histogram (≤ nBuckets rows/group)
    val hist = base.join(broadcast(stats), Seq("g"))
      .withColumn("b", bucket)
      .groupBy(col("g"), col("b")).agg(count(lit(1)).as("c"))

    // 3a. cumulative count BEFORE each bucket (window over the tiny frame)
    val wCum = Window.partitionBy(col("g")).orderBy(col("b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = hist.withColumn("cum_before",
      coalesce(sum(col("c")).over(wCum), lit(0L)))

    // 3b. each quantile's two neighbor global ranks, located in their
    // buckets via a broadcast range-join on the histogram
    val neighbors = stats
      .select(col("g"), col("n"),
        explode(array(qs.map(lit(_)): _*)).as("q"))
      .withColumn("h", col("q") * (col("n") - 1))
      .withColumn("frac", col("h") - floor(col("h")))
      .select(col("g"), col("q"), col("frac"),
        explode(array(
          struct(lit("lo").as("which"),
            (floor(col("h")).cast("long") + 1).as("rank")),
          struct(lit("hi").as("which"),
            least(floor(col("h")).cast("long") + 2, col("n")).as("rank")))).as("nb"))
      .select(col("g"), col("q"), col("frac"), col("nb.which"), col("nb.rank"))
    val located = neighbors.as("nb").join(broadcast(cum.as("cm")),
        col("nb.g") === col("cm.g") &&
          col("nb.rank") > col("cm.cum_before") &&
          col("nb.rank") <= col("cm.cum_before") + col("cm.c"))
      .select(col("nb.g").as("g"), col("nb.q").as("q"), col("nb.frac").as("frac"),
        col("nb.which").as("which"), col("cm.b").as("b"),
        (col("nb.rank") - col("cm.cum_before")).as("ibr"))

    // 4. refine: boundary-bucket rows only; rank inside each bucket and
    // pick the neighbor values
    val wInBucket = Window.partitionBy(col("g"), col("b")).orderBy(col("v"))
    val picked = base.join(broadcast(stats), Seq("g"))
      .withColumn("b", bucket)
      .join(broadcast(located.select(col("g"), col("b")).distinct()),
        Seq("g", "b"), "left_semi")
      .withColumn("ibr", row_number().over(wInBucket).cast("long"))
      .join(broadcast(located), Seq("g", "b", "ibr"))
      .groupBy(col("g"), col("q"), col("frac"))
      .agg(
        max(when(col("which") === "lo", col("v"))).as("vlo"),
        max(when(col("which") === "hi", col("v"))).as("vhi"))
      .withColumn("qv",
        col("vlo") + col("frac") * (col("vhi") - col("vlo")))

    picked.groupBy(col("g").as(groupCol))
      .agg(
        qs.zip(outNames).map { case (q, name) =>
          max(when(col("q") === q, col("qv"))).as(name)
        }.head,
        qs.zip(outNames).map { case (q, name) =>
          max(when(col("q") === q, col("qv"))).as(name)
        }.tail: _*)
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distributed prefix sum — a global running total WITHOUT the
  * single-partition sort that `Window.orderBy(key)` (no partitionBy)
  * plans. That shape (q08 uses it where the oracle demands it) funnels
  * every row through ONE task at 100 TB; this operator is the scale path:
  *
  *   1. DETERMINISTIC range bucketing: a tiny (min, max) aggregate is
  *      broadcast back and each row computes its own bucket id from the
  *      value range. Unlike repartitionByRange, whose sampled boundaries
  *      are an execution-time artifact (two plan branches sample
  *      independently and may disagree), the bucket id is a pure column
  *      function — every consumer derives the identical assignment, so
  *      joining per-bucket offsets back is correct by construction;
  *   2. the wide rows pay exactly ONE exchange (hash on bucket id) and
  *      sort within partitions by (bucket, key); per-bucket totals +
  *      non-null counts shuffle only bucket-count-many partial-agg rows,
  *      prefix-summed on a single tiny task;
  *   3. offsets broadcast-joined back and one sequential accumulator pass
  *      per partition (resetting at bucket boundaries — a partition may
  *      hold several whole buckets) — genuinely per-partition imperative
  *      logic, the mapPartitions case the engine reserves for exactly
  *      this. A window PARTITIONED BY bucket would instead re-shuffle the
  *      full rows a second time.
  *
  * Bucketing is uniform over the key range — the right shape for id- and
  * timestamp-like order keys; pathologically skewed keys would want a
  * sampled-CDF bucket map in step 1 (same plumbing, different bucket fn).
  *
  * Matches `sum(v).over(Window.orderBy(k))` exactly for a UNIQUE order
  * key and an integral value column, INCLUDING null semantics: a row's
  * running value is null only while no non-null value has occurred
  * anywhere before it (nulls are skipped, not zeroed). For fractional
  * values the result differs from the sequential window only by
  * floating-point association (bucket subtotals are added first).
  * Verified by the tq11 oracle and OperatorsSpec.
  */
object PrefixSum {

  /** @param orderCol unique global ordering column (numeric or timestamp)
    * @param valueCol numeric column to accumulate (integral → long
    *                 running total, fractional → double — same result
    *                 type as the built-in window sum)
    * @param out      name of the produced running-total column */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String,
      out: String, numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val nBuckets = parts * 4 // several buckets per partition smooths the hash placement
    val integral = df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case FloatType | DoubleType                        => false
      case t => throw new IllegalArgumentException(
        s"runningSum needs an integral or floating value column, got $t")
    }
    val accType = if (integral) LongType else DoubleType
    val k = col(orderCol).cast("double")
    val mm = df.agg(min(k).as("__mn"), max(k).as("__mx"))
    val bucketed = df
      .withColumn("__v", col(valueCol).cast(accType))
      .crossJoin(broadcast(mm))
      // floor of an affine map is monotone in k, so bucket order == key order
      .withColumn("__bucket",
        when(col("__mx") <= col("__mn"), lit(0)).otherwise(
          least(lit(nBuckets - 1), greatest(lit(0),
            floor((k - col("__mn")) * nBuckets / (col("__mx") - col("__mn") + 1e-9))
              .cast("int")))))
      .drop("__mn", "__mx")
    // bucket-count-many (total, non-null count) rows → exclusive prefix on
    // one tiny task → broadcast back; the partial agg is map-side, so the
    // wide rows do NOT shuffle for this pass
    val w = Window.orderBy(col("__bucket")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bucketed
      .groupBy(col("__bucket"))
      .agg(sum(col("__v")).as("__total"), count(col("__v")).as("__cnt"))
      .select(col("__bucket"),
        coalesce(sum(col("__total")).over(w), lit(0).cast(accType)).as("__offset"),
        coalesce(sum(col("__cnt")).over(w), lit(0)).as("__prior"))
    val ranged = bucketed
      .repartition(parts, col("__bucket"))
      .sortWithinPartitions(col("__bucket"), col(orderCol))
    val joined = ranged.join(broadcast(offsets), "__bucket")
    val outSchema = StructType(joined.schema.fields :+ StructField(out, accType))
    val bIdx = joined.schema.fieldIndex("__bucket")
    val vIdx = joined.schema.fieldIndex("__v")
    val offIdx = joined.schema.fieldIndex("__offset")
    val priorIdx = joined.schema.fieldIndex("__prior")
    implicit val enc = Encoders.row(outSchema)
    val accumulated =
      if (integral)
        joined.mapPartitions { rows =>
          var bucket = Int.MinValue; var acc = 0L; var seen = 0L
          rows.map { r =>
            if (r.getInt(bIdx) != bucket) { bucket = r.getInt(bIdx); acc = 0L; seen = 0L }
            if (!r.isNullAt(vIdx)) { acc += r.getLong(vIdx); seen += 1 }
            val run: Any =
              if (seen + r.getLong(priorIdx) == 0L) null
              else r.getLong(offIdx) + acc
            Row.fromSeq(r.toSeq :+ run)
          }
        }
      else
        joined.mapPartitions { rows =>
          var bucket = Int.MinValue; var acc = 0.0; var seen = 0L
          rows.map { r =>
            if (r.getInt(bIdx) != bucket) { bucket = r.getInt(bIdx); acc = 0.0; seen = 0L }
            if (!r.isNullAt(vIdx)) { acc += r.getDouble(vIdx); seen += 1 }
            val run: Any =
              if (seen + r.getLong(priorIdx) == 0L) null
              else r.getDouble(offIdx) + acc
            Row.fromSeq(r.toSeq :+ run)
          }
        }
    accumulated.drop("__bucket", "__v", "__offset", "__prior")
  }
}

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
  *   1. range-partition by the order key and sort within partitions (the
  *      same sampled range exchange a global sort uses, but rows stay
  *      spread over N partitions). The wide rows pay this exchange ONCE;
  *      the offsets pass below re-shuffles only a column-pruned
  *      (orderCol, value) projection — the same re-scan-narrow trade
  *      ExactPercentile measures as cheaper than caching. A window
  *      PARTITIONED BY partition-id here would instead hash-exchange the
  *      FULL rows a second time, which is why the in-partition
  *      accumulation is a mapPartitions pass, not a window;
  *   2. per-partition totals + non-null counts (map-side partial agg, an
  *      N-row shuffle) prefix-summed on a single tiny task;
  *   3. offsets broadcast-joined back (preserves the stream side's
  *      partitioning and sort order) and one sequential accumulator pass
  *      per partition — genuinely per-partition imperative logic, the
  *      mapPartitions case the engine reserves for exactly this.
  *
  * Matches `sum(v).over(Window.orderBy(k))` exactly for a UNIQUE order
  * key and an integral value column, INCLUDING null semantics: a row's
  * running value is null only while no non-null value has occurred
  * anywhere before it (nulls are skipped, not zeroed). For fractional
  * values the result differs from the sequential window only by
  * floating-point association (partition subtotals are added first).
  * Verified by the tq11 oracle and OperatorsSpec.
  */
object PrefixSum {

  /** @param orderCol unique global ordering column
    * @param valueCol numeric column to accumulate (integral → long
    *                 running total, fractional → double — same result
    *                 type as the built-in window sum)
    * @param out      name of the produced running-total column */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String,
      out: String, numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val integral = df.schema(valueCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType => true
      case FloatType | DoubleType                        => false
      case t => throw new IllegalArgumentException(
        s"runningSum needs an integral or floating value column, got $t")
    }
    val accType = if (integral) LongType else DoubleType
    val ranged = df
      .withColumn("__v", col(valueCol).cast(accType))
      .repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .withColumn("__pid", spark_partition_id())
    // N partition (total, non-null count) rows → exclusive prefix on one
    // tiny task → broadcast back. The big side is referenced twice but
    // ReuseExchange dedupes the range shuffle.
    val w = Window.orderBy(col("__pid")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = ranged
      .groupBy(col("__pid"))
      .agg(sum(col("__v")).as("__total"), count(col("__v")).as("__cnt"))
      .select(col("__pid"),
        coalesce(sum(col("__total")).over(w), lit(0).cast(accType)).as("__offset"),
        coalesce(sum(col("__cnt")).over(w), lit(0)).as("__prior"))
    val joined = ranged.join(broadcast(offsets), "__pid")
    val outSchema = StructType(joined.schema.fields :+ StructField(out, accType))
    val vIdx = joined.schema.fieldIndex("__v")
    val offIdx = joined.schema.fieldIndex("__offset")
    val priorIdx = joined.schema.fieldIndex("__prior")
    implicit val enc = Encoders.row(outSchema)
    val accumulated =
      if (integral)
        joined.mapPartitions { rows =>
          var acc = 0L; var seen = 0L
          rows.map { r =>
            if (!r.isNullAt(vIdx)) { acc += r.getLong(vIdx); seen += 1 }
            val run: Any =
              if (seen + r.getLong(priorIdx) == 0L) null
              else r.getLong(offIdx) + acc
            Row.fromSeq(r.toSeq :+ run)
          }
        }
      else
        joined.mapPartitions { rows =>
          var acc = 0.0; var seen = 0L
          rows.map { r =>
            if (!r.isNullAt(vIdx)) { acc += r.getDouble(vIdx); seen += 1 }
            val run: Any =
              if (seen + r.getLong(priorIdx) == 0L) null
              else r.getDouble(offIdx) + acc
            Row.fromSeq(r.toSeq :+ run)
          }
        }
    accumulated.drop("__pid", "__v", "__offset", "__prior")
  }
}

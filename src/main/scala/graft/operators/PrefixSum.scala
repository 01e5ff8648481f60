package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum — a global running total WITHOUT the
  * single-partition sort that `Window.orderBy(key)` (no partitionBy)
  * plans. That shape (q08 uses it where the oracle demands it) funnels
  * every row through ONE task at 100 TB; this operator is the scale path:
  *
  *   1. range-partition by the order key (sampled range exchange — the
  *      same mechanism a global sort uses, but rows stay spread over N
  *      partitions);
  *   2. per-partition running sum via a window PARTITIONED by partition
  *      id (N parallel in-partition sorts, disk-spillable);
  *   3. per-partition totals (N rows) prefix-summed on a single tiny
  *      task and broadcast back;
  *   4. global running value = in-partition running value + the offset of
  *      all partitions before it.
  *
  * Exact same result as `sum(v).over(Window.orderBy(k))` for a UNIQUE
  * order key (ties within a range partition would make both forms
  * order-dependent), verified by the tq11 oracle and OperatorsSpec.
  */
object PrefixSum {

  /** @param orderCol unique global ordering column
    * @param valueCol numeric column to accumulate
    * @param out      name of the produced running-total column */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String,
      out: String, numPartitions: Int = 0): DataFrame = {
    val parts =
      if (numPartitions > 0) numPartitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df.repartitionByRange(parts, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val inPart = Window.partitionBy(col("__pid")).orderBy(col(orderCol))
    val local = ranged.withColumn("__running", sum(col(valueCol)).over(inPart))
    // N partition totals → exclusive prefix on one tiny task → broadcast
    val offsets = local
      .groupBy(col("__pid"))
      .agg(sum(col(valueCol)).as("__total"))
      .withColumn("__offset",
        coalesce(
          sum(col("__total")).over(
            Window.orderBy(col("__pid"))
              .rowsBetween(Window.unboundedPreceding, -1)),
          lit(0))) // int literal widens to the sum's type (long or double)
      .select(col("__pid"), col("__offset"))
    local
      .join(broadcast(offsets), "__pid")
      .withColumn(out, col("__running") + col("__offset"))
      .drop("__pid", "__running", "__offset")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout for shuffle-free co-located joins.
  *
  * At 100 TB the dominant cost of fact⋈fact joins is the shuffle of both
  * sides. Persisting both tables bucketed (and sorted) by the join key
  * lets Spark plan a SortMergeJoin with NO Exchange on either side — the
  * bucket files are already hash-partitioned identically. This is the
  * engine's co-location primitive; BucketingSpec asserts the
  * exchange-free plan.
  */
object Bucketing {

  /** Persist as a bucketed+sorted managed table (overwrite). */
  def writeBucketed(df: DataFrame, table: String, key: String,
      numBuckets: Int = 8): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — plans without any
    * Exchange when both were written with the same bucket count. */
  def colocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable),
        spark.table(leftTable)(leftKey) === spark.table(rightTable)(rightKey))
}

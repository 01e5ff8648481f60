package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Hive-style partitioned parquet layout — the 100 TB table organization.
  *
  * Writing fact tables partitioned by a low-cardinality filter column
  * (date, lang, event_type) turns predicates on that column into
  * PARTITION PRUNING: the scan never opens non-matching directories, so a
  * one-partition query reads 1/N of the data before any row-level filter
  * runs. LayoutSpec asserts the pruned plan (PartitionFilters + partition
  * count).
  */
object PartitionedLayout {

  def write(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCol)
      .parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}

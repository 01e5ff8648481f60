package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

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

  /** Key-level upsert into a partitioned parquet table — the corpus
    * maintenance primitive (refreshed documents, relabeled rows, daily
    * incremental ingests land as updates, not full rewrites).
    *
    * Plain parquet has no row-level MERGE, so the unit of rewrite is the
    * PARTITION, and the whole game is touching only the partitions that
    * contain updated keys:
    *   1. the updates' distinct partition values (a tiny frame) broadcast
    *      into a left-semi join that restricts the current table to
    *      affected partitions — everything else is partition-pruned at
    *      the scan;
    *   2. affected current rows lose superseded keys (left-anti on key,
    *      again against the bounded update set) and union the updates;
    *   3. `partitionOverwriteMode=dynamic` rewrites ONLY the partitions
    *      present in the merged frame — untouched partition directories
    *      keep their exact files (UpsertSpec asserts file identity).
    *
    * The merged frame is localCheckpoint()ed first: Spark (correctly)
    * refuses to overwrite a path its plan still reads, and the eager
    * checkpoint both severs that lineage and guards against a task retry
    * re-reading half-deleted input. What materializes is only the
    * affected-partitions slice — bounded by update locality, the same
    * bound dynamic overwrite itself relies on. (On a deployment with an
    * ACID table format, that format's MERGE subsumes this; this is the
    * parquet-native equivalent.)
    *
    * `updates` must carry the full table schema, `keyCol` unique per row.
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      keyCol: String, partitionCol: String): Unit = {
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(modeKey)
    spark.conf.set(modeKey, "dynamic")
    try {
      val affected = updates.select(partitionCol).distinct()
      val current = spark.read.parquet(path)
        .join(broadcast(affected), Seq(partitionCol), "left_semi")
      val merged = current
        .join(broadcast(updates.select(keyCol)), Seq(keyCol), "left_anti")
        .unionByName(updates)
        .localCheckpoint()
      merged.write
        .mode("overwrite")
        .partitionBy(partitionCol)
        .parquet(path)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(modeKey, v)
        case None    => spark.conf.unset(modeKey)
      }
    }
  }
}

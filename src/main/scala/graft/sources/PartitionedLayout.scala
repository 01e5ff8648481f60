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

  /** Small-file compaction — the other half of table maintenance. Years
    * of incremental ingests/upserts leave partitions with hundreds of
    * KB-scale files; every query then pays a task (and an open/footer
    * read) per fragment. Compaction rewrites a partition's rows into
    * ~`targetBytes` files.
    *
    * Only partitions WORTH compacting are rewritten: a partition is
    * selected when its file count exceeds what its byte size justifies
    * (> ceil(bytes/target) + slack). Selection walks the directory
    * listing (driver-side metadata, the same listing any scan performs);
    * rewriting reads just the selected partitions via partition-pruned
    * scans and overwrites them with `partitionOverwriteMode=dynamic`, so
    * healthy partitions keep their files byte-identical — same bound as
    * `upsert`. Row contents are preserved exactly; only layout changes.
    *
    * @return the partition directory names that were rewritten */
  def compact(spark: SparkSession, path: String, partitionCol: String,
      targetBytes: Long = 128L * 1024 * 1024, slackFiles: Int = 1): Seq[String] = {
    val root = new java.io.File(path)
    val partDirs = Option(root.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith(s"$partitionCol="))
    val fragmented = partDirs.filter { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".parquet"))
      val bytes = files.map(_.length()).sum
      val justified = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
      files.length > justified + slackFiles
    }
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(modeKey)
    spark.conf.set(modeKey, "dynamic")
    try {
      fragmented.toSeq.map { d =>
        val value = d.getName.stripPrefix(s"$partitionCol=")
        val bytes = d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(_.length()).sum
        val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt
        // partition-pruned read of just this partition; repartition to the
        // justified file count and rewrite only this directory
        spark.read.parquet(path)
          .filter(org.apache.spark.sql.functions.col(partitionCol) === value)
          .repartition(nFiles)
          .localCheckpoint()
          .write.mode("overwrite").partitionBy(partitionCol).parquet(path)
        d.getName
      }
    } finally {
      prev match {
        case Some(v) => spark.conf.set(modeKey, v)
        case None    => spark.conf.unset(modeKey)
      }
    }
  }
}

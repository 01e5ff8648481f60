package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col}

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

  /** Durable staging for in-place rewrites: materialize `df` to a sibling
    * staging directory, hand the re-read back to `write`, then clean up.
    * Spark (correctly) refuses to overwrite a path its plan still reads;
    * the staging copy severs that lineage DURABLY — unlike a
    * localCheckpoint, whose unreplicated executor-local blocks would be
    * unrecoverable if an executor died after the overwrite started
    * deleting target directories. What stages is only the affected-
    * partitions slice, bounded by update locality. (An ACID table format
    * subsumes all of this; this is the parquet-native equivalent.) */
  private[graft] def withStaging(spark: SparkSession, path: String, df: DataFrame)(
      write: DataFrame => Unit): Unit = {
    val staging = path.stripSuffix("/") + "__staging"
    df.write.mode("overwrite").parquet(staging)
    try write(spark.read.parquet(staging))
    finally {
      val p = new org.apache.hadoop.fs.Path(staging)
      p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    }
  }

  private[graft] def withDynamicOverwrite(spark: SparkSession)(body: => Unit): Unit = {
    val modeKey = "spark.sql.sources.partitionOverwriteMode"
    val prev = spark.conf.getOption(modeKey)
    spark.conf.set(modeKey, "dynamic")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(modeKey, v)
      case None    => spark.conf.unset(modeKey)
    }
  }

  /** Key-level upsert into a partitioned parquet table — the corpus
    * maintenance primitive (refreshed documents, relabeled rows, daily
    * incremental ingests land as updates, not full rewrites).
    *
    * Plain parquet has no row-level MERGE, so the unit of rewrite is the
    * PARTITION, and the whole game is touching only the partitions that
    * contain updated keys:
    *   1. affected partitions = the updates' partition values UNION the
    *      partitions currently holding any updated key. The second set
    *      matters when an update CHANGES a row's partition value (a doc
    *      relabeled en→fr): without it the old row's partition is never
    *      rewritten and the stale row survives as a duplicate. Finding it
    *      costs one column-pruned (key, partition) scan against the
    *      broadcast update keys — metadata-sized I/O, not a data read;
    *   2. the current table, partition-pruned to the affected set, loses
    *      superseded keys (left-anti on the broadcast keys) and unions
    *      the updates;
    *   3. the merged slice is durably staged (see [[withStaging]]) and
    *      written with `partitionOverwriteMode=dynamic`, which rewrites
    *      ONLY the partitions present in it — untouched partition
    *      directories keep their exact files (UpsertSpec asserts file
    *      identity). Dynamic overwrite has a blind spot the merge must
    *      cover: a partition whose EVERY row was superseded (its sole
    *      keys relabeled elsewhere) contributes zero rows to the merged
    *      slice, so the overwrite never touches its directory and the
    *      stale rows would survive as duplicates. Affected-but-absent
    *      partitions are therefore deleted explicitly after the write
    *      (directory names via Hive escaping, never by parsing).
    *
    * All key/partition comparisons are null-safe (`<=>`): rows in the
    * null partition (`__HIVE_DEFAULT_PARTITION__`) and updates carrying a
    * null partition value prune, relocate, and supersede like any other.
    *
    * `updates` must carry the full table schema, `keyCol` unique per row.
    */
  def upsert(spark: SparkSession, path: String, updates: DataFrame,
      keyCol: String, partitionCol: String): Unit = withDynamicOverwrite(spark) {
    val updKeys = broadcast(updates.select(col(keyCol).as("__upd_key")).distinct())
    val table = spark.read.parquet(path)
    val oldPartitions = table
      .join(updKeys, table(keyCol) <=> updKeys("__upd_key"), "left_semi")
      .select(col(partitionCol))
    val affected = updates.select(col(partitionCol)).union(oldPartitions).distinct()
    // tiny by construction (it is broadcast below); collected for the
    // drained-partition diff after the write
    val affectedVals = affected.collect().map(_.get(0))
    val affectedKeyed = broadcast(affected.withColumnRenamed(partitionCol, "__aff_p"))
    val current = table
      .join(affectedKeyed, table(partitionCol) <=> affectedKeyed("__aff_p"), "left_semi")
    val merged = current
      .join(updKeys, current(keyCol) <=> updKeys("__upd_key"), "left_anti")
      .unionByName(updates)
    withStaging(spark, path, merged) { staged =>
      staged.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
      val present = staged.select(col(partitionCol)).distinct()
        .collect().map(_.get(0)).toSet
      val drained = affectedVals.filterNot(present)
      if (drained.nonEmpty) {
        val root = new org.apache.hadoop.fs.Path(path)
        val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
        drained.foreach { v =>
          val dirName = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            .getPartitionPathString(partitionCol, if (v == null) null else v.toString)
          fs.delete(new org.apache.hadoop.fs.Path(root, dirName), true)
        }
      }
    }
  }

  /** Key-level targeted DELETE — the right-to-be-forgotten primitive
    * (GDPR/CCPA erasure requests arrive as key lists; at 100 TB the only
    * acceptable cost is rewriting the partitions that CONTAIN those
    * keys, never the table). [[upsert]]'s machinery minus the union:
    * one column-pruned (key, partition) semi-join finds the affected
    * partitions, the pruned slice drops deleted keys via a broadcast
    * anti-join, dynamic overwrite rewrites only those directories
    * (untouched partitions keep byte-identical files — DeleteSpec
    * asserts it), and a partition whose every row is erased is removed
    * explicitly (dynamic overwrite's drained-partition blind spot, same
    * as upsert's). Null-safe comparisons throughout.
    *
    * Scope: this erases the CURRENT state of a plain partitioned table.
    * A snapshot-versioned table additionally keeps pre-erasure versions
    * readable (time travel) — [[Snapshots.erase]] is the companion that
    * rewrites retained history so no version can serve the key. */
  def delete(spark: SparkSession, path: String, keys: DataFrame,
      keyCol: String, partitionCol: String): Unit = withDynamicOverwrite(spark) {
    val delKeys = broadcast(keys.select(col(keyCol).as("__del_key")).distinct())
    val table = spark.read.parquet(path)
    val affected = table
      .join(delKeys, table(keyCol) <=> delKeys("__del_key"), "left_semi")
      .select(col(partitionCol)).distinct()
    val affectedVals = affected.collect().map(_.get(0))
    if (affectedVals.nonEmpty) {
      val affectedKeyed = broadcast(affected.withColumnRenamed(partitionCol, "__aff_p"))
      val pruned = table
        .join(affectedKeyed, table(partitionCol) <=> affectedKeyed("__aff_p"), "left_semi")
      val remaining = pruned
        .join(delKeys, pruned(keyCol) <=> delKeys("__del_key"), "left_anti")
      withStaging(spark, path, remaining) { staged =>
        staged.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
        val present = staged.select(col(partitionCol)).distinct()
          .collect().map(_.get(0)).toSet
        val drained = affectedVals.filterNot(present)
        if (drained.nonEmpty) {
          val root = new org.apache.hadoop.fs.Path(path)
          val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
          drained.foreach { v =>
            val dirName = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .getPartitionPathString(partitionCol, if (v == null) null else v.toString)
            fs.delete(new org.apache.hadoop.fs.Path(root, dirName), true)
          }
        }
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
    * listing (driver-side metadata, the same listing any scan performs).
    * The fragmented partitions are then read BY DIRECTORY PATH (with
    * `basePath` preserving the partition column) — never by parsing the
    * Hive-escaped directory name back into a value, which would silently
    * miss partitions whose values need escaping (`en%3AUS`) and the null
    * partition (`__HIVE_DEFAULT_PARTITION__`). One job reads them all,
    * one shuffle lands each partition's rows on one task, and
    * `maxRecordsPerFile` (target bytes scaled by the slice's measured
    * rows/byte) splits oversized partitions into multiple files. The
    * staged result overwrites dynamically, so healthy partitions keep
    * their files byte-identical — same bound as `upsert`. Rows are
    * preserved exactly; only layout changes.
    *
    * @return the partition directory names that were rewritten */
  def compact(spark: SparkSession, path: String, partitionCol: String,
      targetBytes: Long = 128L * 1024 * 1024, slackFiles: Int = 1): Seq[String] = {
    // Hadoop FileSystem, not java.io.File: the 100 TB deployment target is
    // HDFS/S3, where a local-File walk would silently list nothing and
    // turn compaction into a no-op
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    val partDirs = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$partitionCol="))
    val withFiles = partDirs.map { d =>
      d -> fs.listStatus(d.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    }
    val fragmented = withFiles.filter { case (_, files) =>
      val bytes = files.map(_.getLen).sum
      val justified = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
      files.length > justified + slackFiles
    }
    if (fragmented.isEmpty) return Nil
    val totalBytes = fragmented.map(_._2.map(_.getLen).sum).sum
    withDynamicOverwrite(spark) {
      val frag = spark.read
        .option("basePath", path)
        .parquet(fragmented.map(_._1.getPath.toString).toIndexedSeq: _*)
      // footer-stats count — no data pages are read for a bare count
      val totalRows = frag.count()
      val rowsPerFile = math.max(1L,
        if (totalBytes == 0) Long.MaxValue
        else targetBytes * totalRows / math.max(1L, totalBytes))
      withStaging(spark, path, frag) { staged =>
        staged
          .repartition(col(partitionCol)) // one task per partition value
          .write
          .mode("overwrite")
          .option("maxRecordsPerFile", rowsPerFile)
          .partitionBy(partitionCol)
          .parquet(path)
      }
    }
    fragmented.toIndexedSeq.map(_._1.getPath.getName)
  }

  /** Crash-debris cleanup — the third leg of table maintenance next to
    * [[upsert]] and [[compact]]. A job that dies between materializing
    * its staging copy and finishing the overwrite leaves a
    * `<table>__staging` sibling directory behind; Spark task retries can
    * additionally strand `_temporary` attempt directories inside the
    * table. Both are invisible to correct readers (staging is a sibling,
    * `_temporary`/`_`-prefixed files are filtered by FileIndex) but cost
    * real storage at 100 TB and can confuse naive directory walkers.
    * vacuum deletes both kinds; data files and partition directories are
    * never touched.
    *
    * @return the paths that were deleted */
  def vacuum(spark: SparkSession, path: String): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val staging = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__staging")
    val stray = (if (fs.exists(staging)) Seq(staging) else Nil) ++
      (if (fs.exists(root))
        fs.listStatus(root).map(_.getPath)
          .filter(p => p.getName == "_temporary").toSeq
      else Nil)
    stray.foreach(p => fs.delete(p, true))
    stray.map(_.toUri.getPath)
  }
}

package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema evolution for batch-partitioned parquet tables: old ingest
  * batches lack columns newer batches carry. Spark reads the union via
  * `mergeSchema` (missing columns surface as nulls), and
  * [[addColumnBackfill]] performs the MIGRATION: rewrite ONLY the batch
  * directories missing the column, filling the default — so the
  * migration cost is proportional to legacy bytes, not table bytes
  * (at 100 TB you never rewrite the 99 batches that already have the
  * column). The swap is write-new → rename-old-away → rename-new-in;
  * on an object store this becomes the manifest-commit pattern
  * (sources/Snapshots' CAS) — same read path, different commit.
  */
object SchemaEvolution {

  /** Batch subdirectories (`batch=N`) under the table root. */
  private def batchDirs(root: String): Seq[java.io.File] = {
    val f = new java.io.File(root)
    Option(f.listFiles()).getOrElse(Array.empty)
      .filter(d => d.isDirectory && d.getName.startsWith("batch="))
      .sortBy(_.getName).toSeq
  }

  /** Read the whole table, merging schemas across batches; columns a
    * batch lacks come back null for its rows. */
  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .option("basePath", root).parquet(batchDirs(root).map(_.getPath): _*)

  /** Rewrite every batch directory that LACKS `colName`, adding it with
    * `default`; batches already carrying the column are untouched.
    * Returns the names of the rewritten batch dirs (the audit trail a
    * migration job logs). */
  def addColumnBackfill(spark: SparkSession, root: String, colName: String,
      default: Column): Seq[String] = {
    batchDirs(root).flatMap { d =>
      val df = spark.read.parquet(d.getPath)
      if (df.columns.contains(colName)) None
      else {
        val tmp = new java.io.File(d.getParentFile, d.getName + ".bf")
        df.withColumn(colName, default)
          .write.mode("overwrite").parquet(tmp.getPath)
        val old = new java.io.File(d.getParentFile, d.getName + ".old")
        require(d.renameTo(old), s"rename away failed: $d")
        require(tmp.renameTo(d), s"rename in failed: $tmp")
        delete(old)
        Some(d.getName)
      }
    }
  }

  private def delete(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(delete)
    f.delete(): Unit
  }
}

package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned table with time travel — the read-side half of the
  * lakehouse contract (the write-side staging/upsert/compaction machinery
  * lives in [[PartitionedLayout]]). Layout:
  *
  *   <table>/data/<uuid>/part-*.parquet   append-only data files
  *   <table>/_manifests/v<NNNNN>.txt      one relative path per line
  *
  * A commit writes NEW data files first (never touching existing ones),
  * then publishes a manifest via write-temp + atomic rename — readers
  * either see the old complete version or the new complete version,
  * never a half-written file list. Because data files are append-only
  * and manifests are tiny, this gives:
  *
  *   - atomic overwrite (the classic non-atomic window of
  *     mode("overwrite") — delete-then-write — disappears);
  *   - time travel: `read(path, version)` serves any retained snapshot;
  *   - concurrent readers of v(N) are unaffected by a v(N+1) commit
  *     (their files are immutable and still referenced);
  *   - cheap rollback: re-publish an old manifest as the new head.
  *
  * `vacuum` deletes data files unreferenced by the retained manifests —
  * the storage-reclamation step, separated from commits exactly so
  * that readers never race deletion. Single-writer by design (commit
  * versions are not CAS'd); a production deployment would take a
  * coordination lock around `commit`, which is orthogonal to the layout.
  */
object Snapshots {

  private def fs(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sessionState.newHadoopConf())

  private def manifestDir(path: String) = new Path(path, "_manifests")

  private def manifestName(v: Long): String = f"v$v%05d.txt"

  private def versionOf(p: Path): Long =
    p.getName.stripPrefix("v").stripSuffix(".txt").toLong

  /** Versions currently retained, ascending (empty for a fresh path). */
  def versions(spark: SparkSession, path: String): Seq[Long] = {
    val dir = manifestDir(path)
    val f = fs(spark, dir)
    if (!f.exists(dir)) Seq.empty
    else f.listStatus(dir).map(_.getPath).filter(_.getName.matches("v\\d+\\.txt"))
      .map(versionOf).sorted.toSeq
  }

  /** Publish `df` as the next snapshot; returns the new version. */
  def commit(spark: SparkSession, path: String, df: DataFrame): Long = {
    val root = new Path(path)
    val f = fs(spark, root)
    val next = versions(spark, path).lastOption.getOrElse(0L) + 1
    // 1. new data files under a fresh uuid dir — existing files untouched
    val uuid = java.util.UUID.randomUUID().toString
    val dataDir = new Path(root, s"data/$uuid")
    df.write.parquet(dataDir.toString)
    val files = f.listStatus(dataDir).map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .map(p => s"data/$uuid/${p.getName}")
      .sorted
    // 2. manifest published via temp + atomic rename
    val mDir = manifestDir(path)
    f.mkdirs(mDir)
    val tmp = new Path(mDir, s".v$next.txt.tmp")
    val out = f.create(tmp, false)
    try out.write(files.mkString("\n").getBytes("UTF-8")) finally out.close()
    val target = new Path(mDir, manifestName(next))
    if (!f.rename(tmp, target))
      throw new IllegalStateException(s"manifest publish failed for v$next")
    next
  }

  /** Read a specific snapshot (default: latest). */
  def read(spark: SparkSession, path: String, version: Long = -1L): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no snapshots at $path")
    val v = if (version < 0) vs.last
      else { require(vs.contains(version), s"version $version not in $vs"); version }
    val root = new Path(path)
    val f = fs(spark, root)
    val mf = new Path(manifestDir(path), manifestName(v))
    val in = f.open(mf)
    val files = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    spark.read.parquet(files.map(rel => new Path(root, rel).toString): _*)
  }

  /** Drop all but the newest `keep` versions and delete data files no
    * retained manifest references. Returns deleted data-file paths. */
  def vacuum(spark: SparkSession, path: String, keep: Int): Seq[String] = {
    require(keep >= 1, "must retain at least one snapshot")
    val root = new Path(path)
    val f = fs(spark, root)
    val vs = versions(spark, path)
    val (drop, retain) = vs.splitAt(math.max(0, vs.size - keep))
    def filesOf(v: Long): Set[String] = {
      val mf = new Path(manifestDir(path), manifestName(v))
      val in = f.open(mf)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toSet
        finally in.close()
    }
    val live = retain.flatMap(filesOf).toSet
    val dead = drop.flatMap(filesOf).toSet -- live
    dead.foreach(rel => f.delete(new Path(root, rel), false))
    drop.foreach(v =>
      f.delete(new Path(manifestDir(path), manifestName(v)), false))
    dead.toSeq.sorted
  }
}

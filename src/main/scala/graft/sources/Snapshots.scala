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
  * that readers never race deletion.
  *
  * Commits are multi-writer safe: the manifest publish is a
  * compare-and-swap on the version number. Data files are written first
  * (under a writer-private uuid dir, conflict-free by construction);
  * the manifest is then published fail-if-exists — on the local FS via
  * a hard link (POSIX link(2) is atomic EEXIST), on HDFS-like stores
  * via no-overwrite rename (atomic at the namenode). A loser re-reads
  * the head, bumps the version, and retries the (tiny) manifest publish
  * only — its data files need no rewrite. Two racing committers thus
  * always produce two distinct consecutive versions; no manifest is
  * ever silently replaced. Object stores without atomic no-clobber
  * (raw S3) need a coordination layer, as every table format documents.
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

  /** Atomically publish `tmp` as `target` iff `target` does not exist.
    * local FS: hard link — link(2) fails EEXIST atomically (Hadoop's
    * local rename is POSIX rename(2), which silently REPLACES the target,
    * so rename alone is not a CAS there). Other schemes: no-overwrite
    * rename (atomic at the HDFS namenode; returns false if target
    * appeared). Returns false iff a racing committer won this version. */
  private def publishNoClobber(
      f: org.apache.hadoop.fs.FileSystem, tmp: Path, target: Path): Boolean = {
    val scheme = Option(f.getUri.getScheme).getOrElse("file")
    if (scheme == "file") {
      try {
        java.nio.file.Files.createLink(
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.Paths.get(tmp.toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      // FileContext.rename(…, Rename.NONE) enforces no-overwrite AT THE
      // FILESYSTEM LAYER (FileAlreadyExistsException) — on HDFS the
      // check+rename is one atomic namenode op. A bare exists-then-
      // rename would be a client-side TOCTOU on any store whose rename
      // replaces (two racers both pass the exists check and one
      // silently wins); stores with no FileContext binding fall back to
      // that weaker path with the caveat documented above (raw S3-like
      // stores need a coordination layer regardless).
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(f.getUri, f.getConf)
        fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.NONE)
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case _: java.nio.file.FileAlreadyExistsException => false
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          if (f.exists(target)) false else f.rename(tmp, target)
      }
    }
  }

  /** Stage + CAS-publish a manifest listing `files` as the next version;
    * returns it. Retries the (tiny) publish on version races. */
  private def publish(spark: SparkSession, f: org.apache.hadoop.fs.FileSystem,
      path: String, files: Seq[String], beforePublish: Long => Unit): Long = {
    val mDir = manifestDir(path)
    f.mkdirs(mDir)
    val tmp = new Path(mDir, s".${java.util.UUID.randomUUID()}.txt.tmp")
    val out = f.create(tmp, false)
    try out.write(files.mkString("\n").getBytes("UTF-8")) finally out.close()
    try {
      val maxAttempts = 20
      var attempt = 0
      while (attempt < maxAttempts) {
        val next = versions(spark, path).lastOption.getOrElse(0L) + 1
        beforePublish(next)
        if (publishNoClobber(f, tmp, new Path(mDir, manifestName(next))))
          return next
        attempt += 1
      }
      throw new java.util.ConcurrentModificationException(
        s"snapshot commit at $path lost the version race $maxAttempts times")
    } finally f.delete(tmp, false): Unit
  }

  /** Publish `df` as the next snapshot; returns the committed version.
    *
    * `beforePublish` is a deterministic race-injection seam (tests commit
    * a competing version inside it); production callers leave the default.
    */
  def commit(
      spark: SparkSession,
      path: String,
      df: DataFrame,
      beforePublish: Long => Unit = _ => ()): Long = {
    val root = new Path(path)
    val f = fs(spark, root)
    // 1. new data files under a writer-private uuid dir — existing files
    //    untouched, racing writers conflict-free by construction
    val uuid = java.util.UUID.randomUUID().toString
    val dataDir = new Path(root, s"data/$uuid")
    // any failure between here and a successful publish must remove the
    // uuid dir: no manifest references it and vacuum only reclaims files
    // listed in DROPPED manifests, so a leaked dir is permanent
    val files =
      try {
        df.write.parquet(dataDir.toString)
        f.listStatus(dataDir).map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
          .map(p => s"data/$uuid/${p.getName}")
          .sorted
      } catch {
        case scala.util.control.NonFatal(e) =>
          f.delete(dataDir, true)
          throw e
      }
    // 2. manifest body staged under a writer-private temp name, then
    //    CAS-published onto the versioned name; losers retry with a
    //    bumped version — only this tiny publish step repeats
    var published = false
    try {
      val v = publish(spark, f, path, files.toSeq, beforePublish)
      published = true
      v
    } finally {
      // an aborted commit's data files are referenced by no manifest and
      // vacuum only reclaims files listed in DROPPED manifests — delete
      // them here or they leak forever
      if (!published) f.delete(dataDir, true): Unit
    }
  }

  /** Metadata-only commit: publish a manifest over data files some
    * external writer already staged under `path` (paths relative to the
    * table root). This is the rollback / REPLACE-maintenance / external-
    * ingest shape — and the path the 10k-file manifest scale spec
    * measures: no data moves, only the manifest CAS runs. The caller
    * owns the claim that the listed files exist and are complete. */
  def commitStaged(spark: SparkSession, path: String, relFiles: Seq[String],
      beforePublish: Long => Unit = _ => ()): Long = {
    val root = new Path(path)
    publish(spark, fs(spark, root), path, relFiles, beforePublish)
  }

  /** The file list of a snapshot (relative paths, manifest order). */
  def manifest(spark: SparkSession, path: String, version: Long): Seq[String] = {
    val root = new Path(path)
    val f = fs(spark, root)
    val mf = new Path(manifestDir(path), manifestName(version))
    val in = f.open(mf)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
  }

  /** Read a specific snapshot (default: latest). */
  def read(spark: SparkSession, path: String, version: Long = -1L): DataFrame = {
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no snapshots at $path")
    val v = if (version < 0) vs.last
      else { require(vs.contains(version), s"version $version not in $vs"); version }
    val files = manifest(spark, path, v)
    val root = new Path(path)
    spark.read.parquet(files.map(rel => new Path(root, rel).toString): _*)
  }

  /** What [[erase]] did: which data files were rewritten (old → purged
    * replacements, empty when the purge drained the file), which old
    * files were physically deleted, and which versions' manifests were
    * republished. */
  final case class EraseReport(
      rewritten: Map[String, Seq[String]],
      deletedFiles: Seq[String],
      versionsTouched: Seq[Long])

  /** Erase rows matching `predicate` from EVERY retained snapshot — the
    * history half of the GDPR erasure primitive. Time travel keeps old
    * versions readable by design, so a key deleted from the HEAD
    * (PartitionedLayout.delete / a new purged commit) remains servable
    * from any pre-erasure version until the bytes themselves go; this
    * rewrites history in place:
    *
    *   1. one scan over the union of all retained manifests' files finds
    *      the CONTAMINATED files (`input_file_name`-grouped — cost is one
    *      pushed-filter pass, and only file identities come back);
    *   2. each contaminated file is rewritten without the victim rows to
    *      a fresh `data/<uuid>` dir — clean files are never touched, so
    *      the write cost is proportional to contaminated bytes, not
    *      table bytes (the same bound PartitionedLayout.delete gives the
    *      partitioned layout);
    *   3. every retained manifest is republished with old→new file
    *      substitutions (atomic replace per manifest: tmp + rename — a
    *      deliberate history REWRITE, so version numbers are preserved,
    *      unlike commits which only ever CAS new versions); readers keep
    *      seeing complete manifests throughout;
    *   4. only after all manifests flipped are the contaminated bytes
    *      deleted from disk.
    *
    * Like [[vacuum]] this is a single-maintenance-writer operation: it
    * may race readers (safely) but not another erase/vacuum of the same
    * table. After it returns, no retained version can serve a victim
    * row and no victim byte remains under the table root. */
  def erase(spark: SparkSession, path: String,
      predicate: org.apache.spark.sql.Column): EraseReport = {
    val root = new Path(path)
    val f = fs(spark, root)
    val vs = versions(spark, path)
    require(vs.nonEmpty, s"no snapshots at $path")
    val byVersion = vs.map(v => v -> manifest(spark, path, v)).toMap
    val allRel = byVersion.values.flatten.toSeq.distinct
    def abs(rel: String) = new Path(root, rel).toString
    // 1. contaminated file identities — one pushed-filter scan
    import org.apache.spark.sql.functions.input_file_name
    val contaminatedUris = spark.read.parquet(allRel.map(abs): _*)
      .filter(predicate).select(input_file_name()).distinct()
      .collect().map(_.getString(0)).toSet
    // path-separator boundary: "/a/bc.parquet" must not match rel
    // "c.parquet" — compare on a "/"-anchored suffix
    val contaminated = allRel.filter(rel =>
      contaminatedUris.exists(u => u == rel || u.endsWith("/" + rel)))
    if (contaminated.isEmpty)
      return EraseReport(Map.empty, Seq.empty, Seq.empty)
    // 2. rewrite each contaminated file minus the victims (per-file jobs
    //    — bounded by contaminated-file count, the erasure working set)
    val uuid = java.util.UUID.randomUUID().toString
    val rewritten: Map[String, Seq[String]] = contaminated.zipWithIndex.map {
      case (rel, i) =>
        val dst = new Path(root, s"data/$uuid/f$i")
        // three-valued logic: keep rows where the predicate is NULL as
        // well as FALSE — `!predicate` alone would silently erase rows
        // with null predicate columns, moving non-victim history
        spark.read.parquet(abs(rel))
          .filter(!org.apache.spark.sql.functions.coalesce(
            predicate, org.apache.spark.sql.functions.lit(false)))
          .write.parquet(dst.toString)
        val parts = f.listStatus(dst).map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
          .map(p => s"data/$uuid/f$i/${p.getName}").sorted.toSeq
        rel -> parts
    }.toMap
    // 3. republish every manifest that references a contaminated file
    val touched = vs.filter(v => byVersion(v).exists(rewritten.contains))
    touched.foreach { v =>
      val newFiles = byVersion(v).flatMap(rel =>
        rewritten.getOrElse(rel, Seq(rel)))
      val mDir = manifestDir(path)
      val tmp = new Path(mDir, s".${java.util.UUID.randomUUID()}.txt.tmp")
      val out = f.create(tmp, false)
      try out.write(newFiles.mkString("\n").getBytes("UTF-8")) finally out.close()
      val target = new Path(mDir, manifestName(v))
      // atomic REPLACE: POSIX rename on the local FS; FileContext
      // Rename.OVERWRITE (atomic at the namenode) elsewhere
      val scheme = Option(f.getUri.getScheme).getOrElse("file")
      if (scheme == "file") {
        java.nio.file.Files.move(
          java.nio.file.Paths.get(tmp.toUri.getPath),
          java.nio.file.Paths.get(target.toUri.getPath),
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
      } else {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(f.getUri, f.getConf)
        fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      }
    }
    // 4. the victim bytes go last — every manifest already points away
    contaminated.foreach(rel => f.delete(new Path(root, rel), false))
    EraseReport(rewritten, contaminated, touched)
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

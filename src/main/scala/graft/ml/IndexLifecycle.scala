package graft.ml

import org.apache.spark.sql.SparkSession

/** Index-artifact lifecycle over [[ModelRegistry]] — the same
  * promote/pin/rollback control plane the ML models use, applied to the
  * stored search indexes (the IVF-PQ codes table sq14 serves from, the
  * BM25 postings sq18 serves from): every REBUILD lands in its own
  * versioned directory and registers as an append-only entry; serving
  * resolves the PINNED version's path, so a fresh build is invisible to
  * traffic until someone promotes it — and a bad promote is one rollback
  * from restored.
  *
  * Why paths-per-version rather than snapshot manifests here: a stored
  * index's whole value is its PARTITIONED layout (list_id / bkt
  * directories → PartitionFilters pruning); a manifest-file read would
  * flatten that away. The version directory IS the snapshot, the
  * registry's pointer log is the atomic commit (Snapshots'
  * publish-no-clobber move, one level up).
  *
  * 100 TB: the registry is KBs of control-plane metadata; serving adds
  * one registry lookup to resolve the pinned root, then scans exactly as
  * before (pruned). Old versions stay queryable until vacuumed. */
object IndexLifecycle {

  /** Register build `version` of index `name` living at `buildPath`.
    * Returns the registry id (deterministic: name-v<version>). */
  def register(spark: SparkSession, registryPath: String, name: String,
      indexType: String, buildPath: String, version: Int): String = {
    val id = s"$name-v$version"
    ModelRegistry.append(spark, registryPath, ModelRegistry.Entry(
      model_id = id,
      model_name = name,
      model_type = indexType,
      training_date = new java.sql.Timestamp(version.toLong),
      rmse = None, r2 = None,
      feature_columns = Seq.empty,
      model_path = buildPath,
      version = version))
    id
  }

  /** Point serving at a registered build. */
  def promote(spark: SparkSession, registryPath: String, name: String,
      version: Int): Unit =
    ModelRegistry.promote(spark, registryPath, name, s"$name-v$version")

  /** One step back in the pointer log; returns the restored build id. */
  def rollback(spark: SparkSession, registryPath: String,
      name: String): Option[String] =
    ModelRegistry.rollback(spark, registryPath, name)

  /** The path serving must read — the PINNED build's directory. Never
    * falls back to "latest": an unpromoted build must stay invisible. */
  def pinnedPath(spark: SparkSession, registryPath: String,
      name: String): Option[String] =
    ModelRegistry.pinned(spark, registryPath, name).map(_.model_path)

  // ------------------------------------------------------ retention/GC

  /** RETENTION POLICY (r16 verdict #6): copy-on-write maintenance
    * hard-links unchanged partitions across versions, so repeated
    * cycles accumulate version DAGs with shared inodes — disk grows
    * with the number of RETAINED versions' unique bytes, and somebody
    * must decide which dirs may go. A version of `name` is REAPABLE
    * iff it is none of:
    *   (a) the PINNED version — what serving reads;
    *   (b) the ROLLBACK TARGET — the pointer-log entry one step back,
    *       exactly what [[rollback]] would restore (a reap must never
    *       turn the bad-promote escape hatch into a dangling path);
    *   (c) the NEWEST registered version — an unpromoted fresh build
    *       awaiting its promote, or the parent an in-flight
    *       incremental publish is still hard-linking from.
    * Already-reaped versions (the sibling `.reaped` log) are excluded.
    * Deleting a reapable dir is safe at the FILE level by the
    * hard-link property: every file a surviving version links stays
    * alive under that version's own directory entry — the inode dies
    * only when its LAST version goes (StoreGcSpec proves a pinned
    * version serves identically after its link-parent is reaped). */
  def reapable(spark: SparkSession, registryPath: String,
      name: String): Seq[ModelRegistry.Entry] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val entries = ModelRegistry.all(spark, registryPath)
      .filter(col("model_name") === name)
      .as[ModelRegistry.Entry].collect().toSeq
    if (entries.isEmpty) return Seq.empty
    val history = ModelRegistry.pinHistory(spark, registryPath, name)
    val keepIds = Set.newBuilder[String]
    history.lastOption.foreach(keepIds += _)
    if (history.length >= 2) keepIds += history(history.length - 2)
    keepIds += entries.maxBy(_.version).model_id
    val keep = keepIds.result()
    val reaped = reapedIds(spark, registryPath)
    entries.filterNot(e => keep(e.model_id) || reaped(e.model_id))
      .sortBy(_.version)
  }

  /** Reap every [[reapable]] version of `name`: delete its directory,
    * record it in the `.reaped` log (append-only, like everything
    * else), return the reclaimed paths. Idempotent — a re-run reaps
    * nothing new. */
  def reap(spark: SparkSession, registryPath: String,
      name: String): Seq[String] = {
    import spark.implicits._
    val victims = reapable(spark, registryPath, name)
    if (victims.isEmpty) return Seq.empty
    val conf = spark.sparkContext.hadoopConfiguration
    for (v <- victims) {
      val p = new org.apache.hadoop.fs.Path(v.model_path)
      p.getFileSystem(conf).delete(p, true): Unit
    }
    victims.map(v => (v.model_id, v.model_path)).toDF("model_id", "path")
      .write.mode("append").parquet(registryPath + ".reaped")
    victims.map(_.model_path)
  }

  private def reapedIds(spark: SparkSession,
      registryPath: String): Set[String] = {
    import spark.implicits._
    // existence through the Hadoop filesystem that reap() deletes and
    // appends with — a java.io.File check is wrong for any non-local
    // registryPath (file: URI, hdfs) and would break reap idempotence
    // (r17 review)
    val p = new org.apache.hadoop.fs.Path(registryPath + ".reaped")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Set.empty
    else spark.read.parquet(p.toString).select($"model_id").as[String]
      .collect().toSet
  }
}

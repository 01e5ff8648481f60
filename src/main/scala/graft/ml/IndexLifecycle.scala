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
}

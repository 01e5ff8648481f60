package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed model registry — the engine-native stand-in for the
  * reference's Cassandra `jobdb.ml_models` table (CQL DDL embedded in pyc
  * ml_train_from_cassandra_pyspark.get_models_from_cassandra@461:
  * model_id UUID PRIMARY KEY, …, feature_columns LIST<TEXT>, version INT).
  *
  * Append-only writes (K3); "latest model" = orderBy(training_date desc)
  * + head, exactly the reference's lookup shape (@540 get_latest_model).
  */
object ModelRegistry {

  final case class Entry(
      model_id: String,
      model_name: String,
      model_type: String,
      training_date: java.sql.Timestamp,
      rmse: Option[Double],
      r2: Option[Double],
      feature_columns: Seq[String],
      model_path: String,
      version: Int)

  def append(spark: SparkSession, registryPath: String, e: Entry): Unit = {
    import spark.implicits._
    Seq(e).toDF().write.mode("append").parquet(registryPath)
  }

  def all(spark: SparkSession, registryPath: String): DataFrame =
    spark.read.parquet(registryPath)

  /** Latest registered model of a type (orderBy desc + first). */
  def latest(spark: SparkSession, registryPath: String, modelType: String): Option[Entry] = {
    import spark.implicits._
    all(spark, registryPath)
      .filter(col("model_type") === modelType)
      .orderBy(col("training_date").desc, col("version").desc)
      .as[Entry].head(1).headOption
  }

  /** Latest registered model BY NAME — the reference's serving lookup
    * (pyc get_latest_model_from_cassandra@540: filter on model_name,
    * newest training_date wins; version desc tie-breaks same-timestamp
    * re-registrations). */
  def latestByName(spark: SparkSession, registryPath: String, modelName: String): Option[Entry] = {
    import spark.implicits._
    all(spark, registryPath)
      .filter(col("model_name") === modelName)
      .orderBy(col("training_date").desc, col("version").desc)
      .as[Entry].head(1).headOption
  }

  /** Registry-driven model selection end to end: resolve the newest
    * version of `modelName` and load its persisted pipeline from
    * model_path — the serving path never hard-codes a model location. */
  def loadLatest(spark: SparkSession, registryPath: String,
      modelName: String): Option[(Entry, org.apache.spark.ml.PipelineModel)] =
    latestByName(spark, registryPath, modelName)
      .map(e => (e, Pipelines.load(e.model_path)))

  // ------------------------------------------------------- promote / pin

  /** Pointer event: the serving indirection layered over the append-only
    * entry log. `latest*` answers "newest trained"; the POINTER answers
    * "what production serves" — decoupled, because a newer model is not
    * a better model until someone promotes it, and a promoted model must
    * be instantly revocable. Events are append-only like everything else
    * (the audit trail IS the table); the current pin = highest seq.
    * Single-writer control-plane semantics (a human or a deploy job
    * promotes — this is registry metadata, not a data-plane path). */
  final case class PointerEvent(
      model_name: String, model_id: String, action: String, seq: Long)

  private def pointersPath(registryPath: String) = registryPath + ".pointers"

  private def pointerLog(spark: SparkSession, registryPath: String,
      modelName: String): Seq[PointerEvent] = {
    import spark.implicits._
    val p = pointersPath(registryPath)
    if (!new java.io.File(p).exists()) Seq.empty
    else spark.read.parquet(p).as[PointerEvent]
      .filter(_.model_name == modelName).collect().sortBy(_.seq).toSeq
  }

  /** Point serving at a registered model_id (must exist in the entry
    * log — a pointer to nothing is a deploy-time error, caught here). */
  def promote(spark: SparkSession, registryPath: String,
      modelName: String, modelId: String): Unit = {
    import spark.implicits._
    val exists = all(spark, registryPath)
      .filter(col("model_name") === modelName && col("model_id") === modelId)
      .limit(1).count() == 1
    require(exists, s"cannot promote unregistered model $modelName/$modelId")
    val seq = pointerLog(spark, registryPath, modelName).lastOption.map(_.seq + 1).getOrElse(0L)
    Seq(PointerEvent(modelName, modelId, "promote", seq)).toDF()
      .write.mode("append").parquet(pointersPath(registryPath))
  }

  /** Re-point serving at the PREVIOUS pinned model (one step back in the
    * event log, whatever action set it). None when there is no earlier
    * pin to restore — rollback from the first promotion is a no-op, not
    * an un-pin. Returns the restored model_id. */
  def rollback(spark: SparkSession, registryPath: String,
      modelName: String): Option[String] = {
    import spark.implicits._
    val log = pointerLog(spark, registryPath, modelName)
    if (log.length < 2) None
    else {
      val prev = log(log.length - 2)
      val ev = PointerEvent(modelName, prev.model_id, "rollback", log.last.seq + 1)
      Seq(ev).toDF().write.mode("append").parquet(pointersPath(registryPath))
      Some(prev.model_id)
    }
  }

  /** The pointer log's model_id sequence for a name (ascending seq) —
    * the retention reader: the LAST id is the pin, the one before it
    * is what [[rollback]] would restore, and a reap must keep both. */
  def pinHistory(spark: SparkSession, registryPath: String,
      modelName: String): Seq[String] =
    pointerLog(spark, registryPath, modelName).map(_.model_id)

  /** The currently pinned entry for a name (None = never promoted). */
  def pinned(spark: SparkSession, registryPath: String,
      modelName: String): Option[Entry] = {
    import spark.implicits._
    pointerLog(spark, registryPath, modelName).lastOption.flatMap { ev =>
      all(spark, registryPath)
        .filter(col("model_name") === modelName && col("model_id") === ev.model_id)
        .as[Entry].head(1).headOption
    }
  }

  /** What a serving node actually calls: resolve the pin, load the
    * pipeline from its registered path. */
  def loadPinned(spark: SparkSession, registryPath: String,
      modelName: String): Option[(Entry, org.apache.spark.ml.PipelineModel)] =
    pinned(spark, registryPath, modelName)
      .map(e => (e, Pipelines.load(e.model_path)))
}

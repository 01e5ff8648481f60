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
}

package graft.streaming

import graft.etl.{JobEtl, JobSchema}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.Row

/** Structured Streaming wrapper around the batch ETL (SURVEY §2.12 /
  * §3.1): the transform is the SAME Column pipeline as JobEtl.transform —
  * a stateless map-only plan, so it runs unchanged under micro-batch
  * execution in append mode with no watermark (the reference's shape:
  * job_streaming.py:47-53,164-170, batchWatermarkMs=0).
  *
  * Source here is JSON-lines (file or memory stream) standing in for the
  * Kafka envelope: `parseJson` replicates
  * from_json(cast(value,string), schema).select("data.*")
  * (job_streaming.py:55-57) so a Kafka `value` column drops straight in.
  */
object StreamingEtl {

  /** Kafka-envelope parse: raw string `value` → typed columns (F1). */
  def parseJson(raw: DataFrame): DataFrame =
    raw.select(from_json(col("value").cast("string"), JobSchema.schema).as("data"))
      .select("data.*")

  /** value-lines → full ETL stream (works on streaming or batch frames). */
  def transform(raw: DataFrame): DataFrame =
    JobEtl.transform(parseJson(raw))

  /** File-source stream of JSON lines → cleaned postings. */
  def fromJsonDir(spark: SparkSession, inputDir: String): DataFrame = {
    val lines = spark.readStream
      .format("text")
      .load(inputDir)
      .withColumnRenamed("value", "value")
    transform(lines)
  }

  /** Parquet append sink with checkpoint — exactly-once via checkpointed
    * offsets + idempotent file commits (the engine-native equivalent of
    * the reference's checkpointed Cassandra append). Checkpoint dirs are
    * versioned by the caller-supplied suffix: the reference burned three
    * incompatible checkpoint dirs (SURVEY §2.12); making the version part
    * of the path is the lesson learned. */
  def toParquet(etl: DataFrame, outDir: String, checkpointDir: String): DataStreamWriter[Row] =
    etl.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())

  /** Windowed extension point (not in the reference, free in the engine):
    * tumbling per-minute posting counts by city with a 10-minute
    * watermark for late data. */
  def cityCountsPerWindow(etl: DataFrame): DataFrame =
    etl
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 minute"), col("city"))
      .agg(count(lit(1)).as("n_postings"))

  def start(spark: SparkSession, inputDir: String, outDir: String,
      checkpointDir: String): StreamingQuery =
    toParquet(fromJsonDir(spark, inputDir), outDir, checkpointDir).start()

  /** foreachBatch sink: each micro-batch handed to an arbitrary BATCH
    * writer — the engine-native stand-in for the reference's Cassandra
    * writeStream (any store with a batch connector gets exactly-once via
    * the checkpoint + an idempotent upsert keyed on batchId). The default
    * writer appends parquet stamped with the batch id so replays are
    * visible/idempotent-checkable. */
  def toForeachBatch(etl: DataFrame, outDir: String, checkpointDir: String)(
      write: (org.apache.spark.sql.Dataset[Row], Long) => Unit = { (batch, id) =>
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(outDir)
      }): DataStreamWriter[Row] =
    etl.writeStream
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .foreachBatch(write)
}

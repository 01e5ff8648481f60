package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.Row

/** Kafka source/sink wiring (SURVEY §2.1 S1 / §2.2 K6), mirroring the
  * reference's subscription options (job_streaming.py:47-53) and producer
  * contract (real_time_data_simulation.py:36-40: JSON value, key = city).
  *
  * Deployment note: requires the spark-sql-kafka connector on the
  * classpath and a reachable broker — neither exists in the test
  * container, so these builders are exercised at compile/contract level
  * only; StreamingEtlSpec drives the identical ETL through MemoryStream
  * and file sources (StreamingEtl.parseJson is shared, so the Kafka
  * `value` column drops straight into the tested path).
  */
object Kafka {

  /** Subscribe: latest offsets, tolerate broker truncation
    * (failOnDataLoss=false) exactly as the reference does. */
  def source(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    spark.readStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("startingOffsets", "latest")
      .option("failOnDataLoss", "false")
      .load()

  /** Kafka source → cleaned postings: the full streaming ETL. */
  def jobPostings(spark: SparkSession, bootstrap: String, topic: String): DataFrame =
    StreamingEtl.transform(source(spark, bootstrap, topic))

  /** Producer sink: JSON value, key = city (keeps the reference's
    * per-city partition affinity). */
  def sink(df: DataFrame, bootstrap: String, topic: String,
      checkpointDir: String): DataStreamWriter[Row] =
    df.select(
        col("city").cast("string").as("key"),
        to_json(struct(df.columns.map(col): _*)).as("value"))
      .writeStream
      .format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
      .option("checkpointLocation", checkpointDir)
}

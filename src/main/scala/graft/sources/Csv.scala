package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** CSV source/sink (SURVEY §2.1 S3 — the reference's producer reads
  * jobs.csv driver-side; the engine reads it distributed).
  *
  * Schema is always explicit: schema inference costs a full extra pass
  * over the data at 100 TB and can mistype sparse columns.
  */
object Csv {
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("multiLine", "false")
      .schema(schema)
      .csv(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "true").csv(path)
}

package graft.etl

import org.apache.spark.sql.types._

/** Canonical job-posting input schema.
  *
  * Mirrors the reference's explicitly-declared (never inferred) Kafka payload
  * schema — see /root/reference/spark/app/job_streaming.py:27-41. Declared
  * once here so batch ETL, streaming ETL and tests all parse identically.
  */
object JobSchema {
  val schema: StructType = StructType(Seq(
    StructField("job_title", StringType),
    StructField("job_type", StringType),
    StructField("position_level", StringType),
    StructField("city", StringType),
    StructField("experience", StringType),
    StructField("skills", StringType),
    StructField("job_fields", StringType),
    StructField("salary", StringType),
    StructField("salary_min", DoubleType),
    StructField("salary_max", DoubleType),
    StructField("unit", StringType),
    StructField("event_time", StringType),
    StructField("event_type", StringType)))
}

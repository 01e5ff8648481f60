package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The full job-posting ETL transform: the engine's spine, mirroring
  * /root/reference/spark/app/job_streaming.py:62-156 as a single
  * DataFrame => DataFrame so batch and Structured Streaming share it
  * verbatim (same logical plan, map-only → stateless streaming).
  *
  * Everything is Column expressions — the whole chain folds into ONE
  * codegen'd projection over the scan: no shuffle, no state, linear scale.
  */
object JobEtl {

  /** Apply normalization + derived columns to a jobs-shaped frame
    * (schema ⊇ JobSchema minus kafka envelope).
    *
    * @param deterministicId when true, `id` is a content hash
    *   (sha2 of the natural key) instead of `uuid()` — golden tests and
    *   oracle checks need determinism; production streaming wants uuid()
    *   (reference job_streaming.py:153).
    */
  def transform(df: DataFrame, deterministicId: Boolean = false): DataFrame = {
    val sMin = SalaryParser.salaryMin(col("salary"))
    val sMax = SalaryParser.salaryMax(col("salary"))
    val eMin = ExperienceParser.expMinYear(col("experience"))
    val withCols = df
      .filter(col("job_title").isNotNull)
      .withColumn("event_time", to_timestamp(col("event_time")))
      .withColumn("salary_min", sMin)
      .withColumn("salary_max", sMax)
      .withColumn("salary_avg", SalaryParser.salaryAvg(col("salary_min"), col("salary_max")))
      .withColumn("exp_min_year", eMin)
      .withColumn("exp_max_year", ExperienceParser.expMaxYear(col("experience")))
      .withColumn("exp_avg_year", ExperienceParser.expAvgYear(col("exp_min_year")))
      .withColumn("exp_type", ExperienceParser.expType(col("experience")))
      .withColumn("city",
        when(col("city") === "" || col("city").isNull, lit("Unknown"))
          .otherwise(col("city")))
    if (deterministicId)
      withCols.withColumn("id",
        sha2(concat_ws("", col("job_title"), col("city"), col("salary"),
          col("experience"), col("event_time").cast("string")), 256))
    else
      withCols.withColumn("id", expr("uuid()"))
  }
}

package graft.etl

import org.apache.spark.sql.{Dataset, DataFrame, Encoder, Encoders}

/** Typed boundary for cleaned job postings (SURVEY §1.3: case-class
  * Datasets at pipeline boundaries, untyped Column expressions inside).
  * Downstream consumers get compile-time field checking; the ETL interior
  * stays DataFrame/Column for Catalyst's benefit.
  */
final case class JobPosting(
    id: String,
    job_title: String,
    city: String,
    salary_min: Option[Double],
    salary_max: Option[Double],
    salary_avg: Double,
    exp_min_year: Option[Double],
    exp_max_year: Option[Double],
    exp_avg_year: Option[Double],
    exp_type: String,
    skills: String)

object JobPosting {
  implicit val encoder: Encoder[JobPosting] = Encoders.product[JobPosting]

  /** Narrow a cleaned-ETL frame to the typed boundary schema. */
  def fromEtl(df: DataFrame): Dataset[JobPosting] = {
    import org.apache.spark.sql.functions.col
    df.select(
        col("id"), col("job_title"), col("city"), col("salary_min"),
        col("salary_max"), col("salary_avg"), col("exp_min_year"),
        col("exp_max_year"), col("exp_avg_year"), col("exp_type"), col("skills"))
      .as[JobPosting]
  }
}

package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Salary normalization → millions of VND.
  *
  * Pure `Column => Column` expressions (no UDFs) so the whole cascade folds
  * into one codegen'd projection — a single map-only pass at any scale.
  * Semantics replicate /root/reference/spark/app/job_streaming.py:70-110:
  *
  *   1. lowercase; extract min as first number run, max as number after '-';
  *   2. if the text mentions millions ("triệu|tr|m") keep the raw number,
  *      else strip [.,] thousand separators before the double cast;
  *   3. unit inference: USD → *25/1000; >=1000 → raw VND /1e6;
  *      (100,1000) → thousands /1e3; else already millions;
  *   4. avg = (min+max)/2 | min | 0.0.
  *
  * Cast-failure semantics are null-on-error (the reference ran Spark 3.5
  * with ANSI off); sessions set spark.sql.ansi.enabled=false to match.
  */
object SalaryParser {

  private val numPat    = "(\\d+[.,\\d]*)"
  private val numMaxPat = "-\\s*(\\d+[.,\\d]*)"

  /** Raw-number → double, separator-aware (job_streaming.py:75-84). */
  private def sepAware(clean: Column, raw: Column): Column =
    when(clean.rlike("triệu|tr|m"), raw.cast("double"))
      .otherwise(regexp_replace(raw, "[.,]", "").cast("double"))

  /** Unit inference to millions of VND (job_streaming.py:87-99). */
  private def toMillions(clean: Column, v: Column): Column =
    when(clean.rlike("usd|\\$"), (v * 25) / 1000)
      .when(v >= 1000, v / 1000000)
      .when(v > 100 && v < 1000, v / 1000)
      .otherwise(v)

  /** Normalized lower bound in millions of VND (null if unparseable). */
  def salaryMin(salary: Column): Column = {
    val clean = lower(salary)
    toMillions(clean, sepAware(clean, regexp_extract(clean, numPat, 1)))
  }

  /** Normalized upper bound in millions of VND (null if absent). */
  def salaryMax(salary: Column): Column = {
    val clean = lower(salary)
    toMillions(clean, sepAware(clean, regexp_extract(clean, numMaxPat, 1)))
  }

  /** Midpoint | lower bound | 0.0 (job_streaming.py:105-110). */
  def salaryAvg(min: Column, max: Column): Column =
    when(min.isNotNull && max.isNotNull, (min + max) / 2)
      .when(min.isNotNull, min)
      .otherwise(lit(0.0))

}

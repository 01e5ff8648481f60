package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Experience-requirement parsing (years) + requirement-type classification.
  *
  * Pure `Column => Column` when-cascades replicating
  * /root/reference/spark/app/job_streaming.py:115-147:
  *
  *   exp_min_year — 7-branch cascade: "không yêu cầu" → null;
  *     "chưa có|mới tốt nghiệp|intern" → 0; "từ/from/at least/tối thiểu/min N"
  *     → N (group after the keyword); "N+" → N; "N năm|year|yoe|kn" → N;
  *     "N - M" → N; else null.
  *   exp_max_year — only ranges "N - M" → M (group-2 extraction).
  *   exp_avg_year — coalesce(min, 0) with a >40-years noise gate → null.
  *   exp_type — 6-way substring classification enum.
  *
  * Branch ORDER is semantics: "Từ 3 năm" must hit the keyword branch, not
  * the "N năm" branch. Keep in sync with the reference cascade.
  */
object ExperienceParser {

  private val rangePat = "(\\d+)\\s*-\\s*(\\d+)"
  private val fromPat  = "(?:từ|from|at least|tối thiểu|min)\\s*(\\d+)"

  def expMinYear(experience: Column): Column = {
    val raw = lower(experience)
    when(raw.contains("không yêu cầu"), lit(null))
      .when(raw.rlike("chưa có|mới tốt nghiệp|intern"), lit(0.0))
      .when(raw.rlike("(từ|from|at least|tối thiểu|min)\\s*(\\d+)"),
        regexp_extract(raw, fromPat, 1).cast("double"))
      .when(raw.rlike("(\\d+)\\s*\\+"), regexp_extract(raw, "(\\d+)", 1).cast("double"))
      .when(raw.rlike("(\\d+)\\s*(năm|year|yoe|kn)"),
        regexp_extract(raw, "(\\d+)", 1).cast("double"))
      .when(raw.rlike(rangePat), regexp_extract(raw, rangePat, 1).cast("double"))
      .otherwise(lit(null))
  }

  def expMaxYear(experience: Column): Column = {
    val raw = lower(experience)
    when(raw.rlike(rangePat), regexp_extract(raw, rangePat, 2).cast("double"))
      .otherwise(lit(null))
  }

  /** coalesce(min, 0) with >40y noise nulled (job_streaming.py:132-135). */
  def expAvgYear(expMin: Column): Column = {
    val tmp = coalesce(expMin, lit(0.0))
    when(tmp > 40, lit(null)).otherwise(tmp)
  }

  /** Requirement-type enum (job_streaming.py:138-147). */
  def expType(experience: Column): Column = {
    val raw = lower(experience)
    when(raw.contains("không yêu cầu"), lit("no_requirement"))
      .when(raw.contains("chưa có"), lit("no_experience"))
      .when(raw.contains("mới tốt nghiệp"), lit("fresh_graduate"))
      .when(raw.contains("lên đến"), lit("upper_bound"))
      .when(raw.contains("trên"), lit("lower_bound"))
      .when(raw.rlike(rangePat), lit("range"))
      .otherwise(lit("unknown"))
  }
}

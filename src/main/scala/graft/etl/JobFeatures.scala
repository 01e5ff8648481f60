package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Batch feature engineering over cleaned job postings: the regex-flag
  * featurizer, skills explode/aggregate, and the hot-score formula.
  *
  * Semantics from the reference's batch trainers:
  *   - flag columns: /root/reference/spark/app/train_random_forest.py:56-136
  *   - skills explode + per-skill aggregate: train_gbt.py:59-88
  *   - hot score 0.4·salary̅+0.3·demand−0.2·exp̅+0.1·city: train_gbt.py:95-116
  *
  * All flags are rlike predicates over lowercase text → one codegen'd
  * projection; explode is Spark's Generator (no UDTF). The per-skill
  * aggregate is a hash aggregate with map-side partials — the shape that
  * survives 100 TB (skill cardinality is small; no skew concern).
  */
object JobFeatures {

  /** 1.0/0.0 regex flag (train_random_forest.py idiom). */
  def flag(c: Column, pattern: String): Column =
    when(lower(c).rlike(pattern), 1.0).otherwise(0.0)

  /** Labels + sanity filter (train_random_forest.py:36-52,142-147):
    * salary_final/exp_final coalesce chains, salary ∈ (0,200], exp ∈ [0,30]. */
  def withLabels(df: DataFrame): DataFrame =
    df.withColumn("salary_final",
        coalesce(col("salary_avg"), (col("salary_min") + col("salary_max")) / 2, lit(0.0)))
      .withColumn("exp_final",
        coalesce(col("exp_avg_year"), col("exp_min_year"), lit(0.0)))
      .filter(col("salary_final") > 0 && col("salary_final") <= 200 &&
        col("exp_final") >= 0 && col("exp_final") <= 30)

  /** The 15 reference flag columns (city / industry / position level). */
  def withFlags(df: DataFrame): DataFrame = df
    .withColumn("is_hcm", flag(col("city"), "hồ chí minh|hcm"))
    .withColumn("is_hanoi", flag(col("city"), "hà nội|ha noi|hanoi"))
    .withColumn("is_danang", flag(col("city"), "đà nẵng|da nang"))
    .withColumn("is_it", flag(col("job_fields"), "it|phần mềm|developer|lập trình|data|ai|software"))
    .withColumn("is_sales", flag(col("job_fields"), "bán hàng|kinh doanh|sales|tiếp thị|marketing"))
    .withColumn("is_finance", flag(col("job_fields"), "tài chính|ngân hàng|kế toán|finance|banking"))
    .withColumn("is_education", flag(col("job_fields"), "giáo dục|đào tạo|giáo viên|education"))
    .withColumn("is_engineering", flag(col("job_fields"), "kỹ thuật|cơ khí|điện|xây dựng|engineer"))
    .withColumn("is_intern", flag(col("position_level"), "thực tập|intern|internship"))
    .withColumn("is_fresher", flag(col("position_level"), "fresher|mới ra trường|sinh viên mới"))
    .withColumn("is_junior", flag(col("position_level"), "junior"))
    .withColumn("is_staff", flag(col("position_level"), "nhân viên|chuyên viên|staff|employee"))
    .withColumn("is_senior", flag(col("position_level"), "senior|chuyên gia|chuyên viên cao cấp"))
    .withColumn("is_team_lead", flag(col("position_level"), "trưởng nhóm|team lead|leader|tech lead"))
    .withColumn("is_manager", flag(col("position_level"), "trưởng phòng|quản lý|giám đốc|manager|head|director"))

  /** Explode comma-separated skills → one row per (job, skill), cleaned
    * (train_gbt.py:59-67): lowercase, split, trim, drop empties and
    * len<=1 noise. */
  def explodeSkills(df: DataFrame): DataFrame =
    df.filter(col("skills").isNotNull && col("skills") =!= "")
      .withColumn("skill", explode(split(lower(col("skills")), ",")))
      .withColumn("skill", trim(col("skill")))
      .filter(col("skill") =!= "" && length(col("skill")) > 1)

  /** Per-skill aggregate + hot score (train_gbt.py:80-116). Uses
    * decimal-exact partial sums (graft.util.Num) so results are
    * shuffle-order independent and oracle-portable. */
  def skillHotScores(exploded: DataFrame, minJobs: Int = 10): DataFrame = {
    import graft.util.Num._
    exploded
      .withColumn("is_big_city", flag(col("city"), "hồ chí minh|hà nội|hcm|ha noi"))
      .groupBy(col("skill"))
      .agg(
        count(lit(1)).as("job_count"),
        davg(col("salary_avg")).as("avg_salary"),
        davg(col("exp_avg_year")).as("avg_exp"),
        davg(col("is_big_city")).as("big_city_ratio"))
      .filter(col("job_count") >= minJobs)
      .withColumn("salary_norm", col("avg_salary") / 100.0)
      .withColumn("demand_norm", least(col("job_count") / 100.0, lit(1.0)))
      .withColumn("exp_norm", col("avg_exp") / 10.0)
      .withColumn("skill_hot_score",
        col("salary_norm") * 0.4 + col("demand_norm") * 0.3
          - col("exp_norm") * 0.2 + col("big_city_ratio") * 0.1)
  }
}

package graft.ml

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The PUBLISHED attractiveness-serving logistic (mq14): a trained
  * LogisticRegression's coefficients frozen as constants —
  * [[FrozenSalaryRf]]'s frozen-parameters move applied to the
  * reference's OTHER persisted serving model, the
  * job_attractiveness_logistic_v2 pipeline (indexed/one-hot city +
  * position_level over the numeric pair, regParam=0.01 — the exact
  * shape [[Pipelines.attractivenessLogistic]] builds and mq05 trains).
  *
  * What is hashed and why: the MARGIN (wᵀx + b — multiplies and
  * left-associated adds, exactly specified IEEE ops both engines
  * replay bit-identically) and the predicted CLASS (the margin's
  * sign), NOT the probability — sigmoid needs `exp`, whose last-bit
  * behavior is library-specific and NOT guaranteed identical across
  * engines. Class and ranking are margin-monotone, so serving loses
  * nothing by staying on the safe side of the transcendental.
  *
  * One-hot replay: the fitted StringIndexer(handleInvalid=keep) +
  * OneHotEncoder(dropLast) pair gives each SEEN label one coefficient
  * and scores unseen/null values all-zero — frozen here as a
  * label→weight CASE whose ELSE 0.0 is exactly that keep-slot
  * behavior. Weights are keyed by label STRING, so the replay is
  * independent of the indexer's frequency ordering.
  *
  * Provenance: frozen by [[FreezeLr]] (LBFGS on fixed data from the
  * default initial point is deterministic), fit on the sf0.01
  * featurized postings (12857 rows). Double.toString literals
  * round-trip identically in Scala and DuckDB.
  *
  * 100 TB: pure per-row projection — two multiplies, two CASE lookups,
  * five adds, no shuffle, no model object in the hot path. */
object FrozenAttractivenessLr {

  // frozen from LogisticRegression(regParam=0.01) fit on
  // /root/testdata/sf0.01 (12857 rows), features = (salary_final,
  // exp_final, city one-hot, position_level one-hot), label
  // is_hot = salary_final > 25 (mq05's threshold proxy)
  val intercept: Double = -5.729623713453415
  val wSalary: Double = 0.2227942657079597
  val wExp: Double = 0.04771984085319487
  /** One weight per city label the fit SAW (the fixture's filtered
    * postings); any other value scores 0 — the keep-slot semantics. */
  val cityWeights: Seq[(String, Double)] = Seq(
    ("Cần Thơ", 0.6011983861845759),
    ("Hà Nội", -0.2936859185871708),
    ("Hồ Chí Minh", -0.1742193622207193),
    ("TP HCM", 0.31979103740231357),
    ("Unknown", -0.12832600572321823),
    ("Đà Nẵng", -0.3248794286102272))
  /** Position-level weights. Only six labels: the seventh fixture
    * class never survives the postings filters at sf0.01, so the fit
    * never saw it — it scores 0 like any unseen value, consistently
    * in both engines. */
  val posWeights: Seq[(String, Double)] = Seq(
    ("Fresher", -0.23039466564598052),
    ("Junior Developer", 0.615796146420985),
    ("Senior Developer", -0.09576526544741956),
    ("Thực tập sinh", -0.09651002956218682),
    ("Trưởng nhóm", -0.0974581072520807),
    ("Quản lý", -0.09570380888810266))

  private def groupCol(weights: Seq[(String, Double)], v: Column): Column =
    weights.foldRight(lit(0.0)) { case ((label, w), els) =>
      when(v === lit(label), lit(w)).otherwise(els)
    }

  private def groupSql(weights: Seq[(String, Double)], v: String): String = {
    val whens = weights
      .map { case (l, w) => s"WHEN $v = '$l' THEN $w" }.mkString(" ")
    s"CASE $whens ELSE 0.0 END"
  }

  /** margin = b + w_sal·salary + w_exp·exp + cityW + posW — two
    * multiplies and four left-associated adds in published order,
    * identical in both engines (same precedence, same association). */
  def marginCol(salary: Column, exp: Column, city: Column,
      pos: Column): Column =
    lit(intercept) + lit(wSalary) * salary + lit(wExp) * exp +
      groupCol(cityWeights, city) + groupCol(posWeights, pos)

  def marginSql(salary: String, exp: String, city: String,
      pos: String): String =
    s"$intercept + $wSalary * $salary + $wExp * $exp + " +
      s"${groupSql(cityWeights, city)} + ${groupSql(posWeights, pos)}"

  /** The predicted class: the margin's sign (1.0 ⇔ P(hot) > 0.5 —
    * sigmoid is monotone, so the threshold crosses at margin 0 and the
    * transcendental never needs evaluating). */
  def classCol(margin: Column): Column =
    when(margin > 0.0, 1.0).otherwise(0.0)

  def classSql(margin: String): String =
    s"CASE WHEN ($margin) > 0.0 THEN 1.0 ELSE 0.0 END"
}

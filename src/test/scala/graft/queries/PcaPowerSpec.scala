package graft.queries

import graft.TestSpark
import graft.sources.Tables
import org.scalatest.funsuite.AnyFunSuite

/** sq15's oracle proves cross-engine agreement; this spec proves the
  * MATH — the distributed fixed-point power iteration lands on the same
  * vector as an independent plain-Scala implementation of the same
  * recurrence, and that vector is genuinely the dominant eigendirection
  * (converged Rayleigh alignment, variance share above the uniform
  * floor). */
class PcaPowerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("fixed-point power iteration is reference-equal and converged") {
    import spark.implicits._
    val out = SimilarityQueries.sq15PcaPower.fn(spark, dir)
      .select($"dim_idx", $"m_sum", $"q_diag", $"v_fp", $"lambda_fp", $"trace_q")
      .collect().sortBy(_.getInt(0))
    val d = out.length
    assert(d == 64)
    val v = out.map(_.getLong(3))
    val lambda = out.head.getLong(4)
    val trace = out.head.getLong(5)

    // independent reference: same quantization, same recurrence, plain Scala
    val vecs = Tables.embeddings(spark, dir)
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).map(x => math.round(x.toDouble * 1000)).toArray)
    val n = vecs.length.toLong
    val m = Array.tabulate(d)(i => vecs.map(_(i)).sum)
    val q = Array.tabulate(d, d)((i, j) =>
      n * vecs.map(r => r(i) * r(j)).sum - m(i) * m(j))
    var rv = Array.fill(d)(BigInt(1000))
    for (_ <- 1 to 12) {
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => BigInt(q(i)(j)) * rv(j)).sum)
      val mxd = (w.map(_.abs).max / 1000).max(BigInt(1))
      rv = w.map(x => if (x < 0) -(x.abs / mxd) else x.abs / mxd)
    }
    assert(v.toSeq == rv.map(_.toLong).toSeq,
      "distributed fixed-point iteration diverged from the reference recurrence")
    // per-dim moments agree with the reference too
    assert(out.map(_.getLong(1)).toSeq == m.toSeq)
    assert(out.map(_.getLong(2)).toSeq == (0 until d).map(i => q(i)(i)))

    // converged: Q·v is aligned with v (the eigen-equation up to scale)
    val qv = Array.tabulate(d)(i => (0 until d).map(j => q(i)(j).toDouble * v(j)).sum)
    val cos = qv.zip(v).map { case (a, b) => a * b.toDouble }.sum /
      (math.sqrt(qv.map(x => x * x).sum) * math.sqrt(v.map(x => x.toDouble * x).sum))
    assert(cos > 0.99, f"Rayleigh alignment $cos%.4f — not converged in 12 rounds")
    // the dominant direction beats the uniform floor and the share is sane
    assert(lambda.toDouble / trace > 1.0 / d)
    assert(lambda.toDouble / trace <= 1.0)
  }
}

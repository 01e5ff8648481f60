package graft.operators

import graft.TestSpark
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties for the Morton interleave: injectivity (the
  * z-value must uniquely determine the point, or two distinct rows could
  * collapse into one cluster position) and locality monotonicity (the
  * z-value of a quadrant's points stays inside the quadrant's z-range —
  * the property file-level min/max pruning rests on).
  */
class ZOrderPropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  /** Driver-side model: textbook bit interleave. */
  private def modelZ(a: Long, b: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (z, i) =>
      z | ((a >> i) & 1L) << (2 * i) | ((b >> i) & 1L) << (2 * i + 1)
    }

  test("zValue matches the bit-interleave model and is injective (batched)") {
    import spark.implicits._
    val coord = Gen.choose(0L, (1L << 16) - 1)
    val points = Gen.listOfN(200, Gen.zip(coord, coord))
    check(Prop.forAll(points) { ps =>
      val df = ps.toDF("a", "b")
        .select($"a", $"b", ZOrder.zValue($"a", $"b", 16).as("z"))
      val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val modelOk = rows.forall { case (a, b, z) => z == modelZ(a, b, 16) }
      // injective: distinct points -> distinct z
      val distinctPoints = ps.distinct.size
      val distinctZ = rows.map(_._3).distinct.length
      modelOk && distinctZ == distinctPoints
    })
  }

  test("a power-of-two-aligned quadrant's points occupy a contiguous private z-range") {
    import spark.implicits._
    // quadrant [qa*2^k, (qa+1)*2^k) × [qb*2^k, (qb+1)*2^k): its z-values
    // must all share the prefix z(qa*2^k, qb*2^k) >> 2k — i.e. inside-
    // quadrant points can never z-sort between another quadrant's points
    val gen = for {
      k <- Gen.choose(1, 8)
      qa <- Gen.choose(0L, (1L << (16 - k)) - 1)
      qb <- Gen.choose(0L, (1L << (16 - k)) - 1)
      offs <- Gen.listOfN(50, Gen.zip(Gen.choose(0L, (1L << k) - 1), Gen.choose(0L, (1L << k) - 1)))
    } yield (k, qa, qb, offs)
    check(Prop.forAll(gen) { case (k, qa, qb, offs) =>
      val pts = offs.map { case (da, db) => ((qa << k) + da, (qb << k) + db) }
      val zs = pts.toDF("a", "b")
        .select(ZOrder.zValue($"a", $"b", 16).as("z")).as[Long].collect()
      val prefix = modelZ(qa << k, qb << k, 16) >> (2 * k)
      zs.forall(z => (z >> (2 * k)) == prefix)
    })
  }
}

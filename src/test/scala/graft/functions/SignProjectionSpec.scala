package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fused sign-projection expression must agree exactly with the
  * declarative explode × sign-join + aggregate shape it replaced (both
  * are exact BIGINT arithmetic — equality is bitwise, no tolerance),
  * handle nulls and short vectors, and produce identical results
  * interpreted vs codegen'd.
  */
class SignProjectionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 8
  private val planes = 12
  private val signs: Array[Byte] =
    Array.tabulate(planes * dim)(idx => if ((idx * 2654435761L) % 3 == 0) 1 else -1)

  test("matches the explode + sign-join + aggregate composition exactly") {
    import spark.implicits._
    val vecs = (0 until 50).map(v =>
      (v.toLong, (0 until dim).map(i => ((v * 31 + i * 7) % 2001 - 1000).toLong)))
      .toDF("vec_id", "x")
    val native = vecs.select($"vec_id",
        posexplode(SignProjection($"x", signs, planes, dim)).as(Seq("p", "dot")))
      .as[(Long, Int, Long)].collect().toSet
    val signDf = signs.zipWithIndex
      .map { case (s, idx) => (idx / dim, idx % dim, s.toLong) }
      .toSeq.toDF("p", "i", "s")
    val joined = vecs.select($"vec_id", posexplode($"x").as(Seq("i", "xq")))
      .join(broadcast(signDf), Seq("i"))
      .groupBy($"vec_id", $"p").agg(sum($"s" * $"xq").as("dot"))
      .as[(Long, Int, Long)].collect().toSet
    assert(native == joined)
    assert(native.size == 50 * planes)
  }

  test("null vector yields null; short vector uses the prefix") {
    import spark.implicits._
    val df = Seq(
      (1L, Option(Seq(1L, 2L))), // shorter than dim: prefix only
      (2L, Option.empty[Seq[Long]]))
      .toDF("vec_id", "x")
      .select($"vec_id", SignProjection($"x", signs, planes, dim).as("d"))
      .collect()
    val short = df.find(_.getLong(0) == 1L).get
    val expected = (0 until planes).map(p =>
      signs(p * dim) * 1L + signs(p * dim + 1) * 2L)
    assert(short.getSeq[Long](1) == expected)
    assert(df.find(_.getLong(0) == 2L).get.isNullAt(1))
  }

  test("interpreted eval equals codegen output") {
    import spark.implicits._
    val x = (0 until dim).map(i => (i * 997 - 3000).toLong)
    val fromDf = Seq(Tuple1(x)).toDF("x")
      .select(SignProjection($"x", signs, planes, dim))
      .head().getSeq[Long](0)
    // nullSafeEval path, driven directly
    val expr = SignProjection(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        x, org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)), signs, planes, dim)
    val interp = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray().toSeq
    assert(fromDf == interp)
  }
}

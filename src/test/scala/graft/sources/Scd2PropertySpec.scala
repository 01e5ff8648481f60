package graft.sources

import graft.TestSpark
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck property: the distributed SCD2 merge (semi-prunes, window
  * passes, unions) must agree with a sequential in-memory fold of the
  * same versioning rules over random in-order update streams split into
  * random batch boundaries — the class of bug this catches is a join or
  * window getting the PARTITIONED computation wrong, which the
  * example-based spec can miss.
  */
class Scd2PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private case class V(key: Long, seg: String, from: Long, to: Option[Long])

  /** Sequential reference: per key per batch, chain candidates in ts
    * order, suppress candidates equal to their surviving predecessor. */
  private def model(batches: Seq[Seq[(Long, String, Long)]]): Set[V] = {
    val closed = scala.collection.mutable.ListBuffer.empty[V]
    val open = scala.collection.mutable.Map.empty[Long, V]
    for (batch <- batches; (key, upds) <- batch.groupBy(_._1)) {
      val cand = open.get(key).map(v => (v.from, v.seg)).toList ++
        upds.sortBy(_._3).map(u => (u._3, u._2))
      val kept = cand.foldLeft(List.empty[(Long, String)]) { (acc, c) =>
        if (acc.nonEmpty && acc.head._2 == c._2) acc else c :: acc
      }.reverse
      kept.sliding(2).foreach {
        case Seq((f, s), (t, _)) => closed += V(key, s, f, Some(t))
        case _ =>
      }
      val (lf, ls) = kept.last
      open(key) = V(key, ls, lf, None)
    }
    closed.toSet ++ open.values.toSet
  }

  test("distributed merge equals the sequential fold on random batched streams") {
    import spark.implicits._
    val gen = for {
      n <- Gen.chooseNum(3, 14)
      keys <- Gen.listOfN(n, Gen.chooseNum(1L, 4L))
      segs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
      cut1 <- Gen.chooseNum(1, n)
      cut2 <- Gen.chooseNum(cut1, n)
    } yield {
      val upds = keys.zip(segs).zipWithIndex.map { case ((k, s), i) =>
        (k, s, (i + 1) * 1000L)
      }
      Seq(upds.take(cut1), upds.slice(cut1, cut2), upds.drop(cut2))
        .filter(_.nonEmpty)
    }
    def ts(ms: Long) = new java.sql.Timestamp(ms)
    val prop = Prop.forAll(gen) { batches =>
      val empty = Seq.empty[(Long, String, java.sql.Timestamp)]
        .toDF("k", "seg", "ts")
        .select($"k", $"seg", $"ts".as("valid_from"),
          org.apache.spark.sql.functions.lit(null).cast("timestamp").as("valid_to"),
          org.apache.spark.sql.functions.lit(true).as("is_current"))
      val got = batches.foldLeft(empty) { (hist, b) =>
        Scd2.merge(hist, b.map { case (k, s, t) => (k, s, ts(t)) }
          .toDF("k", "seg", "ts"), "k", "ts", Seq("seg"))
      }.collect().map { r =>
        V(r.getLong(0), r.getString(1), r.getTimestamp(2).getTime,
          Option(r.getTimestamp(3)).map(_.getTime))
      }.toSet
      val want = model(batches)
      if (got != want) {
        println(s"batches=$batches\ngot=$got\nwant=$want")
      }
      got == want
    }
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}

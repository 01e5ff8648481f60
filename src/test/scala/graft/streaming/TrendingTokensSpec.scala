package graft.streaming

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Misra–Gries: heavy tokens survive across micro-batches with
  * bounded per-key state, and the stream-prefix guarantee holds at every
  * trigger.
  */
class TrendingTokensSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("heavy token tracked across micro-batches; state stays <= k counters") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val q = TrendingTokens.trending(stream.toDS().toDF("lang", "tok"), k = 8)
      .writeStream.format("memory").queryName("trending")
      .outputMode(TrendingTokens.outputMode).start()

    // batch 1: "hot" dominates en, plus unique noise
    stream.addData(Seq.fill(60)(("en", "hot")) ++
      (0 until 30).map(i => ("en", s"noise$i")): _*)
    q.processAllAvailable()
    // batch 2: more "hot" + fresh noise; de stream independent
    stream.addData(Seq.fill(40)(("en", "hot")) ++
      (0 until 30).map(i => ("en", s"late$i")) ++
      Seq.fill(5)(("de", "heiss")): _*)
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("trending").orderBy($"n_seen")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getSeq[org.apache.spark.sql.Row](2).map(x => x.getString(0) -> x.getLong(1))))
    val en = rows.filter(_._1 == "en")
    assert(en.map(_._2).toSeq == Seq(90L, 160L), "n_seen must accumulate across batches")
    // n = 160, k = 8 -> threshold 17; "hot" (count 100) must lead both triggers
    for ((_, _, top) <- en) {
      assert(top.head._1 == "hot", s"hot must lead: $top")
      assert(top.size <= 5)
    }
    val hotEst = en.last._3.head._2
    assert(hotEst <= 100 && hotEst >= 100 - 160 / 9, s"estimate out of bounds: $hotEst")
    // independent key: de saw only its own 5 events
    assert(rows.find(_._1 == "de").get._3 == Seq("heiss" -> 5L))
  }
}

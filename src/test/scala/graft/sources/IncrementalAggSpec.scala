package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** IncrementalAgg: merged partial aggregates must equal the one-shot
  * aggregate of all history, and a narrow batch must rewrite only the
  * buckets its keys hash to.
  */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("two sequential ingests equal the one-shot aggregate") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-iagg").toString + "/rollup"
    val docs = Tables.documents(spark, dir).select($"lang", $"n_chars")
    val (a, b) = (docs.filter(hash($"n_chars") % 2 === 0),
      docs.filter(hash($"n_chars") % 2 =!= 0))
    IncrementalAgg.init(spark, path, a, "lang", "n_chars")
    IncrementalAgg.ingest(spark, path, b, "lang", "n_chars")

    val got = IncrementalAgg.read(spark, path, "lang")
      .orderBy($"lang").select($"lang", $"sum", $"cnt").as[(String, Long, Long)].collect()
    val want = docs.groupBy($"lang")
      .agg(sum($"n_chars").cast("long").as("sum"), count($"n_chars").as("cnt"))
      .orderBy($"lang").as[(String, Long, Long)].collect()
    assert(got.toSeq == want.toSeq,
      s"merged rollup diverged from one-shot aggregate:\n$got\nvs\n$want")
  }

  test("a single-key batch rewrites only that key's bucket") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-iagg").toString + "/rollup"
    val docs = Tables.documents(spark, dir).select($"lang", $"n_chars")
    IncrementalAgg.init(spark, path, docs, "lang", "n_chars")
    def files(): Map[String, Set[(String, Long, Long)]] = {
      val root = new java.io.File(path)
      root.listFiles().filter(_.getName.startsWith("bucket=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet
      }.toMap
    }
    val before = files()
    val oneLang = docs.select($"lang").head.getString(0)
    val batch = Seq((oneLang, 7L)).toDF("lang", "n_chars")
    IncrementalAgg.ingest(spark, path, batch, "lang", "n_chars")
    val after = files()
    val hot = s"bucket=${Seq(oneLang).toDF("lang")
      .select(pmod(hash($"lang"), lit(IncrementalAgg.NumBuckets))).head.getInt(0)}"
    assert(after(hot) != before(hot), "hot bucket must be rewritten")
    (before.keySet - hot).foreach { b =>
      assert(after(b) == before(b), s"untouched bucket $b was rewritten")
    }
    // and the merged value is right
    val row = IncrementalAgg.read(spark, path, "lang")
      .filter($"lang" === oneLang).select($"sum", $"cnt").head
    val base = docs.filter($"lang" === oneLang)
      .agg(sum($"n_chars").cast("long"), count(lit(1))).head
    assert(row.getLong(0) == base.getLong(0) + 7L)
    assert(row.getLong(1) == base.getLong(1) + 1L)
  }

  test("streaming foreachBatch ingestion keeps the rollup consistent across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the day-2 deployment shape: the stream lands each micro-batch into
    // the stored rollup; foreachBatch gives the batch-level merge a
    // transactional boundary per epoch
    val path = java.nio.file.Files.createTempDirectory("graft-iagg-stream")
      .toString + "/rollup"
    IncrementalAgg.init(spark, path,
      Seq.empty[(String, Long)].toDF("k", "v"), "k", "v")
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val query = stream.toDS().toDF("k", "v").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        IncrementalAgg.ingest(batch.sparkSession, path, batch, "k", "v")
      }
      .start()
    try {
      stream.addData(("en", 10L), ("de", 5L), ("en", 1L))
      query.processAllAvailable()
      stream.addData(("en", 100L), ("fr", 7L))
      query.processAllAvailable()
      val got = IncrementalAgg.read(spark, path, "k")
        .select($"k", $"sum", $"cnt").as[(String, Long, Long)].collect().toSet
      assert(got == Set(("en", 111L, 3L), ("de", 5L, 1L), ("fr", 7L, 1L)), got.toString)
    } finally query.stop()
  }

  test("retract is ingest's exact inverse: ingest(A∪B) then retract(B) equals init(A)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-iagg-ret").toString
    val docs = Tables.documents(spark, dir).select($"lang", $"n_chars")
    val keep = docs.filter(hash($"n_chars") % 3 =!= 0)
    val gone = docs.exceptAll(keep)
    // path 1: full history in, then the erased slice retracted
    IncrementalAgg.init(spark, s"$base/r1", keep.unionAll(gone), "lang", "n_chars")
    IncrementalAgg.retract(spark, s"$base/r1", gone, "lang", "n_chars")
    // path 2: the erased slice never existed
    IncrementalAgg.init(spark, s"$base/r2", keep, "lang", "n_chars")
    val got = IncrementalAgg.read(spark, s"$base/r1", "lang")
      .orderBy($"lang").collect().toSeq
    val want = IncrementalAgg.read(spark, s"$base/r2", "lang")
      .orderBy($"lang").collect().toSeq
    assert(got == want, "retract did not land exactly where a clean build would")
  }

  test("retracting a key's ENTIRE history removes the key, not a phantom zero row") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-iagg-gone")
      .toString + "/rollup"
    val df = Seq(("en", 10L), ("en", 20L), ("de", 5L)).toDF("k", "v")
    IncrementalAgg.init(spark, path, df, "k", "v")
    // erase every 'en' row — a from-scratch build of the remainder has
    // no 'en' row at all, so neither may the retracted rollup (a stored
    // (en, 0, 0) would serve a null avg no clean build could produce)
    IncrementalAgg.retract(spark, path, df.filter($"k" === "en"), "k", "v")
    val got = IncrementalAgg.read(spark, path, "k")
      .select($"k", $"sum", $"cnt").as[(String, Long, Long)].collect().toSet
    assert(got == Set(("de", 5L, 1L)), got.toString)
  }

  test("property: any 3-way split of history ingests to the one-shot aggregate") {
    import spark.implicits._
    // the monoid-merge property the whole primitive rests on: batch
    // boundaries must never be observable in the final rollup
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(10),
      org.scalacheck.Prop.forAll(org.scalacheck.Gen.listOfN(60,
        org.scalacheck.Gen.zip(
          org.scalacheck.Gen.oneOf("en", "de", "es", "fr"),
          org.scalacheck.Gen.choose(-1000L, 1000L),
          org.scalacheck.Gen.choose(0, 2)))) { rows =>
        val path = java.nio.file.Files.createTempDirectory("graft-iagg-prop")
          .toString + "/rollup"
        val df = rows.toDF("k", "v", "part")
        IncrementalAgg.init(spark, path, df.filter($"part" === 0), "k", "v")
        IncrementalAgg.ingest(spark, path, df.filter($"part" === 1), "k", "v")
        IncrementalAgg.ingest(spark, path, df.filter($"part" === 2), "k", "v")
        val got = IncrementalAgg.read(spark, path, "k")
          .select($"k", $"sum", $"cnt").as[(String, Long, Long)].collect().toSet
        val want = df.groupBy($"k")
          .agg(sum($"v").cast("long").as("sum"), count($"v").as("cnt"))
          .as[(String, Long, Long)].collect().toSet
        got == want
      })
    assert(res.passed, res.status.toString)
  }
}

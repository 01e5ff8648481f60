package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCD Type 2 semantics: version chaining, idempotent-update suppression,
  * multi-update batches, point-in-time lookup, and the bucket-pruned
  * stored merge (untouched buckets byte-identical).
  */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("changed attributes version; identical updates are no-ops; batches chain") {
    import spark.implicits._
    val init = Seq(
      (1L, "gold", ts("2024-01-01 00:00:00")),
      (2L, "silver", ts("2024-01-01 00:00:00"))).toDF("cust", "segment", "ts")
    val hist0 = Scd2.merge(
      init.select($"cust", $"segment", $"ts".as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"), lit(true).as("is_current")).limit(0),
      init, "cust", "ts", Seq("segment"))

    // cust 1 changes twice IN ONE BATCH, cust 2 re-delivers its value
    val batch = Seq(
      (1L, "platinum", ts("2024-02-01 00:00:00")),
      (1L, "diamond", ts("2024-03-01 00:00:00")),
      (2L, "silver", ts("2024-02-15 00:00:00"))).toDF("cust", "segment", "ts")
    val hist1 = Scd2.merge(hist0, batch, "cust", "ts", Seq("segment"))
      .orderBy($"cust", $"valid_from")
      .select($"cust", $"segment", $"valid_from", $"valid_to", $"is_current")
      .collect()

    val c1 = hist1.filter(_.getLong(0) == 1L)
    assert(c1.map(_.getString(1)).toSeq == Seq("gold", "platinum", "diamond"))
    assert(c1(0).getTimestamp(3) == ts("2024-02-01 00:00:00"), "gold closes at v2 start")
    assert(c1(1).getTimestamp(3) == ts("2024-03-01 00:00:00"), "platinum closes at v3 start")
    assert(c1(2).isNullAt(3) && c1(2).getBoolean(4), "diamond stays open")
    // idempotent re-delivery: cust 2 keeps exactly one open version
    val c2 = hist1.filter(_.getLong(0) == 2L)
    assert(c2.length == 1 && c2(0).getString(1) == "silver" && c2(0).getBoolean(4))
  }

  test("asOf returns the prevailing version per key") {
    import spark.implicits._
    val rows = Seq(
      (1L, "gold", ts("2024-01-01 00:00:00")),
      (1L, "platinum", ts("2024-02-01 00:00:00"))).toDF("cust", "segment", "ts")
    val hist = Scd2.merge(
      rows.select($"cust", $"segment", $"ts".as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"), lit(true).as("is_current")).limit(0),
      rows, "cust", "ts", Seq("segment"))
    def at(s: String) =
      Scd2.asOf(hist, lit(ts(s))).select($"segment").as[String].collect().toSeq
    assert(at("2024-01-15 00:00:00") == Seq("gold"))
    assert(at("2024-02-01 00:00:00") == Seq("platinum"), "boundary belongs to the new version")
    assert(at("2023-12-31 00:00:00") == Seq.empty, "before first version: no row")
  }

  test("a late-arriving update (ts before the open version) fails the merge") {
    import spark.implicits._
    val rows = Seq((1L, "gold", ts("2024-02-01 00:00:00"))).toDF("cust", "segment", "ts")
    val hist = Scd2.merge(
      rows.select($"cust", $"segment", $"ts".as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"), lit(true).as("is_current")).limit(0),
      rows, "cust", "ts", Seq("segment"))
    val late = Seq((1L, "lead", ts("2024-01-01 00:00:00"))).toDF("cust", "segment", "ts")
    val ex = intercept[Exception] {
      Scd2.merge(hist, late, "cust", "ts", Seq("segment")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("late-arriving")), s"got: ${msgs(ex)}")
    // at-or-after the open version is fine (equal ts supersedes in place)
    val onTime = Seq((1L, "lead", ts("2024-02-01 00:00:00"))).toDF("cust", "segment", "ts")
    assert(Scd2.merge(hist, onTime, "cust", "ts", Seq("segment")).count() >= 1)
  }

  test("quarantining merge splits late rows to the side output and merges the rest") {
    import spark.implicits._
    // cust 1: closed gold + open platinum (from 2024-02-01); cust 2: open silver
    val init = Seq(
      (1L, "gold", ts("2024-01-01 00:00:00")),
      (2L, "silver", ts("2024-01-01 00:00:00"))).toDF("cust", "segment", "ts")
    val hist0 = Scd2.merge(
      init.select($"cust", $"segment", $"ts".as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"), lit(true).as("is_current")).limit(0),
      init, "cust", "ts", Seq("segment"))
    val hist = Scd2.merge(hist0,
      Seq((1L, "platinum", ts("2024-02-01 00:00:00"))).toDF("cust", "segment", "ts"),
      "cust", "ts", Seq("segment"))

    // batch: one LATE row for cust 1 (before the open version), one valid
    // row for cust 1, one valid row for the new key 3
    val batch = Seq(
      (1L, "lead", ts("2024-01-15 00:00:00")),
      (1L, "diamond", ts("2024-03-01 00:00:00")),
      (3L, "bronze", ts("2024-03-01 00:00:00"))).toDF("cust", "segment", "ts")
    val (merged0, quarantined0) =
      Scd2.mergeWithQuarantine(hist, batch, "cust", "ts", Seq("segment"))
    val merged = merged0.localCheckpoint(true)
    val quarantined = quarantined0.localCheckpoint(true)

    // the quarantined row round-trips with all original columns intact
    val q = quarantined.collect()
    assert(q.length == 1)
    assert(q(0).getAs[Long]("cust") == 1L && q(0).getAs[String]("segment") == "lead"
      && q(0).getAs[java.sql.Timestamp]("ts") == ts("2024-01-15 00:00:00"))
    assert(quarantined.columns.toSeq == batch.columns.toSeq,
      "quarantine output must be writable as-is to a side table")
    // ...and re-merging it through the fail-fast default still refuses
    assertThrows[Exception] {
      Scd2.merge(merged, quarantined, "cust", "ts", Seq("segment")).collect()
    }

    // the valid rows merged: cust 1 gained diamond, cust 3 appeared
    val c1 = merged.filter($"cust" === 1L).orderBy($"valid_from").collect()
    assert(c1.map(_.getAs[String]("segment")).toSeq == Seq("gold", "platinum", "diamond"))
    assert(merged.filter($"cust" === 3L).count() == 1)
    assert(merged.filter($"cust" === 2L && $"is_current").count() == 1, "untouched key intact")
    // history stays non-overlapping per key: each version closes exactly
    // where the next opens, with one open version per key
    val rows = merged.orderBy($"cust", $"valid_from").collect()
    rows.groupBy(_.getAs[Long]("cust")).foreach { case (_, vs) =>
      assert(vs.count(_.getAs[Boolean]("is_current")) == 1)
      vs.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[java.sql.Timestamp]("valid_to") ==
            b.getAs[java.sql.Timestamp]("valid_from"), "no gap/overlap")
        case _ => ()
      }
    }
  }

  test("init and merge accept a non-timestamp (epoch long) ts column") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-scd2-long").toString + "/t"
    val rows = Seq((1L, "gold", 100L), (2L, "silver", 100L)).toDF("cust", "segment", "seq")
    Scd2.init(spark, dir, rows, "cust", "seq", Seq("segment"))
    Scd2.ingest(spark, dir,
      Seq((1L, "platinum", 200L)).toDF("cust", "segment", "seq"),
      "cust", "seq", Seq("segment"))
    val t = spark.read.parquet(dir)
    assert(t.schema("valid_to").dataType == org.apache.spark.sql.types.LongType)
    val c1 = t.filter($"cust" === 1L).orderBy($"valid_from").collect()
    assert(c1.map(_.getAs[String]("segment")).toSeq == Seq("gold", "platinum"))
    assert(c1(0).getAs[Long]("valid_to") == 200L && c1(1).isNullAt(c1(1).fieldIndex("valid_to")))
  }

  test("stored ingest rewrites only the touched buckets and keeps history queryable") {
    import spark.implicits._
    val path = java.nio.file.Files.createTempDirectory("graft-scd2").toString + "/dim"
    val init = (1L to 40L).map(k => (k, s"seg$k", ts("2024-01-01 00:00:00")))
      .toDF("cust", "segment", "ts")
    Scd2.init(spark, path, init, "cust", "ts", Seq("segment"))

    def files(): Map[String, Set[(String, Long, Long)]] = {
      val root = new java.io.File(path)
      root.listFiles().filter(_.getName.startsWith("bucket=")).map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length(), f.lastModified())).toSet
      }.toMap
    }
    val before = files()
    val batch = Seq((7L, "upgraded", ts("2024-06-01 00:00:00")))
      .toDF("cust", "segment", "ts")
    Scd2.ingest(spark, path, batch, "cust", "ts", Seq("segment"))
    val after = files()
    val hot = s"bucket=${Seq(7L).toDF("cust")
      .select(pmod(hash($"cust"), lit(IncrementalAgg.NumBuckets))).head.getInt(0)}"
    assert(after(hot) != before(hot), "hot bucket must be rewritten")
    (before.keySet - hot).foreach { b =>
      assert(after(b) == before(b), s"untouched bucket $b was rewritten")
    }
    val t = spark.read.parquet(path)
    assert(t.count() == 41, "one new version row")
    val v7 = t.filter($"cust" === 7L).orderBy($"valid_from").collect()
    assert(v7.length == 2 && !v7(0).getAs[Boolean]("is_current")
      && v7(1).getAs[Boolean]("is_current"))
    assert(t.filter($"is_current").count() == 40, "one open version per key")
  }

  test("streaming foreachBatch ingestion maintains the dimension history") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the CDC deployment shape: each micro-batch of dimension updates
    // merges into the stored SCD2 table with a transactional boundary per
    // epoch — the streaming counterpart of the batch ingest test
    val path = java.nio.file.Files.createTempDirectory("graft-scd2-stream")
      .toString + "/dim"
    Scd2.init(spark, path,
      Seq((1L, "gold", ts("2024-01-01 00:00:00"))).toDF("cust", "segment", "ts"),
      "cust", "ts", Seq("segment"))
    val stream = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, java.sql.Timestamp)]
    val query = stream.toDS().toDF("cust", "segment", "ts").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Scd2.ingest(batch.sparkSession, path, batch, "cust", "ts", Seq("segment"))
      }
      .start()
    stream.addData((1L, "platinum", ts("2024-02-01 00:00:00")))
    query.processAllAvailable()
    stream.addData((1L, "platinum", ts("2024-03-01 00:00:00")), // idempotent redelivery
      (2L, "silver", ts("2024-03-01 00:00:00")))                // new key
    query.processAllAvailable()
    query.stop()
    val t = spark.read.parquet(path)
    assert(t.count() == 3, "gold->platinum versions for cust 1 + one for cust 2")
    val c1 = t.filter($"cust" === 1L).orderBy($"valid_from").collect()
    assert(c1.map(_.getAs[String]("segment")).toSeq == Seq("gold", "platinum"))
    assert(!c1(0).getAs[Boolean]("is_current") && c1(1).getAs[Boolean]("is_current"))
    assert(Scd2.asOf(t, lit(ts("2024-01-15 00:00:00")))
      .filter($"cust" === 1L).select($"segment").as[String].head() == "gold")
  }
}

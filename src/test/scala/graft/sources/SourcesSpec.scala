package graft.sources

import graft.TestSpark
import graft.ml.Pipelines
import graft.queries.MlQueries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Source-surface coverage: CSV round-trip with explicit schema (S3),
  * single-row in-memory inference frame + loaded model (S5+S6 — the
  * dashboard's on-demand prediction path, streamlit_app.py:572-615).
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("csv round-trip with explicit schema preserves rows and types") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"lang", $"n_chars")
    val path = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/docs"
    Csv.write(docs, path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = Csv.read(spark, path, schema)
    assert(back.count() == docs.count())
    assert(back.schema == schema)
    val a = docs.agg(sum($"n_chars")).head.getLong(0)
    val b = back.agg(sum($"n_chars")).head.getLong(0)
    assert(a == b)
  }

  test("binaryFile source: one row per asset, glob pruning, content round-trip") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft-bin").toString
    val payloads = Seq("a" -> "alpha bytes", "b" -> "beta bytes", "c" -> "gamma")
    payloads.foreach { case (name, body) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(root, s"$name.img"), body.getBytes("UTF-8"))
    }
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, "ignore.txt"), "not an asset".getBytes("UTF-8"))

    val assets = Binary.read(spark, root, Some("*.img"))
    assert(assets.columns.toSet ==
      Set("path", "modificationTime", "length", "content"))
    assert(assets.count() == 3, "glob must prune the .txt file before read")
    val back = assets
      .select(element_at(split($"path", "/"), -1).as("f"),
        $"length", $"content".cast("string").as("body"))
      .as[(String, Long, String)].collect().toSeq.sortBy(_._1)
    assert(back.map(_._1) == Seq("a.img", "b.img", "c.img"))
    assert(back.map(_._3) == payloads.map(_._2), "byte content must round-trip")
    assert(back.forall { case (_, len, body) => len == body.getBytes("UTF-8").length },
      "length metadata must match content size")
  }

  test("single-row in-memory frame through a persisted model (inference path)") {
    import spark.implicits._
    val feats = MlQueries.featurizedJobs(spark, dir)
      .select(($"salary_final" +: MlQueries.jobFeatureCols.map(col)): _*)
      .na.fill(0.0)
    val model = Pipelines.salaryForest(MlQueries.jobFeatureCols, 20, 6).fit(feats)
    val path = java.nio.file.Files.createTempDirectory("graft-rf").toString + "/rf"
    Pipelines.save(model, path)
    val loaded = Pipelines.load(path)
    // 16-feature single-row frame, the dashboard's on-demand shape
    val row = Seq((5.0, 1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0,
        0.0, 0.0, 1.0, 0.0, 0.0))
      .toDF(MlQueries.jobFeatureCols: _*)
    val pred = loaded.transform(row).select($"prediction").head.getDouble(0)
    assert(!pred.isNaN && pred > 0, s"prediction $pred")
  }

  test("parquet schema evolution: mergeSchema unions old and new file schemas") {
    // A 100 TB table accretes columns over years of writes; readers must
    // take the union schema and null-fill the files written before a
    // column existed (and, per partition-file pruning, only pay for the
    // columns they select).
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "a")).toDF("id", "v1").write.parquet(s"$base/d=1")
    Seq((2L, "b", 9.5)).toDF("id", "v1", "v2").write.parquet(s"$base/d=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(base)
    assert(merged.columns.toSet == Set("id", "v1", "v2", "d"))
    val rows = merged.orderBy($"id").collect()
    assert(rows(0).getAs[Any]("v2") == null, "pre-evolution file must null-fill v2")
    assert(rows(1).getAs[Double]("v2") == 9.5)
  }

  test("orc round-trip preserves rows, types, and nested arrays") {
    // format breadth: ORC is the other columnar lakehouse format Spark
    // ships natively; nested array columns must survive the round-trip
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", split(lower($"text"), "\\s+").as("toks"))
    val path = java.nio.file.Files.createTempDirectory("graft-orc").toString + "/docs"
    docs.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path)
    // ORC does not persist containsNull, so the element nullability widens
    // on read — compare names + SQL types, which is the contract that matters
    assert(back.schema.map(f => (f.name, f.dataType.sql))
      == docs.schema.map(f => (f.name, f.dataType.sql)))
    assert(back.count() == docs.count())
    val a = docs.agg(sum(size($"toks"))).head.getLong(0)
    val b = back.agg(sum(size($"toks"))).head.getLong(0)
    assert(a == b, "token counts must survive the ORC round-trip")
  }

  test("json-lines round-trip with explicit schema avoids inference scan") {
    // JSON-lines is the interchange format every training-data pipeline
    // ingests; reading with an EXPLICIT schema matters at scale (schema
    // inference is a full extra pass over 100 TB)
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"doc_id", $"lang", $"n_chars")
    val path = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/docs"
    docs.write.mode("overwrite").json(path)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("n_chars", LongType)))
    val back = spark.read.schema(schema).json(path)
    assert(back.schema == schema)
    assert(back.count() == docs.count())
    val a = docs.agg(sum($"n_chars")).head.getLong(0)
    assert(back.agg(sum($"n_chars")).head.getLong(0) == a)
    // malformed rows surface under PERMISSIVE as null-filled, not failures
    val badPath = java.nio.file.Files.createTempDirectory("graft-jsonl").toString + "/bad"
    Seq("""{"doc_id": 1, "lang": "en", "n_chars": 10}""", """not json at all""")
      .toDF("value").write.mode("overwrite").text(badPath)
    val bad = spark.read.schema(schema).json(badPath)
    assert(bad.count() == 2)
    assert(bad.filter($"doc_id".isNull).count() == 1, "malformed row null-fills")
  }

  test("events loader adapts to fixture ts encoding: micros-NTZ and nanos-long both normalize") {
    // The fixture's physical encoding of events.ts has changed once under
    // the repo (TIMESTAMP(NANOS) → TIMESTAMP(MICROS)); the loader must
    // dispatch on the scanned type and emit identical TimestampType values
    // either way. Simulate both generations: a micros file written by
    // Spark, and an epoch-nanos-long file (what a NANOS fixture scans as
    // under the legacy conf).
    import spark.implicits._
    val real = Tables.events(spark, dir)
    assert(real.schema("ts").dataType == TimestampType,
      "current fixture must normalize to TimestampType")

    val base = java.nio.file.Files.createTempDirectory("graft-events").toString
    val rows = real.limit(50).cache()
    // generation A: ts as timestamp micros (current fixture shape)
    rows.write.mode("overwrite").parquet(s"$base/micros/events.parquet")
    // generation B: ts as epoch-nanos BIGINT (legacy NANOS fixture scan shape)
    rows.withColumn("ts", unix_micros($"ts") * lit(1000L))
      .write.mode("overwrite").parquet(s"$base/nanos/events.parquet")

    val a = Tables.events(spark, s"$base/micros")
    val b = Tables.events(spark, s"$base/nanos")
    assert(a.schema("ts").dataType == TimestampType)
    assert(b.schema("ts").dataType == TimestampType)
    val ka = a.select($"event_id", $"ts").as[(Long, java.sql.Timestamp)]
      .collect().sortBy(_._1).toSeq
    val kb = b.select($"event_id", $"ts").as[(Long, java.sql.Timestamp)]
      .collect().sortBy(_._1).toSeq
    assert(ka == kb, "both encodings must yield identical instants")
    rows.unpersist()
  }

  test("assertSchema names every drifted column instead of failing downstream") {
    import spark.implicits._
    // green on the real fixture for all tables
    Tables.names.foreach { n =>
      val df = if (n == "events") Tables.events(spark, dir) else Tables.load(spark, dir, n)
      Tables.assertSchema(n, df)
    }
    // a drifted frame fails with BOTH offending columns named
    val drifted = Seq(("x", 1)).toDF("doc_id", "n_chars")
    val e = intercept[IllegalArgumentException] {
      Tables.assertSchema("documents", drifted)
    }
    assert(e.getMessage.contains("documents.doc_id"))
    assert(e.getMessage.contains("documents.text: MISSING"))
  }

  test("file-metadata columns: _metadata.file_name and input_file_name resolve per row") {
    // lakehouse lineage surface: every row knows its source file — the
    // hook audit/backfill tooling keys on (constant per scan task, no cost)
    import spark.implicits._
    val li = Tables.lineitem(spark, dir)
      .select($"l_orderkey", col("_metadata.file_name").as("fname"),
        input_file_name().as("fpath"))
      .limit(5).collect()
    assert(li.nonEmpty)
    li.foreach { r =>
      assert(r.getAs[String]("fname") == "lineitem.parquet")
      assert(r.getAs[String]("fpath").endsWith("lineitem.parquet"))
    }
  }
}

package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PartitionedLayout.upsert: key-level merge into a partitioned parquet
  * table must (1) replace superseded keys, (2) insert new keys — including
  * into brand-new partitions, (3) leave every unaffected partition's FILES
  * byte-identical (the partition-pruned rewrite is the whole point: at
  * 100 TB "upsert" that rewrites the table is a non-starter).
  */
class UpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def listFiles(p: String): Map[String, (Long, Long)] = {
    val d = new java.io.File(p)
    require(d.isDirectory, s"missing partition dir $p")
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  test("upsert rewrites only affected partitions; updates, inserts, new partitions land") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/docs"
    val docs = Tables.documents(spark, dir)
    PartitionedLayout.write(docs, base, "lang")

    val langs = docs.select($"lang").distinct().as[String].collect().sorted
    assert(langs.length >= 2, "fixture needs two langs")
    val (langUpd, langKeep) = (langs.head, langs.last)
    val keepFilesBefore = listFiles(s"$base/lang=$langKeep")
    val keepSumBefore = PartitionedLayout.read(spark, base)
      .filter($"lang" === langKeep).agg(sum($"n_chars")).head.getLong(0)

    val targets = docs.filter($"lang" === langUpd)
      .orderBy($"doc_id").limit(2).select($"doc_id").as[Long].collect()
    val maxId = docs.agg(max($"doc_id")).head.getLong(0)
    val nBefore = PartitionedLayout.read(spark, base).count()

    // 2 in-place updates + 1 insert into an existing partition + 1 insert
    // creating a brand-new partition
    val updates = Seq(
      (targets(0), s"updated body ${targets(0)}", langUpd, "upsert-src", -1L),
      (targets(1), s"updated body ${targets(1)}", langUpd, "upsert-src", -1L),
      (maxId + 1, "fresh document", langUpd, "upsert-src", -2L),
      (maxId + 2, "new partition document", "zz", "upsert-src", -3L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")

    PartitionedLayout.upsert(spark, base, updates, "doc_id", "lang")

    val after = PartitionedLayout.read(spark, base)
    assert(after.count() == nBefore + 2, "2 inserts expected")
    val updated = after.filter($"doc_id".isin(targets.map(Long.box): _*))
      .select($"n_chars").as[Long].collect().toSet
    assert(updated == Set(-1L), s"superseded keys must be replaced: $updated")
    assert(after.filter($"lang" === "zz").count() == 1, "new partition row")
    // the unaffected partition: same files, same sizes, same mtimes
    assert(listFiles(s"$base/lang=$langKeep") == keepFilesBefore,
      "unaffected partition was rewritten")
    val keepSumAfter = after.filter($"lang" === langKeep)
      .agg(sum($"n_chars")).head.getLong(0)
    assert(keepSumAfter == keepSumBefore)
  }

  test("upsert relocates a row whose partition value changes — no stale duplicate") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/docs"
    val docs = Tables.documents(spark, dir)
    PartitionedLayout.write(docs, base, "lang")
    val nBefore = PartitionedLayout.read(spark, base).count()

    // relabel one existing doc into a different (new) partition: the OLD
    // partition holds the stale row and is NOT named by the update's
    // partition value — exactly the case that duplicates if affected
    // partitions are derived from update rows alone
    val moved = docs.orderBy($"doc_id").limit(1)
      .select($"doc_id", $"text", $"source", $"n_chars").as[(Long, String, String, Long)]
      .head()
    val updates = Seq((moved._1, moved._2, "zz", moved._3, moved._4))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    PartitionedLayout.upsert(spark, base, updates, "doc_id", "lang")

    val after = PartitionedLayout.read(spark, base)
    assert(after.count() == nBefore, "relabel must not change row count")
    val rows = after.filter($"doc_id" === moved._1)
      .select($"lang").as[String].collect()
    assert(rows.toSeq == Seq("zz"),
      s"moved key must exist exactly once in the new partition: ${rows.toSeq}")
  }

  test("upsert deletes a fully-drained partition — sole row relocated, no stale duplicate") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/t"
    val rows = Seq((1L, "a", "en"), (2L, "b", "en"), (3L, "c", "fr"))
      .toDF("id", "v", "lang")
    PartitionedLayout.write(rows, base, "lang")

    // relabel the SOLE row of lang=fr into lang=en: the merged slice then
    // contains zero fr rows, so dynamic overwrite alone would leave the
    // old fr directory (and its stale row) behind as a duplicate
    val updates = Seq((3L, "c-moved", "en")).toDF("id", "v", "lang")
    PartitionedLayout.upsert(spark, base, updates, "id", "lang")

    val after = PartitionedLayout.read(spark, base)
    assert(after.count() == 3, "relabel must not change row count")
    assert(after.filter($"lang" === "fr").count() == 0, "drained partition must be empty")
    assert(!new java.io.File(s"$base/lang=fr").exists(),
      "drained partition directory must be deleted")
    val moved = after.filter($"id" === 3L).select($"v", $"lang").as[(String, String)].collect()
    assert(moved.toSeq == Seq(("c-moved", "en")))
  }

  test("upsert into the null partition preserves its untouched sibling rows") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/t"
    val rows = Seq((1L, "a", "en"), (2L, "b", null), (3L, "c", null))
      .toDF("id", "v", "lang")
    PartitionedLayout.write(rows, base, "lang")

    // null-UNSAFE partition joins would exclude the null partition from
    // `current`, so the dynamic overwrite would rewrite
    // __HIVE_DEFAULT_PARTITION__ with ONLY the update row — losing id=3
    val updates = Seq((2L, "b2", null)).toDF("id", "v", "lang")
    PartitionedLayout.upsert(spark, base, updates, "id", "lang")

    val after = PartitionedLayout.read(spark, base)
    assert(after.count() == 3, "untouched null-partition sibling must survive")
    assert(after.filter($"id" === 2L).select($"v").as[String].head() == "b2")
    assert(after.filter($"id" === 3L).count() == 1, "sibling row id=3 was lost")
  }

  test("upsert drains the null partition — directory deleted, row relocated once") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-upsert").toString + "/t"
    val rows = Seq((1L, "a", "en"), (2L, "b", null)).toDF("id", "v", "lang")
    PartitionedLayout.write(rows, base, "lang")

    val updates = Seq((2L, "b-moved", "en")).toDF("id", "v", "lang")
    PartitionedLayout.upsert(spark, base, updates, "id", "lang")

    val after = PartitionedLayout.read(spark, base)
    assert(after.count() == 2)
    assert(after.filter($"lang".isNull).count() == 0, "null partition must be drained")
    assert(!new java.io.File(s"$base/lang=__HIVE_DEFAULT_PARTITION__").exists(),
      "drained null-partition directory must be deleted")
    assert(after.filter($"id" === 2L).select($"lang").as[String].collect().toSeq == Seq("en"))
  }

  test("vacuum removes crashed-job staging debris, never data") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-vac").toString + "/t"
    val rows = Seq((1L, "a", "en"), (2L, "b", "fr")).toDF("id", "v", "lang")
    PartitionedLayout.write(rows, base, "lang")

    // simulate a job that died mid-upsert: a stranded staging sibling and
    // a _temporary attempt dir inside the table
    val staging = new java.io.File(base + "__staging")
    staging.mkdirs()
    java.nio.file.Files.write(staging.toPath.resolve("part-crashed.parquet"),
      Array[Byte](1, 2, 3))
    new java.io.File(base, "_temporary/0").mkdirs()

    val deleted = PartitionedLayout.vacuum(spark, base)
    assert(deleted.size == 2, s"expected staging + _temporary, got $deleted")
    assert(!staging.exists(), "staging sibling must be deleted")
    assert(!new java.io.File(base, "_temporary").exists())
    val after = PartitionedLayout.read(spark, base)
    assert(after.count() == 2, "vacuum must not touch data")
    assert(PartitionedLayout.vacuum(spark, base).isEmpty, "idempotent on clean table")
  }
}

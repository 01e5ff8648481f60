package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot tables: atomic overwrite semantics, time travel, reader
  * isolation from later commits, rollback by re-commit, and vacuum
  * reclaiming exactly the unreferenced files.
  */
class SnapshotsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def tbl() =
    java.nio.file.Files.createTempDirectory("graft-snap").toString + "/t"

  test("overwrite commits version; every retained version time-travels") {
    import spark.implicits._
    val path = tbl()
    assert(Snapshots.versions(spark, path).isEmpty)
    val v1 = Snapshots.commit(spark, path, Seq(1, 2, 3).toDF("x"))
    val v2 = Snapshots.commit(spark, path, Seq(10, 20).toDF("x"))
    assert((v1, v2) == (1L, 2L))
    assert(Snapshots.read(spark, path).as[Int].collect().sorted.toSeq == Seq(10, 20))
    assert(Snapshots.read(spark, path, v1).as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
    assert(Snapshots.versions(spark, path) == Seq(1L, 2L))
  }

  test("a reader's resolved plan survives a concurrent commit (immutable files)") {
    import spark.implicits._
    val path = tbl()
    Snapshots.commit(spark, path, Seq("a", "b").toDF("s"))
    val readerOfV1 = Snapshots.read(spark, path, 1L)
    Snapshots.commit(spark, path, Seq("zzz").toDF("s"))
    // v1's files are still on disk and still referenced by its manifest
    assert(readerOfV1.as[String].collect().sorted.toSeq == Seq("a", "b"))
  }

  test("rollback = committing an old snapshot's content as the new head") {
    import spark.implicits._
    val path = tbl()
    Snapshots.commit(spark, path, Seq(1).toDF("x"))
    Snapshots.commit(spark, path, Seq(2).toDF("x"))
    val rolledBack = Snapshots.commit(spark, path, Snapshots.read(spark, path, 1L))
    assert(rolledBack == 3L)
    assert(Snapshots.read(spark, path).as[Int].head() == 1)
  }

  test("vacuum keeps the retained versions readable and deletes the rest") {
    import spark.implicits._
    val path = tbl()
    (1 to 4).foreach(i => Snapshots.commit(spark, path, Seq(i).toDF("x")))
    val deleted = Snapshots.vacuum(spark, path, keep = 2)
    assert(deleted.nonEmpty, "v1/v2 data files must be reclaimed")
    assert(Snapshots.versions(spark, path) == Seq(3L, 4L))
    assert(Snapshots.read(spark, path, 3L).as[Int].head() == 3)
    assert(Snapshots.read(spark, path, 4L).as[Int].head() == 4)
    intercept[IllegalArgumentException](Snapshots.read(spark, path, 1L))
    // deleted paths are gone from disk
    val root = new java.io.File(path)
    deleted.foreach(rel => assert(!new java.io.File(root, rel).exists()))
  }

  test("erase purges a key from EVERY retained version; clean files byte-identical, victim bytes gone") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = tbl()
    // v1: full table including the victim, spread over several files
    val a = (1 to 12).map(i => (i, s"row$i")).toDF("k", "s").repartition(4)
    val v1 = Snapshots.commit(spark, path, a)
    // v2: an appended batch that mentions the victim again, sharing v1's
    // files (the append shape — erase must chase the key through BOTH)
    val b = Seq((4, "victim-again"), (20, "row20")).toDF("k", "s")
    val vb = Snapshots.commit(spark, path, b)
    val v3 = Snapshots.commitStaged(spark, path,
      Snapshots.manifest(spark, path, v1) ++ Snapshots.manifest(spark, path, vb))
    def md5s(): Map[String, String] =
      Snapshots.versions(spark, path)
        .flatMap(v => Snapshots.manifest(spark, path, v)).distinct.map { rel =>
          val bytes = java.nio.file.Files.readAllBytes(
            java.nio.file.Paths.get(path, rel))
          rel -> java.security.MessageDigest.getInstance("MD5").digest(bytes)
            .map("%02x".format(_)).mkString
        }.toMap
    val before = md5s()
    val preByVersion = Snapshots.versions(spark, path).map(v =>
      v -> Snapshots.read(spark, path, v).filter(col("k") =!= 4)
        .as[(Int, String)].collect().toSet).toMap

    val report = Snapshots.erase(spark, path, col("k") === 4)

    assert(report.rewritten.nonEmpty && report.versionsTouched.nonEmpty)
    // every retained version is still readable, victim-free, and
    // otherwise row-identical to its pre-erase content
    Snapshots.versions(spark, path).foreach { v =>
      val rows = Snapshots.read(spark, path, v).as[(Int, String)].collect().toSet
      assert(!rows.exists(_._1 == 4), s"v$v still serves the erased key")
      assert(rows == preByVersion(v), s"v$v lost or mutated non-victim rows")
    }
    assert(Snapshots.versions(spark, path) == Seq(v1, vb, v3),
      "erase must preserve version numbers — it rewrites history, not heads")
    // contaminated bytes are physically gone
    report.deletedFiles.foreach(rel =>
      assert(!new java.io.File(new java.io.File(path), rel).exists(),
        s"victim bytes survive at $rel"))
    // files that never held a victim row are byte-identical
    val after = md5s()
    before.keys.filterNot(report.rewritten.contains).foreach { rel =>
      assert(after.get(rel).contains(before(rel)),
        s"clean file $rel was rewritten")
    }
    // an erase with no victims anywhere is a no-op
    val noop = Snapshots.erase(spark, path, col("k") === 999999)
    assert(noop.rewritten.isEmpty && noop.deletedFiles.isEmpty)
  }

  test("erase under a nullable predicate column: NULL-predicate rows are kept, not silently purged") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = tbl()
    // email is nullable; rows with NULL email make the erase predicate
    // evaluate to NULL — three-valued logic must treat that as
    // "not a victim" (r11 ADVICE: plain !predicate drops them)
    val rows = Seq(
      (1, Option("keep@a")), (2, Option("victim@x")),
      (3, None: Option[String]), (4, Option("keep@b")),
      (5, None: Option[String]))
    Snapshots.commit(spark, path, rows.toDF("k", "email").repartition(1))
    val report = Snapshots.erase(spark, path, col("email") === "victim@x")
    assert(report.rewritten.nonEmpty)
    val got = Snapshots.read(spark, path)
      .as[(Int, Option[String])].collect().toSet
    assert(got == rows.filterNot(_._1 == 2).toSet,
      "rows with NULL predicate columns must survive the rewrite exactly " +
        "like they survive in clean files")
  }

  test("erase composes with vacuum: retention keeps working and reclaims the purged rewrites") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val path = tbl()
    (1 to 3).foreach(i =>
      Snapshots.commit(spark, path,
        (1 to 6).map(k => (k, s"v$i-r$k")).toDF("k", "s").repartition(2)))
    Snapshots.erase(spark, path, col("k") === 3)
    // vacuum after erase: only the newest version survives, still
    // victim-free, and the dropped versions' REWRITTEN files are
    // reclaimed like any other dead file
    val deleted = Snapshots.vacuum(spark, path, keep = 1)
    assert(deleted.nonEmpty)
    assert(Snapshots.versions(spark, path) == Seq(3L))
    val rows = Snapshots.read(spark, path).as[(Int, String)].collect().toSet
    assert(!rows.exists(_._1 == 3) && rows.map(_._1) == Set(1, 2, 4, 5, 6))
    deleted.foreach(rel =>
      assert(!new java.io.File(new java.io.File(path), rel).exists()))
    // and erase still works on the post-vacuum table
    Snapshots.erase(spark, path, col("k") === 5)
    assert(!Snapshots.read(spark, path).as[(Int, String)].collect()
      .exists(_._1 == 5))
  }

  test("CAS commit: a deterministically-injected racer forces retry, no lost manifest") {
    import spark.implicits._
    val path = tbl()
    Snapshots.commit(spark, path, Seq(0).toDF("x"))
    // inside the loser's publish window, a competing committer lands v2
    var raced = false
    val won = Snapshots.commit(spark, path, Seq(99).toDF("x"),
      beforePublish = { next =>
        if (next == 2L && !raced) {
          raced = true
          assert(Snapshots.commit(spark, path, Seq(42).toDF("x")) == 2L)
        }
      })
    assert(won == 3L, "loser must re-read the head and take the next slot")
    assert(Snapshots.versions(spark, path) == Seq(1L, 2L, 3L))
    assert(Snapshots.read(spark, path, 2L).as[Int].head() == 42)
    assert(Snapshots.read(spark, path, 3L).as[Int].head() == 99)
  }

  test("CAS commit: concurrent threads produce distinct consecutive versions") {
    import spark.implicits._
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val path = tbl()
    val payloads = (1 to 8).toList
    val futures = payloads.map(i => Future {
      i -> Snapshots.commit(spark, path, Seq(i).toDF("x"))
    })
    val got = Await.result(Future.sequence(futures), 120.seconds).toMap
    assert(got.values.toSeq.sorted == (1L to 8L), s"versions must be 1..8, got $got")
    assert(Snapshots.versions(spark, path) == (1L to 8L))
    // every committed payload is readable at exactly its won version
    payloads.foreach { i =>
      assert(Snapshots.read(spark, path, got(i)).as[Int].head() == i)
    }
  }

  test("manifest mechanics stay bounded at 10k data files and 40 retained versions") {
    import spark.implicits._
    val path = tbl()
    Snapshots.commit(spark, path, Seq(1, 2, 3).toDF("x"))
    // stage 10k data files as hard links of one real parquet part file
    // (link(2) is instant; what matters is the MANIFEST carrying 10k
    // entries, not the bytes behind them)
    val root = java.nio.file.Paths.get(path)
    val part = java.nio.file.Files.walk(root.resolve("data"))
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .findFirst().get()
    val bulk = root.resolve("data/bulk")
    java.nio.file.Files.createDirectories(bulk)
    val rels = (0 until 10000).map { i =>
      val rel = f"data/bulk/f$i%05d.parquet"
      java.nio.file.Files.createLink(root.resolve(rel), part)
      rel
    }
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f; (r, (System.nanoTime() - t0) / 1e9)
    }
    // commit cost: a 10k-line manifest is ~500 KB — one small file write
    // plus the CAS; this is the bound that holds at 100 TB (manifest
    // size scales with file count, never data size)
    val (v2, tCommit) = timed(Snapshots.commitStaged(spark, path, rels))
    val (files, tParse) = timed(Snapshots.manifest(spark, path, v2))
    assert(files.size == 10000)
    // head-read cost: open+parse only; the subsequent scan cost is a
    // property of file count/layout, not of the snapshot layer
    // pile up 40 more versions referencing the same 10k files, then
    // vacuum: reads every retained manifest (400k lines) and must delete
    // exactly the files the surviving head no longer references
    (1 to 40).foreach(_ => Snapshots.commitStaged(spark, path, rels))
    val (_, tCommitDeep) = timed(Snapshots.commitStaged(spark, path, rels.take(5000)))
    val v1Files = Snapshots.manifest(spark, path, 1L)
    val rowsPerPart = spark.read.parquet(part.toString).count()
    val (dead, tVacuum) = timed(Snapshots.vacuum(spark, path, keep = 1))
    assert(dead.size == 5000 + v1Files.size,
      "exactly the 5k dropped links plus v1's own part files")
    assert(Snapshots.read(spark, path).count() == 5000L * rowsPerPart)
    info(f"commit(10k files) ${tCommit}%.2f s; manifest parse ${tParse}%.3f s; " +
      f"commit at depth 42 ${tCommitDeep}%.2f s; vacuum(42 versions) ${tVacuum}%.2f s")
    // generous CI bounds — each of these is O(manifest bytes), and a
    // regression to O(data) or O(versions × files) would blow them
    assert(tCommit < 5 && tParse < 2 && tCommitDeep < 5 && tVacuum < 30)
  }

  test("an aborted commit leaves no orphaned data files") {
    import spark.implicits._
    val path = tbl()
    Snapshots.commit(spark, path, Seq(1).toDF("x"))
    // force every publish attempt to lose: the hook lands a competing
    // commit for whatever version the victim is about to take
    val ex = intercept[java.util.ConcurrentModificationException] {
      Snapshots.commit(spark, path, Seq(99).toDF("x"),
        beforePublish = { next =>
          Snapshots.commit(spark, path, Seq(-next.toInt).toDF("x")): Unit
        })
    }
    assert(ex.getMessage.contains("lost the version race"))
    // every data dir on disk is referenced by some manifest — the
    // aborted writer's uuid dir was cleaned up
    val dataRoot = new java.io.File(path, "data")
    val onDisk = Option(dataRoot.listFiles()).getOrElse(Array.empty).map(_.getName).toSet
    val referenced = Snapshots.versions(spark, path).flatMap { v =>
      Snapshots.read(spark, path, v).inputFiles.map(f =>
        new java.io.File(f).getParentFile.getName)
    }.toSet
    assert(onDisk == referenced, s"orphans: ${onDisk -- referenced}")
  }

  test("streaming publication: each micro-batch lands as one atomic version") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // the CDC/ingest deployment: foreachBatch gives the commit a
    // transactional boundary per epoch, so downstream readers only ever
    // observe whole micro-batches — never a partially-written one
    val path = tbl()
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Int]
    val q = stream.toDS().toDF("x").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Snapshots.commit(batch.sparkSession, path, batch): Unit
      }
      .start()
    stream.addData(1, 2)
    q.processAllAvailable()
    stream.addData(3)
    q.processAllAvailable()
    q.stop()
    assert(Snapshots.versions(spark, path) == Seq(1L, 2L))
    assert(Snapshots.read(spark, path, 1L).as[Int].collect().sorted.toSeq == Seq(1, 2))
    assert(Snapshots.read(spark, path, 2L).as[Int].collect().toSeq == Seq(3))
  }
}

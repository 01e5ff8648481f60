package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PartitionedLayout.delete: targeted key erasure must (1) remove
  * exactly the requested keys, (2) remove a partition whose every row
  * is erased, (3) leave every partition holding no erased key with its
  * FILES byte-identical, and (4) be a no-op for keys the table never
  * held — the GDPR cost bound at 100 TB is "rewrite only where the
  * keys live". */
class DeleteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def listFiles(p: String): Map[String, (Long, Long)] = {
    val d = new java.io.File(p)
    require(d.isDirectory, s"missing partition dir $p")
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => f.getName -> (f.length(), f.lastModified())).toMap
  }

  test("delete erases only the requested keys; untouched partitions keep their files") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-del").toString + "/docs"
    val docs = Tables.documents(spark, dir)
    PartitionedLayout.write(docs, base, "lang")
    val langs = docs.select($"lang").distinct().as[String].collect().sorted
    val (langHit, langKeep) = (langs.head, langs.last)
    val keepFilesBefore = listFiles(s"$base/lang=$langKeep")
    val nBefore = PartitionedLayout.read(spark, base).count()
    // erase 3 keys from ONE partition only
    val victims = docs.filter($"lang" === langHit)
      .orderBy($"doc_id").limit(3).select($"doc_id")
    val victimIds = victims.as[Long].collect().toSet
    PartitionedLayout.delete(spark, base, victims, "doc_id", "lang")
    val after = PartitionedLayout.read(spark, base)
    assert(after.count() == nBefore - 3)
    assert(after.filter($"doc_id".isin(victimIds.map(Long.box).toSeq: _*)).count() == 0,
      "an erased key survived")
    assert(listFiles(s"$base/lang=$langKeep") == keepFilesBefore,
      "a partition holding no erased key was rewritten")
  }

  test("erasing a partition's every row removes its directory; unknown keys are a no-op") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-del2").toString + "/docs"
    val docs = Tables.documents(spark, dir)
    PartitionedLayout.write(docs, base, "lang")
    val langs = docs.select($"lang").distinct().as[String].collect().sorted
    val langGone = langs.head
    val nGone = docs.filter($"lang" === langGone).count()
    PartitionedLayout.delete(spark, base,
      docs.filter($"lang" === langGone).select($"doc_id"), "doc_id", "lang")
    assert(!new java.io.File(s"$base/lang=$langGone").exists(),
      "a fully-erased partition's directory must be removed")
    val after = PartitionedLayout.read(spark, base)
    assert(after.count() == docs.count() - nGone)
    // keys the table never held: nothing changes, no partitions rewritten
    val filesBefore = langs.tail.map(l => l -> listFiles(s"$base/lang=$l")).toMap
    PartitionedLayout.delete(spark, base,
      Seq(-1L, -2L).toDF("doc_id"), "doc_id", "lang")
    assert(PartitionedLayout.read(spark, base).count() == docs.count() - nGone)
    langs.tail.foreach { l =>
      assert(listFiles(s"$base/lang=$l") == filesBefore(l),
        s"no-op delete rewrote lang=$l")
    }
  }
}

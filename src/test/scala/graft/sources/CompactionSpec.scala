package graft.sources

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PartitionedLayout.compact: fragmented partitions are rewritten to the
  * justified file count with rows preserved exactly; healthy partitions
  * are not selected (second pass is a no-op) — maintenance must never
  * churn partitions that don't need it.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def parquetCount(p: String): Int = {
    val d = new java.io.File(p)
    d.listFiles().count(_.getName.endsWith(".parquet"))
  }

  test("fragmented partitions compact to justified file counts; healthy ones are left alone") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/docs"
    val docs = Tables.documents(spark, dir)
    // fragment: 12 round-robin partitions, each writing a sliver into every
    // lang directory — the post-ingest small-file state
    docs.repartition(12).write.partitionBy("lang").parquet(base)
    val langs = docs.select($"lang").distinct().as[String].collect()
    val before = langs.map(l => l -> parquetCount(s"$base/lang=$l")).toMap
    assert(before.values.forall(_ >= 10), s"fixture not fragmented: $before")
    val nRows = spark.read.parquet(base).count()
    val checksum = spark.read.parquet(base).agg(sum($"doc_id" * $"n_chars")).head.getLong(0)

    val rewritten = PartitionedLayout.compact(spark, base, "lang",
      targetBytes = 512L * 1024 * 1024)
    assert(rewritten.toSet == langs.map(l => s"lang=$l").toSet,
      s"all fragmented partitions should compact: $rewritten")
    langs.foreach { l =>
      assert(parquetCount(s"$base/lang=$l") == 1,
        s"lang=$l should compact to one file")
    }
    // layout-only: same rows, same contents
    assert(spark.read.parquet(base).count() == nRows)
    assert(spark.read.parquet(base).agg(sum($"doc_id" * $"n_chars")).head.getLong(0)
      == checksum)

    // second pass: everything is healthy now — nothing selected, no churn
    val again = PartitionedLayout.compact(spark, base, "lang",
      targetBytes = 512L * 1024 * 1024)
    assert(again.isEmpty, s"healthy partitions re-compacted: $again")
  }

  test("partitions whose values need Hive escaping compact too (path-based read)") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    // 'en:US' writes to directory lang=en%3AUS — value-parsing approaches
    // that filter col === dirName.stripPrefix silently no-op on it
    val df = (1 to 40).map(i => (i.toLong, if (i % 2 == 0) "en:US" else "plain"))
      .toDF("id", "lang")
    df.repartition(8).write.partitionBy("lang").parquet(base)
    assert(parquetCount(s"$base/lang=en%3AUS") >= 4, "fixture not fragmented")
    val rewritten = PartitionedLayout.compact(spark, base, "lang",
      targetBytes = 512L * 1024 * 1024, slackFiles = 0)
    assert(rewritten.contains("lang=en%3AUS"), s"escaped partition skipped: $rewritten")
    assert(parquetCount(s"$base/lang=en%3AUS") == 1, "escaped partition not compacted")
    val back = spark.read.parquet(base)
    assert(back.count() == 40)
    assert(back.filter($"lang" === "en:US").count() == 20,
      "escaped partition value must round-trip")
  }
}

package graft.dedup

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SimHash must separate near-duplicates (small Hamming distance) from
  * unrelated documents (≈ Bits/2 distance). */
class SimHashSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("near-dups land close in Hamming space, unrelated docs far") {
    import spark.implicits._
    val originals = Tables.documents(spark, dir)
      .filter($"doc_id" < 40).select($"doc_id", $"text")
    val nearDups = originals.select(($"doc_id" + 10000).as("doc_id"),
      array_join(slice(split($"text", " "), 4, 100000), " ").as("text"))
    val fp = SimHash.fingerprints(originals.union(nearDups))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(fp(a) ^ fp(b))

    val nearDists = (0L until 40L).map(id => ham(id, id + 10000))
    val median = nearDists.sorted.apply(20)
    assert(median <= 6, s"median near-dup hamming $median too high ($nearDists)")

    // unrelated pairs: average distance near Bits/2 (random fingerprints)
    val unrelated = for (a <- 0L until 20L; b <- 20L until 40L) yield ham(a, b)
    val avg = unrelated.sum.toDouble / unrelated.size
    assert(avg > 8, f"unrelated docs too close on average: $avg%.1f bits")
    assert(avg > 2 * median, "no separation between near-dups and unrelated docs")
  }
}

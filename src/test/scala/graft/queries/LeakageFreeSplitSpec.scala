package graft.queries

import graft.TestSpark
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The pq04 oracle proves cross-engine agreement; this spec proves the
  * PROPERTY — planted near-duplicates (and transitive chains of them)
  * always land in the same split, under every split assignment the
  * md5 thresholds can produce. */
class LeakageFreeSplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("near-dup pairs and chains share a cluster label; splits follow labels") {
    import spark.implicits._
    val originals = Tables.documents(spark, dir)
      .filter($"doc_id" < 30)
      .select($"doc_id", $"text")
    // chain per original: exact copy (+10000) and head-trimmed near-dup
    // (+20000) — original~copy and original~trimmed edges make a
    // 3-element transitive cluster even if copy~trimmed never pairs
    val copies = originals
      .select(($"doc_id" + 10000).as("doc_id"), $"text")
    val trimmed = originals
      .select(($"doc_id" + 20000).as("doc_id"),
        array_join(slice(split($"text", " "), 3, 100000), " ").as("text"))
    val corpus = originals.union(copies).union(trimmed)

    val labels = DedupQueries.dupClusterLabels(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    (0L until 30L).foreach { id =>
      assert(labels(id + 10000) == labels(id),
        s"exact copy of $id split from its original")
      assert(labels(id + 20000) == labels(id),
        s"near-dup of $id split from its original")
      // min-label convention: the cluster is named by its smallest member
      assert(labels(id) <= id)
    }

    // split assignment is a pure function of the label, so equal labels
    // can never cross splits; assert it end-to-end anyway on the real
    // threshold expression
    val h = substring(md5($"label".cast("string")), 1, 4)
    val splits = corpus.select($"doc_id")
      .join(DedupQueries.dupClusterLabels(corpus), Seq("doc_id"))
      .withColumn("split",
        when(h < "cccc", "train").when(h < "e666", "val").otherwise("test"))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    (0L until 30L).foreach { id =>
      assert(splits(id + 10000) == splits(id) && splits(id + 20000) == splits(id),
        s"cluster of $id straddles splits")
    }
    // all three splits are actually exercised by the fixture
    assert(splits.values.toSet.size >= 2, "degenerate split assignment")
  }
}

package graft.similarity

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The fresh-sampled scale corpus (r16 verdict #1): family-free draws
  * from the base generator's fitted mixture. The contracts that make
  * the probe battery's numbers trustworthy: determinism (same (n,
  * salt) → bit-identical corpus), prefix stability (the x10 corpus's
  * first n rows ARE the x1 corpus), uniqueness (no two draws collide —
  * the degeneracy both prior replica schemes had to fight), schema
  * compatibility, and structure fidelity (per-label means land near
  * the base's — the mixture is the generator's, not noise). */
class FreshEmbeddingsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def base = graft.sources.Tables
    .load(spark, "/root/testdata/sf0.001", "embeddings")

  test("deterministic, prefix-stable, unique, schema-compatible") {
    import spark.implicits._
    val a = FreshEmbeddings.sample(spark, base, 500).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    val b = FreshEmbeddings.sample(spark, base, 500).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    assert(a.sortBy(_._1).sameElements(b.sortBy(_._1)),
      "same (n, salt) did not reproduce the corpus")
    // prefix stability: the 500-row corpus is the 1000-row corpus's head
    val big = FreshEmbeddings.sample(spark, base, 1000)
      .filter($"vec_id" < 500).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
    assert(a.sortBy(_._1).sameElements(big.sortBy(_._1)),
      "corpus is not prefix-stable across sizes")
    // uniqueness: 500 draws, 500 distinct vectors (the replica
    // degeneracy cannot reappear)
    assert(a.map(_._2).distinct.length == 500)
    // a different salt is a different corpus
    val c = FreshEmbeddings.sample(spark, base, 500, salt = 7L).collect()
    assert(!a.sortBy(_._1).map(_._2)
      .sameElements(c.sortBy(r => r.getLong(0)).map(_.getSeq[Float](1))))
    // schema: same column names and types as the base table
    assert(FreshEmbeddings.sample(spark, base, 10).schema.map(f =>
      (f.name, f.dataType)) == base.schema.map(f => (f.name, f.dataType)))
  }

  test("structure fidelity: label weights and per-label means track the base") {
    import spark.implicits._
    val n = 4000L
    val fresh = FreshEmbeddings.sample(spark, base, n).cache()
    val baseW = base.groupBy($"label").count().as[(Int, Long)]
      .collect().toMap
    val freshW = fresh.groupBy($"label").count().as[(Int, Long)]
      .collect().toMap
    val nBase = baseW.values.sum.toDouble
    assert(freshW.keySet == baseW.keySet, "a mixture component vanished")
    for ((l, c) <- freshW) {
      val expect = baseW(l) / nBase
      val got = c / n.toDouble
      assert(math.abs(got - expect) < 0.05,
        s"label $l weight $got vs base $expect")
    }
    // per-label mean of dimension 0 within a few std-errors of the base
    def mean0(df: org.apache.spark.sql.DataFrame) = df
      .select($"label", element_at($"embedding", 1).cast("double").as("x"))
      .groupBy($"label").agg(avg($"x")).as[(Int, Double)].collect().toMap
    val bm = mean0(base); val fm = mean0(fresh)
    for ((l, m) <- fm)
      assert(math.abs(m - bm(l)) < 0.25,
        s"label $l dim-0 mean drifted: fresh $m vs base ${bm(l)}")
    fresh.unpersist()
  }
}

package graft.dedup

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** dq16's multiplicity-expansion algebra against an independent brute
  * force: on seeded random corpora salted with exact clones, the
  * collapsed class-pair computation must produce exactly the counts a
  * naive all-docs pair scan does. The fixture oracle pins ONE corpus;
  * this pins the algebra across many, including the clone-heavy shapes
  * the collapse exists for. */
class ContainmentSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Naive reference: per-doc shingle sets, all pairs, exact measures. */
  private def bruteForce(docs: Seq[(Long, String)]): (Long, Long, Long, Long, Long) = {
    def shingles(text: String): Set[String] = {
      val w = text.toLowerCase.split("\\s+").toSeq
      if (w.length < 3) Set.empty
      else w.sliding(3).map(_.mkString(" ")).toSet
    }
    val uni = docs ++ docs.collect {
      case (id, text) if id % 5 == 0 && text.toLowerCase.split("\\s+").length >= 18 =>
        (id + 200000L, text.toLowerCase.split("\\s+").take(18).mkString(" "))
    }
    val sh = uni.map { case (id, t) => (id, shingles(t)) }
      .filter(_._2.nonEmpty)
    val pairs = for {
      i <- sh.indices; j <- (i + 1) until sh.length
      a = if (sh(i)._1 < sh(j)._1) sh(i) else sh(j)
      b = if (sh(i)._1 < sh(j)._1) sh(j) else sh(i)
      inter = (a._2 & b._2).size if inter > 0
    } yield {
      val c = inter.toDouble / math.min(a._2.size, b._2.size)
      val jac = inter.toDouble / (a._2.size + b._2.size - inter)
      (a._1, b._1, c, jac)
    }
    val nCand = pairs.length.toLong
    val nC08 = pairs.count(_._3 >= 0.8).toLong
    val nJ05 = pairs.count(_._4 >= 0.5).toLong
    val nConly = pairs.count(p => p._3 >= 0.8 && p._4 < 0.5).toLong
    val byPair = pairs.map(p => (p._1, p._2) -> p._3).toMap
    val nPlanted = uni.collect {
      case (sid, _) if sid >= 200000L =>
        byPair.get((sid - 200000L, sid)) match {
          case Some(c) => if (c >= 0.999) 1 else 0
          // absent pair can still be "recovered" when the snippet equals
          // the original (same class, not a pair in the a<b scan): then
          // both ids carry identical sets and the pair DOES exist with
          // containment 1.0 — absence means sets were empty, not planted
          case None => 0
        }
    }.sum.toLong
    (nCand, nC08, nJ05, nConly, nPlanted)
  }

  private def runQuery(docs: Seq[(Long, String)]): (Long, Long, Long, Long, Long) = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-contain").toString
    docs.toDF("doc_id", "text")
      .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
      .withColumn("source", org.apache.spark.sql.functions.lit("s"))
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length($"text").cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = graft.queries.DedupQueries.dq16ContainmentDedup.fn(spark, dir).head()
    (row.getAs[Long]("n_candidate_pairs"), row.getAs[Long]("n_contain_08"),
      row.getAs[Long]("n_jaccard_05"), row.getAs[Long]("n_contain_only"),
      row.getAs[Long]("n_planted_recovered"))
  }

  test("collapsed counts equal the naive pair scan on clone-salted random corpora") {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa")
    for (seed <- Seq(1, 2, 3)) {
      val rnd = new scala.util.Random(seed)
      val base = (0L until 24L).map { id =>
        val n = 4 + rnd.nextInt(30)
        (id, Seq.fill(n)(words(rnd.nextInt(words.length))).mkString(" "))
      }
      // salt with exact clones — the shape the collapse exists for
      val clones = base.take(6).zipWithIndex.map { case ((id, t), k) =>
        (1000L + 10 * id + k, t)
      }
      val docs = base ++ clones
      val got = runQuery(docs)
      val want = bruteForce(docs)
      assert(got == want, s"seed $seed: query $got != brute force $want")
    }
  }
}

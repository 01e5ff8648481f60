package graft.ml

import graft.TestSpark
import graft.queries.MlQueries
import graft.sources.Tables
import org.apache.spark.ml.functions.vector_to_array
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Threshold/shape specs for the ML stages the queries exercise only as
  * metrics: GBT regression quality, TF-IDF dimensionality, LDA topic
  * structure, Word2Vec vector geometry. */
class TextPipelinesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("GBT salary regression reaches R² >= 0.2 on the held-out split (M4)") {
    import spark.implicits._
    val feats = MlQueries.featurizedJobs(spark, dir)
      .select(($"salary_final" +: MlQueries.jobFeatureCols.map(col)): _*)
      .na.fill(0.0).coalesce(4).cache()
    val Array(train, test) = feats.randomSplit(Array(0.8, 0.2), 42)
    val model = Pipelines.hotScoreGbt(MlQueries.jobFeatureCols, "salary_final").fit(train)
    val pred = model.transform(test)
    val r2 = Pipelines.regMetric(pred, "salary_final", "r2")
    assert(r2 >= 0.2, s"GBT r2 $r2")
  }

  test("TF-IDF pipeline emits 3000-dim vectors with nonzero weights (M9)") {
    import spark.implicits._
    val docs = Tables.documents(spark, dir).select($"lang", $"text").limit(200)
    val out = Pipelines.tfidf("text").fit(docs).transform(docs)
      .withColumn("arr", vector_to_array($"tfidf"))
      .select(size($"arr").as("dim"),
        aggregate(transform($"arr", x => when(x =!= 0.0, 1).otherwise(0)),
          lit(0), _ + _).as("nnz"))
    val rows = out.collect()
    assert(rows.forall(_.getInt(0) == 3000))
    assert(rows.count(_.getInt(1) > 0) > rows.length / 2)
  }

  test("LDA produces 8 topics with positive term weights (M11)") {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select(split(lower($"text"), "\\s+").as("tokens")).limit(300)
    val model = Pipelines.ldaTopics("tokens", maxIter = 5).fit(toks)
    val lda = model.stages.last.asInstanceOf[org.apache.spark.ml.clustering.LDAModel]
    val topics = lda.describeTopics(3).collect()
    assert(topics.length == 8)
    topics.foreach { r =>
      val weights = r.getAs[scala.collection.Seq[Double]]("termWeights")
      assert(weights.forall(_ > 0))
    }
  }

  test("Word2Vec embeds the vocabulary at the configured size with sane synonyms (M10)") {
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select(split(lower($"text"), "\\s+").as("tokens"))
    val model = Pipelines.word2vec("tokens", vectorSize = 32).fit(toks)
    val vecs = model.getVectors
    assert(vecs.count() > 10)
    assert(vecs.select(size(vector_to_array($"vector"))).head.getInt(0) == 32)
    val syns = model.findSynonyms("data", 3).collect()
    assert(syns.length == 3)
    assert(syns.forall(r => r.getAs[Double]("similarity") <= 1.0 + 1e-9))
  }
}

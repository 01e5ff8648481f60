package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.{ClusteringEvaluator, RegressionEvaluator, BinaryClassificationEvaluator}
import org.apache.spark.ml.feature._
import org.apache.spark.ml.regression.{GBTRegressor, RandomForestRegressor}
import org.apache.spark.sql.DataFrame

/** Typed wrappers over spark.ml pipelines mirroring the reference's model
  * zoo (SURVEY §2.10 M1-M15). Hyper-parameters match the reference's
  * persisted model metadata exactly (seeds 42 everywhere); the assemble →
  * standard-scale → learn shape is shared.
  *
  * Scale note: `fit` is iterative whole-data aggregation — callers should
  * cache the featurized frame once (the reference recomputed its Cassandra
  * scan per action, SURVEY §4; we don't repeat that).
  */
object Pipelines {

  /** M1+M2 prefix: assemble + standard-scale (withMean/withStd true —
    * train_kmeans.py:141-146). */
  def scaledFeatures(inputCols: Array[String]): Array[org.apache.spark.ml.PipelineStage] = Array(
    new VectorAssembler().setInputCols(inputCols).setOutputCol("features_raw"),
    new StandardScaler().setInputCol("features_raw").setOutputCol("features")
      .setWithMean(true).setWithStd(true))

  /** M3: k-means job clustering (k=5, seed=42, prediction col `cluster` —
    * train_kmeans.py:150-156). */
  def kmeans(featureCols: Array[String], k: Int = 5): Pipeline =
    new Pipeline().setStages(scaledFeatures(featureCols) :+
      new KMeans().setK(k).setSeed(42).setFeaturesCol("features")
        .setPredictionCol("cluster"))

  /** M5: salary random forest (numTrees=100, maxDepth=10, seed=42 —
    * train_random_forest.py:206-212). */
  def salaryForest(featureCols: Array[String], numTrees: Int = 100,
      maxDepth: Int = 10): Pipeline =
    new Pipeline().setStages(scaledFeatures(featureCols) :+
      new RandomForestRegressor().setLabelCol("salary_final")
        .setFeaturesCol("features").setNumTrees(numTrees)
        .setMaxDepth(maxDepth).setSeed(42))

  /** Adaptive RF sizing by sample count (pyc ml_train_from_cassandra
    * train_model@285 tier table: 500→30/8, 1000→40/10, 2000→50/12,
    * 5000→60/15, else 75/18). */
  def adaptiveForestParams(n: Long): (Int, Int) =
    if (n < 500) (30, 8)
    else if (n < 1000) (40, 10)
    else if (n < 2000) (50, 12)
    else if (n < 5000) (60, 15)
    else (75, 18)

  /** M4: hot-score GBT (maxIter=50, maxDepth=5, seed=42 —
    * train_gbt.py:147-153). */
  def hotScoreGbt(featureCols: Array[String], labelCol: String): Pipeline =
    new Pipeline().setStages(scaledFeatures(featureCols) :+
      new GBTRegressor().setLabelCol(labelCol).setFeaturesCol("features")
        .setMaxIter(50).setMaxDepth(5).setSeed(42))

  /** M6+M7+M8: attractiveness logistic over indexed/one-hot city +
    * position (regParam=0.01 — job_attractiveness_logistic_v2 metadata). */
  def attractivenessLogistic(numericCols: Array[String]): Pipeline = {
    val cityIdx = new StringIndexer().setInputCol("city").setOutputCol("city_idx")
      .setHandleInvalid("keep")
    val posIdx = new StringIndexer().setInputCol("position_level").setOutputCol("pos_idx")
      .setHandleInvalid("keep")
    val ohe = new OneHotEncoder()
      .setInputCols(Array("city_idx", "pos_idx"))
      .setOutputCols(Array("city_vec", "pos_vec"))
    val asm = new VectorAssembler()
      .setInputCols(numericCols ++ Array("city_vec", "pos_vec"))
      .setOutputCol("features")
    val lr = new LogisticRegression().setLabelCol("is_hot")
      .setFeaturesCol("features").setRegParam(0.01)
    new Pipeline().setStages(Array(cityIdx, posIdx, ohe, asm, lr))
  }

  /** The exact stop-word list persisted in the reference's
    * job_attractiveness_lr_v1 StopWordsRemover stage metadata
    * (stages/05_StopWordsRemover_e9c2e15589de/metadata) — Vietnamese
    * job-posting boilerplate. Replicated verbatim, including the
    * multi-word entries ("nhân viên", "công ty", …) that a per-token
    * remover can never match: fidelity to the persisted model wins over
    * cleaning up its quirks. */
  val attractivenessStopWords: Array[String] = Array(
    "của", "và", "các", "có", "làm", "tại", "trong", "được", "với", "là",
    "người", "những", "cho", "về", "nhân viên", "công ty", "tuyển", "lương",
    "tháng", "mô tả", "yêu cầu", "chi nhánh")

  /** M6+M9 composed: the reference's job_attractiveness_lr_v1 pipeline,
    * stage-for-stage from its persisted metadata (models/
    * job_attractiveness_lr_v1/stages/00_…-09_…/metadata): StringIndexer
    * city→city_idx + OHE, StringIndexer position_level→pos_idx + OHE,
    * Tokenizer full_text_features→words_raw, StopWordsRemover(custom
    * list)→words_clean, HashingTF(3000)→tf_features, IDF→text_vec,
    * VectorAssembler([experience_years, city_vec, pos_vec, text_vec]),
    * LogisticRegression(labelCol=is_attractive, regParam=0.01,
    * elasticNetParam=0.8). The 0.8 elastic-net mix is mostly-L1, so the
    * fitted coefficient vector over the 3000-dim text block is sparse —
    * callers can assert sparsity as a self-validating metric. */
  def attractivenessLrV1(): Pipeline = {
    val cityIdx = new StringIndexer().setInputCol("city").setOutputCol("city_idx")
      .setHandleInvalid("keep")
    val cityOhe = new OneHotEncoder()
      .setInputCols(Array("city_idx")).setOutputCols(Array("city_vec"))
    val posIdx = new StringIndexer().setInputCol("position_level").setOutputCol("pos_idx")
      .setHandleInvalid("keep")
    val posOhe = new OneHotEncoder()
      .setInputCols(Array("pos_idx")).setOutputCols(Array("pos_vec"))
    val tok = new Tokenizer().setInputCol("full_text_features").setOutputCol("words_raw")
    val stop = new StopWordsRemover().setInputCol("words_raw").setOutputCol("words_clean")
      .setStopWords(attractivenessStopWords)
    val tf = new HashingTF().setInputCol("words_clean").setOutputCol("tf_features")
      .setNumFeatures(3000)
    val idf = new IDF().setInputCol("tf_features").setOutputCol("text_vec")
    val asm = new VectorAssembler()
      .setInputCols(Array("experience_years", "city_vec", "pos_vec", "text_vec"))
      .setOutputCol("features")
    val lr = new LogisticRegression().setLabelCol("is_attractive")
      .setFeaturesCol("features").setRegParam(0.01).setElasticNetParam(0.8)
    new Pipeline().setStages(
      Array(cityIdx, cityOhe, posIdx, posOhe, tok, stop, tf, idf, asm, lr))
  }

  /** Quality-filter distillation: a text classifier (Tokenizer →
    * HashingTF(1024) → LogisticRegression) trained to reproduce a cheap
    * heuristic quality label, then used to score the whole corpus — the
    * model-based filtering stage of a training-data pipeline (the
    * fastText-classifier pattern): rules label a slice, the distilled
    * model generalizes the judgment, and inference is one map-side
    * transform over the corpus. */
  def qualityFilterLr(labelCol: String): Pipeline = {
    val tok = new Tokenizer().setInputCol("text").setOutputCol("q_tokens")
    val tf = new HashingTF().setInputCol("q_tokens").setOutputCol("q_features")
      .setNumFeatures(1024)
    val lr = new LogisticRegression().setLabelCol(labelCol)
      .setFeaturesCol("q_features").setMaxIter(20).setRegParam(0.01)
    new Pipeline().setStages(Array(tok, tf, lr))
  }

  /** M9: text → TF-IDF (HashingTF numFeatures=3000 —
    * job_attractiveness_lr_v1 stage metadata). */
  def tfidf(textCol: String): Pipeline = {
    val tok = new Tokenizer().setInputCol(textCol).setOutputCol("tokens")
    val stop = new StopWordsRemover().setInputCol("tokens").setOutputCol("clean_tokens")
    val tf = new HashingTF().setInputCol("clean_tokens").setOutputCol("tf")
      .setNumFeatures(3000)
    val idf = new IDF().setInputCol("tf").setOutputCol("tfidf")
    new Pipeline().setStages(Array(tok, stop, tf, idf))
  }

  /** M10: skill/document word2vec (vectorSize=100, minCount=2,
    * windowSize=5, seed=42 — pyc train_word2vec@202). */
  def word2vec(tokensCol: String, vectorSize: Int = 100): Word2Vec =
    new Word2Vec().setInputCol(tokensCol).setOutputCol("w2v")
      .setVectorSize(vectorSize).setMinCount(2).setWindowSize(5).setSeed(42)

  /** M11: CountVectorizer + LDA topic model (k=8 — pyc
    * train_lda_topic_model@263; maxIter caller-set: the reference's 1000
    * is a correctness-irrelevant cost knob). */
  def ldaTopics(tokensCol: String, maxIter: Int): Pipeline = {
    val cv = new CountVectorizer().setInputCol(tokensCol).setOutputCol("tf")
      .setVocabSize(1000)
    val lda = new org.apache.spark.ml.clustering.LDA()
      .setK(8).setMaxIter(maxIter).setSeed(42).setFeaturesCol("tf")
    new Pipeline().setStages(Array(cv, lda))
  }

  /** M12 evaluators. */
  def silhouette(predictions: DataFrame): Double =
    new ClusteringEvaluator().setPredictionCol("cluster")
      .setFeaturesCol("features").evaluate(predictions)
  def regMetric(predictions: DataFrame, labelCol: String, metric: String): Double =
    new RegressionEvaluator().setLabelCol(labelCol)
      .setPredictionCol("prediction").setMetricName(metric).evaluate(predictions)
  def auc(predictions: DataFrame, labelCol: String): Double =
    new BinaryClassificationEvaluator().setLabelCol(labelCol).evaluate(predictions)

  /** M15 + K4: model persistence round-trip. */
  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)
  def load(path: String): PipelineModel = PipelineModel.load(path)
}

package graft.queries

import graft.QueryDef
import graft.QueryDef.sqlChecked
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation — the composed pipeline every
  * LLM corpus actually runs, as ONE oracle-checked query:
  *
  *   quality filter → exact dedup (keep-first) → deterministic sample
  *   → token-budget shard packing → per-shard manifest
  *
  * Each stage is the scale shape its standalone query establishes
  * (fq02/tq04 one-scan features, dq08's bag-of-words digest with only
  * 32-byte hashes in the dedup shuffle, tq09's partition-independent
  * md5 sampling, tq11's distributed PrefixSum packing), so the
  * composition inherits every individual 100 TB argument: the document
  * bodies are consumed by exactly one scan's projection; everything
  * after moves (doc_id, n_tokens, digest) triplets. The DuckDB oracle
  * replays the full funnel and hash-checks the final shard manifest —
  * stage boundaries can't silently drift apart.
  */
object PipelineQueries {

  val pq01TrainingPrep: QueryDef = sqlChecked(
    "pq01_training_prep",
    """WITH feats AS (
      |  SELECT doc_id, text,
      |    len(string_split_regex(text, '\s+')) AS n_tokens,
      |    len(string_split(concat(' ', text, ' '), ' the ')) - 1
      |      + len(string_split(concat(' ', text, ' '), ' a ')) - 1 AS stop_hits
      |  FROM documents),
      |q AS (
      |  SELECT doc_id, text, n_tokens FROM feats
      |  WHERE n_tokens >= 20 AND CAST(stop_hits AS DOUBLE) / n_tokens > 0.02),
      |h AS (
      |  SELECT doc_id, n_tokens,
      |    sha256(array_to_string(list_sort(list_distinct(
      |      string_split_regex(lower(text), '\s+'))), ' ')) AS h
      |  FROM q),
      |d AS (
      |  SELECT doc_id, n_tokens FROM (
      |    SELECT doc_id, n_tokens,
      |      ROW_NUMBER() OVER (PARTITION BY h ORDER BY doc_id) AS rn
      |    FROM h)
      |  WHERE rn = 1),
      |s AS (
      |  SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens FROM d
      |  WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'cccd'),
      |p AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS running
      |  FROM s)
      |SELECT CAST(FLOOR((running - n_tokens) / 4096.0) AS BIGINT) AS shard,
      |  COUNT(*) AS n_docs,
      |  CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens,
      |  CAST(min(doc_id) AS BIGINT) AS min_doc,
      |  CAST(max(doc_id) AS BIGINT) AS max_doc
      |FROM p GROUP BY shard ORDER BY shard""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    def hits(marker: String) =
      size(split(concat(lit(" "), $"text", lit(" ")), s" $marker ", -1)) - 1
    // single scan computes every per-doc feature; bodies die here
    val feats = Tables.fanOut(spark, Tables.documents(spark, dir))
      .select($"doc_id", $"text",
        size(split($"text", "\\s+")).as("n_tokens"),
        (hits("the") + hits("a")).as("stop_hits"))
    val quality = feats
      .filter($"n_tokens" >= 20 &&
        $"stop_hits".cast("double") / $"n_tokens" > 0.02)
    // dq08's canonical bag-of-words digest: the dedup shuffle carries
    // 32-byte hashes + two longs, never text
    val hashed = quality.select($"doc_id", $"n_tokens",
      sha2(concat_ws(" ",
        array_sort(array_distinct(split(lower($"text"), "\\s+")))), 256).as("h"))
    val deduped = hashed
      .withColumn("rn",
        row_number().over(Window.partitionBy($"h").orderBy($"doc_id")))
      .filter($"rn" === 1)
      .select($"doc_id", $"n_tokens")
    // partition-independent md5 threshold (tq09): ~80% keep, reproducible
    // on any cluster layout
    val sampled = deduped
      .filter(substring(md5($"doc_id".cast("string")), 1, 4) < "cccd")
      .select($"doc_id", $"n_tokens".cast("long").as("n_tokens"))
    // distributed prefix sum (tq11's operator) — never a single-partition
    // window sort of the surviving corpus
    val packed = graft.operators.PrefixSum
      .runningSum(sampled, "doc_id", "n_tokens", "running")
    packed
      .withColumn("shard", floor(($"running" - $"n_tokens") / 4096.0))
      .groupBy($"shard")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_tokens").cast("long").as("shard_tokens"),
        min($"doc_id").cast("long").as("min_doc"),
        max($"doc_id").cast("long").as("max_doc"))
      .orderBy($"shard")
  }

  val all: Seq[QueryDef] = Seq(pq01TrainingPrep)
}

package graft.queries

import graft.QueryDef
import graft.QueryDef.{rowsOnly, sqlChecked}
import graft.multimodal.{Decode, EbmlProbe, Mp4Probe, PHash}
import graft.sources.Tables
import graft.util.Num._
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` corpus — the pieces a
  * large-scale training-data pipeline needs: corpus stats, token counting,
  * n-gram-heuristic language ID, quality scoring, fingerprinting, and the
  * multimodal binary-column plumbing.
  *
  * Scale shape: every query is scan → codegen'd projection (string
  * functions, no UDFs) → one hash aggregate. Token explosion only happens
  * inside size()/split() (never a row explosion), so the row count stays
  * the corpus row count end-to-end.
  */
object TextQueries {

  /** Corpus distribution stats per (lang, source-prefix): A2 over text
    * metadata. */
  val tq01CorpusStats: QueryDef = sqlChecked(
    "tq01_corpus_stats",
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(CAST((n_chars) AS DECIMAL(30,6))) AS DOUBLE) AS sum_chars,
      |  CAST(SUM(CAST((n_chars) AS DECIMAL(30,6))) AS DOUBLE) / COUNT((n_chars)) AS avg_chars,
      |  CAST(min(n_chars) AS BIGINT) AS min_chars,
      |  CAST(max(n_chars) AS BIGINT) AS max_chars,
      |  COUNT(DISTINCT source) AS n_sources
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        dsum($"n_chars").as("sum_chars"),
        davg($"n_chars").as("avg_chars"),
        min($"n_chars").cast("long").as("min_chars"),
        max($"n_chars").cast("long").as("max_chars"),
        countDistinct($"source").as("n_sources"))
      .orderBy($"lang")
  }

  /** Token counting (whitespace tokenizer) — F11 split + F18 size, no row
    * explosion: size(split()) stays inside the projection. */
  val tq02TokenCounts: QueryDef = sqlChecked(
    "tq02_token_counts",
    """SELECT lang,
      |  CAST(SUM(CAST((len(string_split_regex(text, '\s+'))) AS DECIMAL(30,6))) AS DOUBLE) AS total_tokens,
      |  CAST(SUM(CAST((len(string_split_regex(text, '\s+'))) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_tokens,
      |  CAST(MAX(len(string_split_regex(text, '\s+'))) AS BIGINT) AS max_tokens
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .withColumn("n_tokens", size(split($"text", "\\s+")))
      .groupBy($"lang")
      .agg(
        dsum($"n_tokens").as("total_tokens"),
        (dsum($"n_tokens") / count(lit(1))).as("avg_tokens"),
        max($"n_tokens").cast("long").as("max_tokens"))
      .orderBy($"lang")
  }

  /** Language-ID by marker-token heuristic (n-gram-frequency family):
    * score each language by counting its marker tokens, pick argmax with a
    * deterministic preference order. Pure string built-ins → the whole
    * classifier is one codegen'd projection. */
  val tq03LanguageId: QueryDef = sqlChecked(
    "tq03_language_id", {
      def hits(marker: String): String =
        s"len(string_split(concat(' ', text, ' '), ' $marker ')) - 1"
      s"""WITH scored AS (
         |  SELECT lang,
         |    ${hits("the")} + ${hits("a")} + ${hits("is")} AS score_en,
         |    ${hits("der")} + ${hits("und")} + ${hits("ist")} AS score_de,
         |    ${hits("el")} + ${hits("la")} + ${hits("es")} AS score_es
         |  FROM documents)
         |SELECT lang,
         |  CASE WHEN score_en >= score_de AND score_en >= score_es AND score_en > 0 THEN 'en'
         |       WHEN score_de >= score_es AND score_de > 0 THEN 'de'
         |       WHEN score_es > 0 THEN 'es'
         |       ELSE 'unknown' END AS lang_pred,
         |  COUNT(*) AS n
         |FROM scored
         |GROUP BY 1, 2
         |ORDER BY lang, lang_pred""".stripMargin
    }) { (spark, dir) =>
    import spark.implicits._
    // marker-hit count = occurrences of " marker " in padded text, computed
    // as split-cardinality minus one (replace-all portable across engines)
    def hits(marker: String) =
      size(split(concat(lit(" "), $"text", lit(" ")), s" $marker ", -1)) - 1
    Tables.documents(spark, dir)
      .withColumn("score_en", hits("the") + hits("a") + hits("is"))
      .withColumn("score_de", hits("der") + hits("und") + hits("ist"))
      .withColumn("score_es", hits("el") + hits("la") + hits("es"))
      .withColumn("lang_pred",
        when($"score_en" >= $"score_de" && $"score_en" >= $"score_es" && $"score_en" > 0, "en")
          .when($"score_de" >= $"score_es" && $"score_de" > 0, "de")
          .when($"score_es" > 0, "es")
          .otherwise("unknown"))
      .groupBy($"lang", $"lang_pred")
      .agg(count(lit(1)).as("n"))
      .orderBy($"lang", $"lang_pred")
  }

  /** Quality scoring: length / mean-token-length / stopword-ratio features
    * + a composite score, bucketed for the oracle. The per-doc features
    * stay in one projection; only the small bucket aggregate shuffles. */
  val tq04QualityScore: QueryDef = sqlChecked(
    "tq04_quality_score",
    """WITH feats AS (
      |  SELECT doc_id,
      |    CAST(n_chars AS DOUBLE) AS len_chars,
      |    CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) AS n_tokens,
      |    CAST(len(string_split(concat(' ', text, ' '), ' the ')) - 1
      |      + len(string_split(concat(' ', text, ' '), ' a ')) - 1 AS DOUBLE) AS stop_hits
      |  FROM documents),
      |scored AS (
      |  SELECT doc_id,
      |    len_chars / n_tokens AS mean_tok_len,
      |    stop_hits / n_tokens AS stop_ratio,
      |    CASE WHEN n_tokens >= 20 THEN 1.0 ELSE n_tokens / 20.0 END * 0.5
      |      + CASE WHEN stop_hits / n_tokens > 0.02 THEN 0.5 ELSE 0.0 END AS quality
      |  FROM feats)
      |SELECT round(quality, 2) AS quality_bucket, COUNT(*) AS n_docs,
      |  CAST(SUM(CAST((mean_tok_len) AS DECIMAL(30,6))) AS DOUBLE) / COUNT((mean_tok_len)) AS avg_tok_len
      |FROM scored
      |GROUP BY 1
      |ORDER BY quality_bucket""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    def hits(marker: String) =
      (size(split(concat(lit(" "), $"text", lit(" ")), s" $marker ", -1)) - 1)
    Tables.documents(spark, dir)
      .select($"doc_id",
        $"n_chars".cast("double").as("len_chars"),
        size(split($"text", "\\s+")).cast("double").as("n_tokens"),
        (hits("the") + hits("a")).cast("double").as("stop_hits"))
      .select($"doc_id",
        ($"len_chars" / $"n_tokens").as("mean_tok_len"),
        ($"stop_hits" / $"n_tokens").as("stop_ratio"),
        (when($"n_tokens" >= 20, 1.0).otherwise($"n_tokens" / 20.0) * 0.5 +
          when($"stop_hits" / $"n_tokens" > 0.02, 0.5).otherwise(0.0)).as("quality"))
      .groupBy(round($"quality", 2).as("quality_bucket"))
      .agg(count(lit(1)).as("n_docs"), davg($"mean_tok_len").as("avg_tok_len"))
      .orderBy($"quality_bucket")
  }

  /** Document fingerprinting: md5 of whitespace-normalized lowercase text
    * (the exact-dedup key); verifies hex-digest portability + uniqueness. */
  val tq05Fingerprints: QueryDef = sqlChecked(
    "tq05_fingerprints",
    """SELECT doc_id,
      |  md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
      |FROM documents
      |WHERE doc_id < 100
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 100)
      .select($"doc_id",
        md5(lower(regexp_replace(trim($"text"), "\\s+", " "))).as("fp"))
      .orderBy($"doc_id")
  }

  /** Multimodal decode, END TO END REAL for images: per document, encode a
    * solid-gray PNG whose dimensions and gray level derive in closed form
    * from (doc_id, n_chars), then decode the actual PNG bytes on the
    * executors with JDK `javax.imageio` (graft.multimodal.Decode) and emit
    * the DECODED width/height/gray. The oracle recomputes the same closed
    * forms arithmetically in DuckDB — a hash match proves the real
    * encode→binary→ImageIO-decode round trip recovered every dimension and
    * pixel level exactly. Batched mapPartitions keeps codec work
    * per-executor with bounded memory (the 100 TB shape). */
  val tq06MultimodalDecode: QueryDef = sqlChecked(
    "tq06_multimodal_decode",
    """SELECT doc_id,
      |  CAST(doc_id % 7 + 1 AS INT) AS width,
      |  CAST(doc_id % 5 + 1 AS INT) AS height,
      |  CAST(n_chars % 256 AS INT) AS gray
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    implicit val assetEnc = org.apache.spark.sql.Encoders.product[Decode.Asset]
    val assets = Tables.documents(spark, dir)
      .filter($"doc_id" < 200)
      .select($"doc_id",
        ($"doc_id" % 7 + 1).cast("int").as("w"),
        ($"doc_id" % 5 + 1).cast("int").as("h"),
        ($"n_chars" % 256).cast("int").as("g"))
      .as[(Long, Int, Int, Int)]
      .map { case (id, w, h, g) =>
        Decode.Asset(id, Decode.ImageCodec.encodeGray(w, h, g), "image")
      }
    Decode.decode(assets)
      .select(
        $"asset_id".as("doc_id"),
        $"width",
        $"height",
        round($"brightness" * 255).cast("int").as("gray"))
      .orderBy($"doc_id")
  }

  /** Audio twin of tq06, END TO END REAL: per document, encode a
    * ±amplitude square-wave WAV whose sample rate, frame count and
    * amplitude derive in closed form from (doc_id, n_chars), then decode
    * the actual PCM bytes with JDK `javax.sound.sampled` on the executors
    * and emit the DECODED rate/frames/amplitude (a square wave's RMS is
    * exactly its amplitude, so loudness round-trips exactly). The oracle
    * recomputes the closed forms arithmetically — a hash match proves the
    * WAV encode→binary→decode round trip bit-exact. */
  val tq22AudioDecode: QueryDef = sqlChecked(
    "tq22_audio_decode",
    """SELECT doc_id,
      |  CAST(8000 + (doc_id % 4) * 4000 AS INT) AS sample_rate,
      |  CAST(doc_id % 50 + 10 AS INT) AS n_samples,
      |  CAST((n_chars % 256) * 128 AS INT) AS amp
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    implicit val assetEnc = org.apache.spark.sql.Encoders.product[Decode.Asset]
    val assets = Tables.documents(spark, dir)
      .filter($"doc_id" < 200)
      .select($"doc_id",
        (lit(8000) + ($"doc_id" % 4) * 4000).cast("int").as("rate"),
        ($"doc_id" % 50 + 10).cast("int").as("frames"),
        (($"n_chars" % 256) * 128).cast("int").as("amp"))
      .as[(Long, Int, Int, Int)]
      .map { case (id, rate, frames, amp) =>
        Decode.Asset(id, Decode.AudioCodec.encodeTone(rate, frames, amp), "audio")
      }
    Decode.decode(assets)
      .select(
        $"asset_id".as("doc_id"),
        $"width".as("sample_rate"),
        $"n_frames".as("n_samples"),
        round($"brightness" * 32768).cast("int").as("amp"))
      .orderBy($"doc_id")
  }

  /** Video (animated GIF) twin of tq06/tq22, END TO END REAL: per
    * document, encode an animated GIF of solid-gray frames with
    * closed-form dims/frame-count/gray, multi-frame-decode the actual
    * container bytes with `javax.imageio` on the executors, and emit the
    * DECODED width/height/frames/gray (solid frames survive GIF palette
    * quantization exactly). Oracle recomputes the closed forms — hash
    * match proves the whole container round trip. */
  val tq23VideoDecode: QueryDef = sqlChecked(
    "tq23_video_decode",
    """SELECT doc_id,
      |  CAST(doc_id % 6 + 2 AS INT) AS width,
      |  CAST(doc_id % 3 + 2 AS INT) AS height,
      |  CAST(doc_id % 4 + 1 AS INT) AS n_frames,
      |  CAST(n_chars % 256 AS INT) AS gray
      |FROM documents WHERE doc_id < 150 ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    implicit val assetEnc = org.apache.spark.sql.Encoders.product[Decode.Asset]
    val assets = Tables.documents(spark, dir)
      .filter($"doc_id" < 150)
      .select($"doc_id",
        ($"doc_id" % 6 + 2).cast("int").as("w"),
        ($"doc_id" % 3 + 2).cast("int").as("h"),
        ($"doc_id" % 4 + 1).cast("int").as("nf"),
        ($"n_chars" % 256).cast("int").as("g"))
      .as[(Long, Int, Int, Int, Int)]
      .map { case (id, w, h, nf, g) =>
        Decode.Asset(id, Decode.VideoCodec.encodeGrayFrames(w, h, g, nf), "gif")
      }
    Decode.decode(assets)
      .select(
        $"asset_id".as("doc_id"),
        $"width",
        $"height",
        $"n_frames",
        round($"brightness" * 255).cast("int").as("gray"))
      .orderBy($"doc_id")
  }

  /** MP4 metadata probe, END TO END REAL: per document, build a minimal
    * ISO-BMFF container (ftyp+moov headers, exactly what a range-read of
    * a real asset's first kilobytes returns) with closed-form dims and
    * duration, then parse the actual box bytes on the executors
    * (multimodal/Mp4Probe — pure JDK byte parsing) and emit the PROBED
    * values. This is the 100 TB first pass over video assets: filter and
    * route on header metadata BEFORE paying for demux+decode. Oracle
    * recomputes the closed forms — hash match proves the box round trip. */
  val tq24Mp4Probe: QueryDef = sqlChecked(
    "tq24_mp4_probe",
    """SELECT doc_id,
      |  CAST(16 * (doc_id % 8 + 8) AS INT) AS width,
      |  CAST(16 * (doc_id % 5 + 5) AS INT) AS height,
      |  CAST((n_chars % 1000) * 100 + 100 AS BIGINT) AS duration_ms,
      |  1 AS n_tracks
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 200)
      .select($"doc_id",
        (($"doc_id" % 8 + 8) * 16).cast("int").as("w"),
        (($"doc_id" % 5 + 5) * 16).cast("int").as("h"),
        (($"n_chars" % 1000) * 100 + 100).cast("long").as("dur"))
      .as[(Long, Int, Int, Long)]
      .mapPartitions(_.map { case (id, w, h, dur) =>
        val meta = Mp4Probe.probe(Mp4Probe.encodeMeta(w, h, dur))
          .getOrElse(Mp4Probe.Meta(0, 0, -1L, 0))
        (id, meta.width, meta.height, meta.durationMs, meta.nTracks)
      })
      .toDF("doc_id", "width", "height", "duration_ms", "n_tracks")
      .orderBy($"doc_id")
  }

  /** WebM/Matroska twin of tq24, END TO END REAL: per document, build a
    * minimal EBML container (header + Segment{Info,Tracks}, exactly what
    * a range-read of a real webm's first kilobytes returns) with
    * closed-form dims and duration, parse the actual EBML bytes on the
    * executors (multimodal/EbmlProbe — pure JDK VINT walking), and emit
    * the PROBED values. Together with tq24 this covers both dominant web
    * video containers in the route-before-decode first pass. Oracle
    * recomputes the closed forms — hash match proves the round trip. */
  val tq25WebmProbe: QueryDef = sqlChecked(
    "tq25_webm_probe",
    """SELECT doc_id,
      |  CAST(8 * (doc_id % 10 + 4) AS INT) AS width,
      |  CAST(8 * (doc_id % 7 + 3) AS INT) AS height,
      |  CAST((n_chars % 500) * 40 + 40 AS BIGINT) AS duration_ms,
      |  1 AS n_tracks
      |FROM documents WHERE doc_id < 180 ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 180)
      .select($"doc_id",
        (($"doc_id" % 10 + 4) * 8).cast("int").as("w"),
        (($"doc_id" % 7 + 3) * 8).cast("int").as("h"),
        (($"n_chars" % 500) * 40 + 40).cast("long").as("dur"))
      .as[(Long, Int, Int, Long)]
      .mapPartitions(_.map { case (id, w, h, dur) =>
        val meta = EbmlProbe.probe(EbmlProbe.encodeMeta(w, h, dur))
          .getOrElse(EbmlProbe.Meta(0, 0, -1L, 0))
        (id, meta.width, meta.height, meta.durationMs, meta.nTracks)
      })
      .toDF("doc_id", "width", "height", "duration_ms", "n_tracks")
      .orderBy($"doc_id")
  }

  /** MP4 sample-table stats, END TO END REAL: the fixture container now
    * carries a real `stbl` (uniform stsz + one-run stts + stss keyframe
    * marks); the executors parse the actual box bytes
    * (multimodal/Mp4Probe.probeSamples) and emit frame count, media
    * bytes, keyframe count, and the derived bitrate. These are the
    * route/filter signals of a 100 TB video pass — "drop < 200 kbps",
    * "re-encode sparse-keyframe assets" — computed without touching one
    * media byte. Oracle recomputes the closed forms arithmetically. */
  val tq26Mp4Bitrate: QueryDef = sqlChecked(
    "tq26_mp4_bitrate",
    """WITH p AS (
      |  SELECT doc_id,
      |    doc_id % 24 + 1 AS nf,
      |    (doc_id % 7 + 1) * 1000 AS fs,
      |    doc_id % 5 + 1 AS k,
      |    (n_chars % 1000) * 100 + 100 AS dur
      |  FROM documents WHERE doc_id < 200)
      |SELECT doc_id,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST(nf * fs AS BIGINT) AS media_bytes,
      |  CAST((nf - 1) // k + 1 AS BIGINT) AS n_keyframes,
      |  CAST(nf * fs * 8000 // dur AS BIGINT) AS bitrate_bps
      |FROM p ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 200)
      .select($"doc_id",
        ($"doc_id" % 24 + 1).cast("int").as("nf"),
        (($"doc_id" % 7 + 1) * 1000).cast("int").as("fs"),
        ($"doc_id" % 5 + 1).cast("int").as("k"),
        (($"n_chars" % 1000) * 100 + 100).cast("long").as("dur"))
      .as[(Long, Int, Int, Int, Long)]
      .mapPartitions(_.map { case (id, nf, fs, k, dur) =>
        val bytes = Mp4Probe.encodeMetaWithSamples(320, 240, dur, fs, nf, k)
        val dm = Mp4Probe.probe(bytes).map(_.durationMs).getOrElse(-1L)
        Mp4Probe.probeSamples(bytes) match {
          case Some(s) if dm > 0 =>
            (id, s.nFrames, s.mediaBytes, s.nKeyframes, s.mediaBytes * 8000L / dm)
          case _ => (id, -1L, -1L, -1L, -1L) // sentinel, never a failed stage
        }
      })
      .toDF("doc_id", "n_frames", "media_bytes", "n_keyframes", "bitrate_bps")
      .orderBy($"doc_id")
  }

  /** WebM block-level stats, END TO END REAL — the EBML counterpart of
    * tq26: the fixture Segment carries a real Cluster of SimpleBlocks
    * (keyframes flagged per RFC 9559), the executors walk the actual
    * container bytes (multimodal/EbmlProbe.probeBlocks) and emit block
    * count, media bytes, keyframe count, and derived bitrate. Both
    * dominant web video containers now yield identical routing signals
    * without a decoder. Oracle recomputes the closed forms. */
  val tq27WebmBitrate: QueryDef = sqlChecked(
    "tq27_webm_bitrate",
    """WITH p AS (
      |  SELECT doc_id,
      |    doc_id % 20 + 1 AS nf,
      |    (doc_id % 6 + 1) * 800 AS fs,
      |    doc_id % 4 + 1 AS k,
      |    (n_chars % 800) * 50 + 50 AS dur
      |  FROM documents WHERE doc_id < 200)
      |SELECT doc_id,
      |  CAST(nf AS BIGINT) AS n_blocks,
      |  CAST(nf * fs AS BIGINT) AS media_bytes,
      |  CAST((nf - 1) // k + 1 AS BIGINT) AS n_keyframes,
      |  CAST(nf * fs * 8000 // dur AS BIGINT) AS bitrate_bps
      |FROM p ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 200)
      .select($"doc_id",
        ($"doc_id" % 20 + 1).cast("int").as("nf"),
        (($"doc_id" % 6 + 1) * 800).cast("int").as("fs"),
        ($"doc_id" % 4 + 1).cast("int").as("k"),
        (($"n_chars" % 800) * 50 + 50).cast("long").as("dur"))
      .as[(Long, Int, Int, Int, Long)]
      .mapPartitions(_.map { case (id, nf, fs, k, dur) =>
        val bytes = EbmlProbe.encodeMetaWithBlocks(640, 360, dur, fs, nf, k)
        val dm = EbmlProbe.probe(bytes).map(_.durationMs).getOrElse(-1L)
        EbmlProbe.probeBlocks(bytes) match {
          case Some(s) if dm > 0 =>
            (id, s.nBlocks, s.mediaBytes, s.nKeyframes, s.mediaBytes * 8000L / dm)
          case _ => (id, -1L, -1L, -1L, -1L) // sentinel, never a failed stage
        }
      })
      .toDF("doc_id", "n_blocks", "media_bytes", "n_keyframes", "bitrate_bps")
      .orderBy($"doc_id")
  }

  /** The deterministic half of the multimodal plumbing, oracle-checked:
    * payload byte counts survive the text→binary cast identically in both
    * engines (tq06 keeps the fake-decode part rows-only). */
  val tq07MultimodalStats: QueryDef = sqlChecked(
    "tq07_multimodal_stats",
    """SELECT lang AS modality, COUNT(*) AS n_assets,
      |  CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
      |  CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
      |FROM documents
      |GROUP BY lang
      |ORDER BY modality""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"lang".as("modality"), length($"text".cast("binary")).as("nb"))
      .groupBy($"modality")
      .agg(
        count(lit(1)).as("n_assets"),
        sum($"nb").cast("long").as("total_bytes"),
        max($"nb").cast("long").as("max_bytes"))
      .orderBy($"modality")
  }

  /** Stratified sampling (sampleBy): per-stratum Bernoulli fractions with
    * a fixed seed — how a training-data pipeline rebalances a skewed
    * corpus (e.g. downsample the dominant language). rowsOnly: sampling
    * is partitioning-dependent; the invariant columns carry the check
    * (sampled count within binomial bounds of the target fraction). */
  val tq08StratifiedSample: QueryDef = rowsOnly("tq08_stratified_sample") { (spark, dir) =>
    import spark.implicits._
    val docs = Tables.documents(spark, dir)
    val fractions = Map("en" -> 0.25, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0, "zh" -> 1.0)
    val sampled = docs.stat.sampleBy("lang", fractions, 42L)
    val totals = docs.groupBy($"lang").agg(count(lit(1)).as("n_total"))
    sampled.groupBy($"lang").agg(count(lit(1)).as("n_sampled"))
      .join(totals, Seq("lang"))
      .withColumn("target_fraction",
        when($"lang" === "en", 0.25).otherwise(1.0))
      .withColumn("actual_fraction", $"n_sampled" / $"n_total")
      .orderBy($"lang")
  }

  /** tq08's stratified-rebalance semantics, deterministically: the keep
    * fraction still varies per stratum (en ~25%, fr ~50%, the rest all),
    * but the draw is a content-hash threshold on the id instead of a
    * seeded Bernoulli — so the SAME rows are kept on every rerun, any
    * partition count, and any engine, which is what makes this variant
    * oracle-checkable (and what a reproducible corpus rebalance actually
    * wants; tq08 keeps the sampleBy operator itself covered). 'gggg'
    * compares above every hex string = keep-all. */
  val tq08bStratifiedPortable: QueryDef = sqlChecked(
    "tq08b_stratified_portable",
    """SELECT lang, COUNT(*) AS n_sampled,
      |  CAST(SUM(CAST((n_chars) AS DECIMAL(30,6))) AS DOUBLE) AS sum_chars,
      |  CAST(min(doc_id) AS BIGINT) AS min_doc_id
      |FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
      |  CASE lang WHEN 'en' THEN '4000' WHEN 'fr' THEN '8000' ELSE 'gggg' END
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val threshold = when($"lang" === "en", "4000")
      .when($"lang" === "fr", "8000")
      .otherwise("gggg")
    Tables.documents(spark, dir)
      .filter(substring(md5($"doc_id".cast("string")), 1, 4) < threshold)
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_sampled"),
        dsum($"n_chars").as("sum_chars"),
        min($"doc_id").cast("long").as("min_doc_id"))
      .orderBy($"lang")
  }

  /** Deterministic content-hash sampling — the reproducible counterpart
    * to tq08's seeded Bernoulli sampleBy: keep a row iff the first 4 hex
    * chars of md5(doc_id) fall under the rate threshold ('4000'/'ffff' ≈
    * 25%). Unlike seeded RNG sampling this is partition-count independent,
    * re-runnable, and portable — the exact property a training-data
    * pipeline needs for stable held-out splits at 100 TB (and what makes
    * this variant fully oracle-checkable while tq08 is rows-only). */
  val tq09DeterministicSample: QueryDef = sqlChecked(
    "tq09_deterministic_sample",
    """SELECT lang, COUNT(*) AS n_sampled,
      |  CAST(SUM(CAST((n_chars) AS DECIMAL(30,6))) AS DOUBLE) AS sum_chars,
      |  CAST(min(doc_id) AS BIGINT) AS min_doc_id
      |FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '4000'
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter(substring(md5($"doc_id".cast("string")), 1, 4) < "4000")
      .groupBy($"lang")
      .agg(
        count(lit(1)).as("n_sampled"),
        dsum($"n_chars").as("sum_chars"),
        min($"doc_id").cast("long").as("min_doc_id"))
      .orderBy($"lang")
  }

  /** BPE-ish subword token counting: letter runs, digit runs, and single
    * punctuation marks count separately (the pre-merge segmentation a BPE
    * tokenizer starts from), vs tq02's whitespace tokens. The pattern
    * stays in the portable regex subset (character classes + alternation)
    * so Java and RE2 agree; still one codegen'd projection, no row
    * explosion. */
  val tq10BpeTokenCounts: QueryDef = sqlChecked(
    "tq10_bpe_token_counts",
    """SELECT lang,
      |  CAST(SUM(CAST((len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS DECIMAL(30,6))) AS DOUBLE) AS total_bpe_tokens,
      |  CAST(SUM(CAST((len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_bpe_tokens,
      |  CAST(SUM(CAST((len(regexp_extract_all(text, '[0-9]+'))) AS DECIMAL(30,6))) AS DOUBLE) AS digit_runs
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val bpe = size(regexp_extract_all($"text",
      lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
    Tables.documents(spark, dir)
      .select($"lang", bpe.as("n_bpe"),
        size(regexp_extract_all($"text", lit("[0-9]+"), lit(0))).as("n_digit"))
      .groupBy($"lang")
      .agg(
        dsum($"n_bpe").as("total_bpe_tokens"),
        (dsum($"n_bpe") / count(lit(1))).as("avg_bpe_tokens"),
        dsum($"n_digit").as("digit_runs"))
      .orderBy($"lang")
  }

  /** Token-budget shard packing (sequence packing for training-data
    * prep): documents in deterministic doc_id order accumulate into
    * shards of ≤64k whitespace tokens; a doc's shard is where its FIRST
    * token lands. The running total comes from operators/PrefixSum —
    * range-partitioned parallel prefix, not a single-partition window
    * sort — so the same query shape survives a 100 TB corpus. The oracle
    * recomputes it with a plain windowed SUM, proving the distributed
    * prefix is exactly the sequential one. */
  val tq11TokenPacking: QueryDef = sqlChecked(
    "tq11_token_packing",
    """SELECT doc_id, n_tokens, running_tokens,
      |  CAST(FLOOR((running_tokens - n_tokens) / 65536.0) AS BIGINT) AS shard
      |FROM (
      |  SELECT doc_id, n_tokens,
      |    CAST(SUM(n_tokens) OVER (ORDER BY doc_id) AS BIGINT) AS running_tokens
      |  FROM (
      |    SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |    FROM documents))
      |ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tokens"))
    graft.operators.PrefixSum
      .runningSum(toks, "doc_id", "n_tokens", "running_tokens")
      .withColumn("shard",
        floor(($"running_tokens" - $"n_tokens") / 65536.0).cast("bigint"))
      .orderBy($"doc_id")
  }

  /** Corpus-unigram-LM quality score — the cheapest useful "perplexity"
    * proxy a training pipeline runs before anything model-based: score a
    * document by the mean log-probability of its tokens under the
    * corpus's own unigram distribution (gibberish and boilerplate land
    * far in the tails). Two corpus scans (vocab build + score) instead of
    * caching exploded tokens — at 100 TB a cached token explosion is
    * executor-memory suicide while a rescan is a column-pruned parquet
    * pass. The token→count join BROADCASTS the vocab: distinct unigrams
    * grow sublinearly (Heaps' law) while a hash shuffle on `tok` would
    * put every "the" on one executor — broadcast sidesteps the worst key
    * skew in the business. Final per-lang means are rounded to 1e-6 so
    * cross-engine libm ln() ulp drift can't flip the hash. */
  val tq12UnigramLogprob: QueryDef = sqlChecked(
    "tq12_unigram_logprob",
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    unnest(string_split_regex(lower(text), '\s+')) AS tok
      |  FROM documents),
      |vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM vocab),
      |doc AS (
      |  SELECT doc_id, lang, AVG(ln(c / n)) AS lp
      |  FROM toks JOIN vocab USING (tok), tot
      |  GROUP BY doc_id, lang)
      |SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(lp), 6) AS avg_logprob
      |FROM doc GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    def toks = Tables.fanOut(spark, Tables.documents(spark, dir))
      .select($"doc_id", $"lang",
        explode(split(lower($"text"), "\\s+")).as("tok"))
    // the vocab aggregate feeds BOTH the score join and the total; without
    // cache() each consumer re-runs the build scan (no cross-branch CSE) —
    // and the vocab is the bounded Heaps'-law frame caching is made for
    val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("c")).cache()
    val tot = vocab.agg(sum($"c").cast("double").as("n"))
    toks
      .join(broadcast(vocab), Seq("tok"))
      .crossJoin(broadcast(tot))
      .groupBy($"doc_id", $"lang")
      .agg(avg(log($"c" / $"n")).as("lp"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"lp"), 6).as("avg_logprob"))
      .orderBy($"lang")
  }

  /** Context-window chunking — split each document's token stream into
    * fixed training windows with overlap (here 32-token windows, 8-token
    * overlap, stride 24 — sized so the synthetic corpus's ~100-token docs
    * genuinely multi-chunk; a real pipeline's 2048/128 is the same shape),
    * the map-only precursor to sequence packing (tq11). Chunk i covers
    * tokens [24·i, 24·i+32); the last window is the one whose end
    * reaches the document end, so short tails are absorbed rather than
    * emitted as fully-overlapped fragments. Pure `sequence`/`slice`
    * arithmetic inside whole-stage codegen; the only row growth is the
    * bounded ~n/112 explode, and there is no shuffle before the output
    * sort. Row-level oracle over a 30-doc sample. */
  val tq13ContextChunks: QueryDef = sqlChecked(
    "tq13_context_chunks",
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
      |  FROM documents WHERE doc_id < 30),
      |sz AS (SELECT doc_id, w, len(w) AS n FROM toks),
      |idx AS (
      |  SELECT doc_id, w, n, unnest(range(
      |    CASE WHEN n <= 32 THEN 1
      |         ELSE CAST(FLOOR((n - 9) / 24.0) AS BIGINT) + 1 END)) AS chunk_idx
      |  FROM sz),
      |ch AS (
      |  SELECT doc_id, chunk_idx, w, chunk_idx * 24 AS st,
      |    LEAST(n - chunk_idx * 24, 32) AS chunk_len
      |  FROM idx)
      |SELECT doc_id, chunk_idx, chunk_len,
      |  w[st + 1] AS first_tok,
      |  w[st + chunk_len] AS last_tok
      |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val nChunks = when($"n" <= 32, lit(1L))
      .otherwise(floor(($"n" - lit(9)) / lit(24.0)) + 1L)
    Tables.documents(spark, dir)
      .filter($"doc_id" < 30)
      .select($"doc_id", split(lower($"text"), "\\s+").as("w"))
      .withColumn("n", size($"w").cast("long"))
      .select($"doc_id", $"w", $"n",
        explode(sequence(lit(0L), nChunks - 1L)).as("chunk_idx"))
      .withColumn("st", $"chunk_idx" * 24L)
      .withColumn("chunk_len", least($"n" - $"st", lit(32L)))
      .select($"doc_id", $"chunk_idx", $"chunk_len",
        element_at($"w", ($"st" + 1L).cast("int")).as("first_tok"),
        element_at($"w", ($"st" + $"chunk_len").cast("int")).as("last_tok"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** Deterministic global shuffle — the training-data ordering primitive.
    * Every row gets a content-hash sort key (md5 of its id); the shard is
    * the key's first hex char (16 shards) and the within-shard order is
    * key order — reproducible across runs, engines, and partition counts,
    * which rand()-based shuffles are not. The checksum sum(doc_id · rank)
    * is order-SENSITIVE: both engines must compute the identical
    * permutation, not merely the same membership, for it to match.
    *
    * 100 TB shape: the shard is a pure column function (one hash exchange
    * on it), and the rank is a window WITHIN each shard — there is no
    * global sort anywhere; shards are written/consumed independently. */
  val tq14GlobalShuffle: QueryDef = sqlChecked(
    "tq14_global_shuffle",
    """WITH keyed AS (
      |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS k,
      |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS shard
      |  FROM documents),
      |ranked AS (
      |  SELECT shard, doc_id,
      |    row_number() OVER (PARTITION BY shard ORDER BY k) AS rn
      |  FROM keyed)
      |SELECT shard, COUNT(*) AS n_rows,
      |  CAST(SUM(doc_id * rn) AS BIGINT) AS order_checksum,
      |  CAST(MAX(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS head_doc
      |FROM ranked
      |GROUP BY shard
      |ORDER BY shard""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val keyed = Tables.documents(spark, dir)
      .select($"doc_id", md5($"doc_id".cast("string")).as("k"))
      .withColumn("shard", substring($"k", 1, 1))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"shard").orderBy($"k")
    keyed.withColumn("rn", row_number().over(w))
      .groupBy($"shard")
      .agg(
        count(lit(1)).as("n_rows"),
        sum($"doc_id" * $"rn").cast("long").as("order_checksum"),
        max(when($"rn" === 1, $"doc_id")).cast("long").as("head_doc"))
      .orderBy($"shard")
  }

  /** Bigram collocation mining with PMI — the corpus-analysis pass that
    * surfaces multi-word expressions worth protecting from tokenizer
    * splits. Pointwise mutual information log(p(xy)/(p(x)p(y))) from
    * bigram and unigram counts; identical double formula on both engines,
    * rounded to 6 decimals for libm last-ulp drift.
    *
    * Scale shape: the corpus is touched exactly twice (unigram explode,
    * bigram explode) — the token/pair TOTALS derive from the aggregated
    * count frames (nu = Σc, nb = Σcxy), not from re-scanning the corpus,
    * and those count frames are cached because Spark re-executes a
    * subtree per consumer (no cross-branch CSE). Every join is then
    * between cached vocabulary-sized frames — never anything
    * corpus-sized; AQE broadcasts the small sides at runtime. Top-20
    * with a deterministic (count, w1, w2) tiebreak. */
  val tq15BigramPmi: QueryDef = sqlChecked(
    "tq15_bigram_pmi",
    """WITH toks AS (
      |  SELECT string_split_regex(lower(text), '\s+') AS w FROM documents),
      |uni AS (SELECT unnest(w) AS tok FROM toks),
      |ucnt AS (SELECT tok, COUNT(*) AS c FROM uni GROUP BY tok),
      |utot AS (SELECT COUNT(*) AS nu FROM uni),
      |bp AS (
      |  SELECT unnest(list_transform(range(1, len(w)),
      |    i -> {'x': w[i], 'y': w[i + 1]})) AS p
      |  FROM toks WHERE len(w) >= 2),
      |bcnt AS (SELECT p.x AS x, p.y AS y, COUNT(*) AS cxy FROM bp GROUP BY p.x, p.y),
      |btot AS (SELECT COUNT(*) AS nb FROM bp)
      |SELECT x AS w1, y AS w2, cxy AS n_pairs,
      |  ROUND(LN((CAST(cxy AS DOUBLE) / nb) /
      |    ((CAST(cx.c AS DOUBLE) / nu) * (CAST(cy.c AS DOUBLE) / nu))), 6) AS pmi
      |FROM bcnt
      |CROSS JOIN btot CROSS JOIN utot
      |JOIN ucnt cx ON cx.tok = x
      |JOIN ucnt cy ON cy.tok = y
      |ORDER BY n_pairs DESC, w1, w2
      |LIMIT 20""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select(split(lower($"text"), "\\s+").as("w"))
    val ucnt = toks.select(explode($"w").as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("c")).cache()
    val utot = ucnt.agg(sum($"c").as("nu"))
    val pairs = toks.filter(size($"w") >= 2)
      .select(explode(expr(
        "transform(sequence(1, size(w) - 1), " +
          "i -> struct(element_at(w, i) AS x, element_at(w, i + 1) AS y))")).as("p"))
      .select($"p.x".as("x"), $"p.y".as("y"))
    val bcnt = pairs.groupBy($"x", $"y").agg(count(lit(1)).as("cxy")).cache()
    val btot = bcnt.agg(sum($"cxy").as("nb"))
    bcnt
      .crossJoin(broadcast(btot))
      .crossJoin(broadcast(utot))
      .join(ucnt.select($"tok".as("x"), $"c".as("cx")), Seq("x"))
      .join(ucnt.select($"tok".as("y"), $"c".as("cy")), Seq("y"))
      .select($"x".as("w1"), $"y".as("w2"), $"cxy".as("n_pairs"),
        round(log(($"cxy".cast("double") / $"nb") /
          (($"cx".cast("double") / $"nu") * ($"cy".cast("double") / $"nu"))), 6).as("pmi"))
      .orderBy($"n_pairs".desc, $"w1", $"w2")
      .limit(20)
  }

  /** Content-defined chunking boundaries — the dedup-stable alternative
    * to fixed-offset chunking (tq13): a chunk boundary falls wherever the
    * hash of the local content (here: the adjacent token bigram) lands in
    * a target range, so an insertion early in a document only moves the
    * boundaries of ITS chunk, not every chunk after it. The boundary
    * predicate md5(w[i] + ' ' + w[i+1]) starting with '0' fires with
    * p = 1/16 → ~16-token expected chunks. Entirely in-row (HOF filter
    * over the token array, no explode), portable (md5 is the shared
    * hash), and oracle-checked. */
  val tq16CdcBoundaries: QueryDef = sqlChecked(
    "tq16_cdc_boundaries",
    """WITH b AS (
      |  SELECT lang,
      |    len(string_split_regex(lower(text), '\s+')) AS n,
      |    len(list_filter(range(1, len(string_split_regex(lower(text), '\s+'))),
      |      i -> substr(md5(string_split_regex(lower(text), '\s+')[i] || ' ' ||
      |                      string_split_regex(lower(text), '\s+')[i + 1]), 1, 1) = '0'))
      |      AS n_bounds
      |  FROM documents)
      |SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_bounds + 1) AS BIGINT) AS total_chunks,
      |  CAST(SUM(CAST((n) AS DECIMAL(30,6))) AS DOUBLE)
      |    / CAST(SUM(n_bounds + 1) AS DOUBLE) AS avg_chunk_tokens,
      |  CAST(MAX(n_bounds + 1) AS BIGINT) AS max_chunks_per_doc
      |FROM b
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val base = Tables.documents(spark, dir)
      .select($"lang", split(lower($"text"), "\\s+").as("w"))
      .withColumn("n", size($"w").cast("long"))
      .withColumn("n_bounds", expr(
        "size(filter(sequence(1, size(w) - 1), " +
          "i -> substring(md5(concat(element_at(w, i), ' ', element_at(w, i + 1))), 1, 1) = '0'))")
        .cast("long"))
    base.groupBy($"lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum($"n_bounds" + 1L).cast("long").as("total_chunks"),
        (dsum($"n") / sum($"n_bounds" + 1L).cast("double")).as("avg_chunk_tokens"),
        max($"n_bounds" + 1L).cast("long").as("max_chunks_per_doc"))
      .orderBy($"lang")
  }

  /** Interpolated bigram language-model scoring — the next rung above
    * tq12's unigram model and the standard cheap LM-quality signal
    * (Jelinek-Mercer smoothing): p(w2|w1) = λ·c(w1w2)/c(w1·) +
    * (1−λ)·c(w2)/N with λ=0.7, each document scored by the mean ln p of
    * its bigrams, averaged per language. The model IS the corpus's own
    * counts — no external artifact. Shape: one token explode (unigram
    * counts) + one bigram explode (bigram counts); the unigram vocab is
    * the bounded Heaps'-law frame and broadcasts; the bigram count frame
    * joins by hash on (w1, w2) — at 100 TB that's the one genuinely
    * data-sized model table, and it shuffles as 2 strings + a count, not
    * documents. Context totals c(w1·) derive from the bigram frame (one
    * more vocab-sized aggregate), not a third corpus pass. */
  val tq17BigramLogprob: QueryDef = sqlChecked(
    "tq17_bigram_logprob",
    """WITH docs AS (
      |  SELECT doc_id, lang, string_split_regex(lower(text), '\s+') AS w
      |  FROM documents),
      |big AS (
      |  SELECT doc_id, lang, w[i+1] AS w1, w[i+2] AS w2
      |  FROM (SELECT doc_id, lang, w, unnest(range(len(w) - 1)) AS i
      |        FROM docs WHERE len(w) >= 2)),
      |uni AS (
      |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS cu
      |  FROM (SELECT unnest(w) AS tok FROM docs) GROUP BY tok),
      |tot AS (SELECT CAST(SUM(cu) AS DOUBLE) AS n FROM uni),
      |bc AS (
      |  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
      |  FROM big GROUP BY w1, w2),
      |ctx AS (SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1 FROM bc GROUP BY w1),
      |doc AS (
      |  SELECT b.doc_id, b.lang,
      |    AVG(ln(0.7 * c.c12 / x.c1 + 0.3 * u.cu / t.n)) AS lp
      |  FROM big b
      |  JOIN bc c ON b.w1 = c.w1 AND b.w2 = c.w2
      |  JOIN ctx x ON b.w1 = x.w1
      |  JOIN uni u ON b.w2 = u.tok, tot t
      |  GROUP BY b.doc_id, b.lang)
      |SELECT lang, COUNT(*) AS n_docs, ROUND(AVG(lp), 6) AS avg_bigram_logprob
      |FROM doc GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    def docs = Tables.fanOut(spark, Tables.documents(spark, dir))
      .select($"doc_id", $"lang", split(lower($"text"), "\\s+").as("w"))
    def bi = docs.filter(size($"w") >= 2)
      .select($"doc_id", $"lang", explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS w1, w[i + 1] AS w2))"))
        .as("bg"))
      .select($"doc_id", $"lang", $"bg.w1", $"bg.w2")
    val uni = docs.select(explode($"w").as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("cu")).cache()
    val tot = uni.agg(sum($"cu").cast("double").as("n"))
    // bigram counts feed the score join AND the context totals — cache so
    // the second consumer reuses the one bigram-explode scan
    val bc = bi.groupBy($"w1", $"w2").agg(count(lit(1)).as("c12")).cache()
    val ctx = bc.groupBy($"w1").agg(sum($"c12").as("c1"))
    bi
      .join(bc, Seq("w1", "w2"))
      .join(broadcast(ctx), Seq("w1"))
      .join(broadcast(uni.withColumnRenamed("tok", "w2")), Seq("w2"))
      .crossJoin(broadcast(tot))
      .groupBy($"doc_id", $"lang")
      .agg(avg(log(lit(0.7) * $"c12" / $"c1" + lit(0.3) * $"cu" / $"n")).as("lp"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"lp"), 6).as("avg_bigram_logprob"))
      .orderBy($"lang")
  }

  /** Vocabulary growth curve (Heaps'-law measurement): cumulative
    * distinct token types vs cumulative token instances across ten
    * ingest-order corpus slices — how a data team decides whether more of
    * the same source still buys vocabulary. Cumulative-distinct is NOT
    * computed by re-scanning prefixes (quadratic): each type's FIRST
    * slice is a vocab-sized min-aggregate, new-type counts bucket into
    * ten rows, and the running totals are a window over that 10-row
    * summary — corpus scanned once, all integers, exact. */
  val tq18VocabGrowth: QueryDef = sqlChecked(
    "tq18_vocab_growth",
    """WITH m AS (SELECT max(doc_id) AS mx FROM documents),
      |toks AS (
      |  SELECT CAST(doc_id * 10 // (m.mx + 1) AS BIGINT) AS slice,
      |    unnest(string_split_regex(lower(text), '\s+')) AS tok
      |  FROM documents, m),
      |inst AS (
      |  SELECT slice, CAST(count(*) AS BIGINT) AS n_tokens
      |  FROM toks GROUP BY slice),
      |first_seen AS (
      |  SELECT tok, min(slice) AS slice FROM toks GROUP BY tok),
      |newt AS (
      |  SELECT slice, CAST(count(*) AS BIGINT) AS new_types
      |  FROM first_seen GROUP BY slice)
      |SELECT i.slice, i.n_tokens,
      |  CAST(SUM(i.n_tokens) OVER (ORDER BY i.slice
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens,
      |  COALESCE(n.new_types, 0) AS new_types,
      |  CAST(SUM(COALESCE(n.new_types, 0)) OVER (ORDER BY i.slice
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_vocab
      |FROM inst i LEFT JOIN newt n ON i.slice = n.slice
      |ORDER BY i.slice""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, dir)
    val mx = docs.agg(max($"doc_id").as("mx"))
    // ingest-order slice: floor(doc_id·10 / (max+1)) — exact integer
    // arithmetic well inside double's integer range in both engines
    def toks = docs.crossJoin(broadcast(mx))
      .select(floor($"doc_id" * 10 / ($"mx" + 1)).cast("long").as("slice"),
        explode(split(lower($"text"), "\\s+")).as("tok"))
    val inst = toks.groupBy($"slice").agg(count(lit(1)).as("n_tokens"))
    val firstSeen = toks.groupBy($"tok").agg(min($"slice").as("slice"))
    val newt = firstSeen.groupBy($"slice").agg(count(lit(1)).as("new_types"))
    // the running totals window runs over the 10-row slice summary, not
    // data — a single-partition frame is exactly right here
    val w = Window.orderBy($"slice")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    inst.join(newt, Seq("slice"), "left")
      .select($"slice", $"n_tokens",
        sum($"n_tokens").over(w).as("cum_tokens"),
        coalesce($"new_types", lit(0L)).as("new_types"),
        sum(coalesce($"new_types", lit(0L))).over(w).as("cum_vocab"))
      .orderBy($"slice")
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis, IPL'06):
    * keep the top-k documents by ln(u)/w where u is a per-doc uniform
    * draw and w the sampling weight (here n_chars — "prefer longer
    * docs") — provably equivalent to sequential weighted draws, and
    * embarrassingly parallel: each row computes its own key, top-k is a
    * bounded global selection, no sequential state at any scale. The
    * draw u is the md5 hash of the doc id (tq09's determinism trick), so
    * the "random" sample is reproducible on any cluster layout AND
    * replayable by the oracle. Both engines rank by the key ROUNDED to
    * 1e-9 with a doc_id tiebreak, so a last-ulp `ln` divergence cannot
    * flip the selection boundary. */
  val tq20WeightedSample: QueryDef = sqlChecked(
    "tq20_weighted_sample",
    """WITH keyed AS (
      |  SELECT doc_id, lang, n_chars,
      |    round(ln((CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      |        + 0.5) / 4294967296.0) / n_chars, 9) AS es_key
      |  FROM documents)
      |SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS weight, es_key
      |FROM keyed
      |ORDER BY es_key DESC, doc_id
      |LIMIT 50""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val u = (conv(substring(md5($"doc_id".cast("string")), 1, 8), 16, 10)
      .cast("long") + lit(0.5)) / lit(4294967296.0)
    Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"n_chars",
        round(log(u) / $"n_chars", 9).as("es_key"))
      .orderBy($"es_key".desc, $"doc_id")
      .limit(50)
      .select($"doc_id", $"lang", $"n_chars".cast("long").as("weight"), $"es_key")
  }

  /** Compression-ratio quality signal (Gopher/CCNet lineage): DEFLATE
    * length / raw byte length via the native `graft_deflate_len`
    * expression. Long-range repetition (boilerplate, template spam)
    * compresses far below the ~0.3 band that normal prose occupies, and
    * per-token heuristics (fq03) miss it when the repeated unit is longer
    * than a bigram. No SQL engine ships a compression scalar, so this is
    * rows-only — but the output SELF-validates: two planted rows ride
    * along with the corpus, one pathologically repetitive (must land in
    * the flagged band) and one of incompressible hex noise (must not),
    * and their flags are part of the emitted rows. Map-only scan. */
  val tq21CompressionRatio: QueryDef = QueryDef.rowsOnly(
    "tq21_compression_ratio") { (spark, dir) =>
    import spark.implicits._
    import graft.functions.DeflateLength.deflateLen
    val planted = Seq(
      (9000001L, "xx", ("spam " * 400).trim),
      (9000002L, "xx", Seq.tabulate(400)(i =>
        java.lang.Long.toHexString(i * 2654435761L)).mkString(" ")))
      .toDF("doc_id", "lang", "text")
    val ratio = deflateLen($"text").cast("double") / octet_length($"text")
    Tables.documents(spark, dir).select($"doc_id", $"lang", $"text")
      .unionByName(planted)
      .select($"lang", ratio.as("r"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"r"), 4).as("avg_ratio"),
        round(min($"r"), 4).as("min_ratio"),
        round(max($"r"), 4).as("max_ratio"),
        count(when($"r" < 0.2, 1)).as("n_flagged_repetitive"))
      .orderBy($"lang")
  }

  /** tq21's portable twin — the frozen-fixture pattern the codec queries
    * use: DEFLATE has no SQL replay, but over a FROZEN in-query corpus
    * the compressed lengths are deterministic constants (java.util.zip
    * Deflater, fixed level, fixed inputs), so the oracle can carry them
    * literally. Each fixture row is a distinct compressibility regime —
    * empty, single-char, pure run, template spam, hex noise, multi-byte
    * UTF-8, digits — and the query emits raw length, deflate length, and
    * the band tq21's quality gate would assign. A drift in the
    * expression (wrong level, wrong header accounting, codegen path
    * diverging from interpreted) breaks the hash. Octet (not char)
    * lengths: the UTF-8 row ensures byte accounting is what's frozen. */
  val tq21bDeflatePortable: QueryDef = sqlChecked(
    "tq21b_deflate_portable",
    """SELECT * FROM (VALUES
      |  ('digits_cycle', CAST(1000 AS BIGINT), CAST(21 AS BIGINT), 'repetitive'),
      |  ('empty', CAST(0 AS BIGINT), CAST(2 AS BIGINT), 'empty'),
      |  ('hex_noise', CAST(4364 AS BIGINT), CAST(2399 AS BIGINT), 'prose'),
      |  ('single_char', CAST(1 AS BIGINT), CAST(3 AS BIGINT), 'incompressible'),
      |  ('single_run', CAST(1000 AS BIGINT), CAST(11 AS BIGINT), 'repetitive'),
      |  ('template_spam', CAST(1999 AS BIGINT), CAST(22 AS BIGINT), 'repetitive'),
      |  ('utf8_prose', CAST(1320 AS BIGINT), CAST(49 AS BIGINT), 'repetitive')
      |) AS t(case_name, raw_len, deflate_len, ratio_band)
      |ORDER BY case_name""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.functions.DeflateLength.deflateLen
    val fixture = Seq(
      ("empty", ""),
      ("single_char", "a"),
      ("single_run", "a" * 1000),
      ("template_spam", ("spam " * 400).trim),
      ("hex_noise", Seq.tabulate(400)(i =>
        java.lang.Long.toHexString(i * 2654435761L)).mkString(" ")),
      ("utf8_prose", "Hà Nội xin chào thế giới " * 40),
      ("digits_cycle", "0123456789" * 100))
      .toDF("case_name", "text")
    val r = deflateLen($"text").cast("double") / octet_length($"text")
    fixture.select(
        $"case_name",
        octet_length($"text").cast("long").as("raw_len"),
        deflateLen($"text").cast("long").as("deflate_len"),
        when(octet_length($"text") === 0, "empty")
          .when(r < 0.2, "repetitive")
          .when(r > 0.9, "incompressible")
          .otherwise("prose").as("ratio_band"))
      .orderBy($"case_name")
  }

  /** Cross-source n-gram overlap matrix (the Dolma/RedPajama-style
    * corpus-composition analysis): for every ordered source pair, how
    * many distinct 8-token grams they share, next to each side's distinct
    * gram total — the inputs to containment/Jaccard heatmaps that decide
    * which sources are near-copies of each other before training mixes
    * are weighted.
    *
    * 100 TB shape: grams are hashed IN-ROW (xxhash64) before the
    * explode, deduped per source, and the pair join is keyed on the
    * gram — per-gram fanout is bounded by the SOURCE count (tens), never
    * document count, so there is no doc-pair quadratic anywhere. The
    * oracle replays over gram text; identical up to 64-bit collision. */
  val tq28SourceOverlap: QueryDef = sqlChecked(
    "tq28_source_overlap",
    """WITH t AS (
      |  SELECT source, string_split_regex(lower(text), '\s+') AS w
      |  FROM documents),
      |occ AS (
      |  SELECT source, w, unnest(generate_series(0, len(w) - 8)) AS pos
      |  FROM t WHERE len(w) >= 8),
      |g AS (
      |  SELECT DISTINCT source,
      |    array_to_string(w[pos + 1 : pos + 8], ' ') AS gram
      |  FROM occ),
      |tot AS (SELECT source, COUNT(*) AS n_grams FROM g GROUP BY source),
      |pairs AS (
      |  SELECT a.source AS src_a, b.source AS src_b,
      |    COUNT(*) AS shared_grams
      |  FROM g a JOIN g b ON a.gram = b.gram AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT src_a, src_b, shared_grams,
      |  ta.n_grams AS n_grams_a, tb.n_grams AS n_grams_b
      |FROM pairs
      |JOIN tot ta ON ta.source = pairs.src_a
      |JOIN tot tb ON tb.source = pairs.src_b
      |ORDER BY src_a, src_b""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val grams = Tables.fanOut(spark, Tables.documents(spark, dir))
      .select($"source", split(lower($"text"), "\\s+").as("w"))
      .filter(size($"w") >= 8)
      .select($"source", explode(array_distinct(transform(
        sequence(lit(0), size($"w") - 8),
        i => xxhash64(concat_ws(" ", slice($"w", i + 1, lit(8))))))).as("g"))
      .distinct()
      .cache()
    val tot = grams.groupBy($"source").agg(count(lit(1)).as("n_grams"))
    val pairs = grams.select($"g", $"source".as("src_a"))
      .join(grams.select($"g", $"source".as("src_b")), Seq("g"))
      .filter($"src_a" < $"src_b")
      .groupBy($"src_a", $"src_b")
      .agg(count(lit(1)).as("shared_grams"))
    pairs
      .join(tot.select($"source".as("src_a"), $"n_grams".as("n_grams_a")),
        Seq("src_a"))
      .join(tot.select($"source".as("src_b"), $"n_grams".as("n_grams_b")),
        Seq("src_b"))
      .select($"src_a", $"src_b", $"shared_grams",
        $"n_grams_a", $"n_grams_b")
      .orderBy($"src_a", $"src_b")
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020, arXiv:
    * 1911.00359 §4.3) — split each language's corpus into head / middle /
    * tail thirds by LM score, the standard quality-tiering step before
    * mixing (train mostly on head, sample middle, drop or downweight
    * tail). The LM is tq12's corpus unigram model; the per-doc score is
    * the mean token log-probability (higher = more fluent = head).
    * Buckets come from per-lang tertile CUT VALUES (ExactPercentile,
    * quantile_cont semantics — q24's proven oracle pairing) broadcast and
    * compared in-row — CCNet itself buckets against precomputed cutoffs,
    * and at 100 TB that is the only shape that works: an ntile window
    * partitioned by lang would sort billions of rows in ~5 tasks, while
    * the cutoff join is one bounded selection pass over a skinny
    * (lang, lp) projection plus a map-side compare. Determinism: token
    * weights are ln() rounded to 9 dp on the distinct-vocab frame, per-doc
    * sums run in DECIMAL(25,9) (association-order-proof), so every lp is
    * the same double in both engines; thresholds are rounded to 6 dp
    * before the compare and outputs to 6 dp (tq12's ulp shield). */
  val tq33PerplexityBuckets: QueryDef = sqlChecked(
    "tq33_perplexity_buckets",
    """WITH toks AS (
      |  SELECT doc_id, lang,
      |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                       t -> t <> '')) AS tok
      |  FROM documents),
      |vocab AS (SELECT tok, COUNT(*) AS c FROM toks GROUP BY tok),
      |tot AS (SELECT CAST(SUM(c) AS DOUBLE) AS n FROM vocab),
      |wt AS (SELECT tok, round(ln(c / n), 9) AS w FROM vocab, tot),
      |doc AS (
      |  SELECT doc_id, lang,
      |    CAST(SUM(CAST(w AS DECIMAL(25,9))) AS DOUBLE) / COUNT(*) AS lp
      |  FROM toks JOIN wt USING (tok)
      |  GROUP BY doc_id, lang),
      |th AS (SELECT lang,
      |         round(quantile_cont(lp, CAST(1 AS DOUBLE) / 3), 6) AS t1,
      |         round(quantile_cont(lp, CAST(2 AS DOUBLE) / 3), 6) AS t2
      |       FROM doc GROUP BY lang),
      |b AS (SELECT doc.lang,
      |        CASE WHEN lp >= t2 THEN 'head'
      |             WHEN lp >= t1 THEN 'middle'
      |             ELSE 'tail' END AS bucket, lp
      |      FROM doc JOIN th ON doc.lang = th.lang)
      |SELECT lang, bucket, COUNT(*) AS n_docs,
      |  round(AVG(lp), 6) AS avg_lp,
      |  round(MIN(lp), 6) AS min_lp,
      |  round(MAX(lp), 6) AS max_lp
      |FROM b GROUP BY lang, bucket ORDER BY lang, bucket""".stripMargin) {
    (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    // two corpus scans (vocab build + score) instead of a cached token
    // explosion — tq12's rationale; the broadcast vocab join sidesteps
    // the "every doc contains 'the'" key skew
    def toks = Tables.fanOut(spark, Tables.documents(spark, dir))
      .select($"doc_id", $"lang",
        explode(filter(split(lower($"text"), "\\s+"), t => t =!= ""))
          .as("tok"))
    val vocab = toks.groupBy($"tok").agg(count(lit(1)).as("c")).cache()
    val tot = vocab.agg(sum($"c").cast("double").as("n"))
    val wt = vocab.crossJoin(broadcast(tot))
      .select($"tok", round(log($"c" / $"n"), 9).as("w"))
    // skinny (doc_id, lang, lp) frame — doc-count-sized, not token-sized;
    // cached because both the selection pass and the bucket pass read it
    val doc = toks.join(broadcast(wt), Seq("tok"))
      .groupBy($"doc_id", $"lang")
      .agg((sum($"w".cast(DecimalType(25, 9))).cast("double") /
        count(lit(1))).as("lp"))
      .cache()
    val th = graft.operators.ExactPercentile
      .quantiles(doc.select($"lang", $"lp"), "lang", "lp",
        Seq(1.0 / 3, 2.0 / 3), Seq("t1", "t2"))
      .select($"lang", round($"t1", 6).as("t1"), round($"t2", 6).as("t2"))
    doc.join(broadcast(th), Seq("lang"))
      .withColumn("bucket",
        when($"lp" >= $"t2", "head")
          .when($"lp" >= $"t1", "middle")
          .otherwise("tail"))
      .groupBy($"lang", $"bucket")
      .agg(count(lit(1)).as("n_docs"),
        round(avg($"lp"), 6).as("avg_lp"),
        round(min($"lp"), 6).as("min_lp"),
        round(max($"lp"), 6).as("max_lp"))
      .orderBy($"lang", $"bucket")
  }

  /** Image RESIZE, END TO END REAL (the vision-preprocessing step every
    * image tower needs — arbitrary corpus dims → fixed model input): per
    * document, encode a solid-gray PNG at closed-form dims, bilinear-
    * resize it to 8×8 with the real JDK Graphics2D path
    * (multimodal/Decode.resizeImage), then DECODE BOTH payloads on the
    * executors and emit the decoded original dims next to the decoded
    * resized dims + gray. Solid-color images resize to the same color
    * exactly (interpolation of equal values), so the oracle recomputes
    * everything in closed form — a hash match proves the decode →
    * resize → re-encode → decode chain end to end. Map-only, one scan,
    * sampled frames of work per row. */
  val tq35ImageResize: QueryDef = sqlChecked(
    "tq35_image_resize",
    """SELECT doc_id,
      |  CAST(doc_id % 24 + 8 AS INT) AS orig_w,
      |  CAST(doc_id % 16 + 8 AS INT) AS orig_h,
      |  8 AS width, 8 AS height,
      |  CAST(n_chars % 256 AS INT) AS gray
      |FROM documents WHERE doc_id < 200 ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 200)
      .select($"doc_id",
        ($"doc_id" % 24 + 8).cast("int").as("w"),
        ($"doc_id" % 16 + 8).cast("int").as("h"),
        ($"n_chars" % 256).cast("int").as("g"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions(_.map { case (id, w, h, g) =>
        val orig = Decode.ImageCodec.encodeGray(w, h, g)
        val resized = Decode.resizeImage(orig, 8, 8)
          .getOrElse(Array.emptyByteArray)
        val of = Decode.ImageCodec.decode(Decode.Asset(id, orig, "image"))
        val rf = Decode.ImageCodec.decode(Decode.Asset(id, resized, "image"))
        (id, of.width, of.height, rf.width, rf.height,
          Math.round(rf.brightness * 255).toInt)
      })
      .toDF("doc_id", "orig_w", "orig_h", "width", "height", "gray")
      .orderBy($"doc_id")
  }

  /** Uniform FRAME SAMPLING, END TO END REAL (a video tower ingests k
    * frames spread across the clip, never all of them): per document,
    * encode an animated GIF whose frame j is solid gray (g + 17·j) % 256,
    * sample k=3 frames on the round(i·(n−1)/(k−1)) lattice decoding ONLY
    * those frames (multimodal/Decode.sampleFrames), and emit one row per
    * sampled frame with its decoded luminance. The oracle joins a
    * literal nf → sampled-index lattice and recomputes each frame's gray
    * arithmetically — hash match proves index selection AND per-frame
    * decode. */
  /** Perceptual image NEAR-duplicate detection — the content-level image
    * dedup a training pipeline needs where dq01's byte digests see
    * nothing (a resize or JPEG re-encode changes every byte but not the
    * picture). Per document id, a DISTINCT deterministic smooth random
    * field is encoded ([[graft.multimodal.PHash.encodePattern]], seeded
    * by id — broad low-frequency spectra, the natural-image shape pHash
    * is built for); every 3rd image gains a bilinear-RESIZED variant
    * (64×48 → 44×34, tq35's real JDK path) and every 5th a lossy JPEG
    * re-encode — the planted ground truth, keyed by shared orig_id.
    * DCT pHash fingerprints every asset map-side; candidates come ONLY
    * from dq04's Hamming-band equi-join (8 bands × 8 bits — pigeonhole-
    * complete for d ≤ 7, never all-pairs); verification is one
    * bit_count(xor) per candidate at the same d ≤ 7 threshold. The row
    * is the planted proof: every same-orig pair found, zero cross-
    * pattern false positives, max within-group Hamming reported.
    *
    * 100 TB: hash+encode are map-only per asset; the shuffle carries
    * (asset_id, 8-byte hash) band keys; verification touches candidate
    * pairs only. rowsOnly: JDK raster/JPEG bytes are not reproducible in
    * SQL; the planted proof + PHashSpec's Hamming properties are the
    * check. */
  val tq43ImagePhashNearDup: QueryDef = rowsOnly("tq43_image_phash_neardup") { (spark, dir) =>
    import spark.implicits._
    val hashed = Tables.documents(spark, dir)
      .filter($"doc_id" < 180).select($"doc_id").as[Long]
      .mapPartitions(_.flatMap { id =>
        val orig = PHash.encodePattern(64, 48, seed = id)
        val variants =
          Seq((id, orig)) ++
            (if (id % 3 == 0)
              Decode.resizeImage(orig, 44, 34).map(p => (id + 100000L, p))
            else None) ++
            (if (id % 5 == 0)
              Some((id + 200000L, PHash.encodePattern(64, 48, seed = id, "jpg")))
            else None)
        variants.flatMap { case (aid, p) =>
          PHash.phash(p).map(h => (aid, id, h))
        }
      }).toDF("asset_id", "orig_id", "fp")
      .cache()
    bandNearDupSummary(hashed)
  }

  /** Shared planted-proof summary for a 64-bit perceptual-fingerprint
    * frame (asset_id, orig_id, fp): dq04's Hamming-band equi-join
    * (8 bands × 8 bits — pigeonhole-complete for d ≤ 7), bit_count(xor)
    * verification at the same threshold, and the expected/found/false-
    * positive accounting keyed on shared orig_id. Used by tq43 (image
    * pHash) and tq45 (audio energy fingerprint) — same machinery, two
    * modalities. */
  private def bandNearDupSummary(
      hashed: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import hashed.sparkSession.implicits._
    val banded = hashed.select($"asset_id", $"orig_id", $"fp",
      explode(array((0 until PHash.Bands).map(b =>
        struct(lit(b).as("band"),
          shiftright($"fp", b * PHash.BandBits).bitwiseAND(lit(255L))
            .as("bits"))): _*)).as("bk"))
      .select($"asset_id", $"orig_id", $"fp", $"bk.band", $"bk.bits")
    val cand = banded.as("a")
      .join(banded.as("b"),
        $"a.band" === $"b.band" && $"a.bits" === $"b.bits" &&
          $"a.asset_id" < $"b.asset_id")
      .select($"a.asset_id".as("ida"), $"b.asset_id".as("idb"),
        $"a.orig_id".as("oa"), $"b.orig_id".as("ob"),
        $"a.fp".as("ha"), $"b.fp".as("hb"))
      .distinct()
    val verified = cand
      .withColumn("d", bit_count($"ha".bitwiseXOR($"hb")))
      .filter($"d" <= PHash.MaxHamming)
      .cache()
    val expected = hashed.groupBy($"orig_id").agg(count(lit(1)).as("g"))
      .agg(sum(($"g" * ($"g" - 1)).cast("long") / 2).cast("long")
        .as("n_dup_pairs_expected"))
    val candN = cand.agg(count(lit(1)).as("n_candidate_pairs"))
    hashed.agg(count(lit(1)).as("n_assets"))
      .crossJoin(broadcast(expected))
      .crossJoin(broadcast(candN))
      .crossJoin(broadcast(verified.agg(
        count(lit(1)).as("n_verified_pairs"),
        count(when($"oa" === $"ob", 1)).as("n_true_found"),
        count(when($"oa" =!= $"ob", 1)).as("n_false_positives"),
        max(when($"oa" === $"ob", $"d")).as("max_true_hamming"))))
  }

  /** Perceptual AUDIO near-duplicate detection — tq43's machinery on the
    * second continuous modality: per document id a DISTINCT seeded
    * multi-segment clip ([[graft.multimodal.AudioFp.encodeClip]] —
    * varying amplitude and period, so both halves of the fingerprint
    * carry signal); every 3rd clip gains a RE-MASTERED variant (gain
    * 0.55× — every PCM sample changes, byte digests see a new file) and
    * every 5th a header re-encode at a different declared sample rate.
    * The energy-delta + zero-crossing-delta fingerprint is gain-
    * invariant by construction, the band join finds every planted pair,
    * and the row proves it (expected = found, zero false positives).
    * rowsOnly: javax.sound PCM decode is not reproducible in SQL;
    * AudioFpSpec holds the invariance/separation properties. */
  val tq45AudioFpNearDup: QueryDef = rowsOnly("tq45_audio_fp_neardup") { (spark, dir) =>
    import spark.implicits._
    import graft.multimodal.AudioFp
    val hashed = Tables.documents(spark, dir)
      .filter($"doc_id" < 180).select($"doc_id").as[Long]
      .mapPartitions(_.flatMap { id =>
        val variants =
          Seq((id, AudioFp.encodeClip(seed = id))) ++
            (if (id % 3 == 0)
              Some((id + 100000L, AudioFp.encodeClip(seed = id, gain = 0.55)))
            else None) ++
            (if (id % 5 == 0)
              Some((id + 200000L, AudioFp.encodeClip(seed = id, sampleRate = 16000)))
            else None)
        variants.flatMap { case (aid, p) =>
          AudioFp.fingerprint(p).map(h => (aid, id, h))
        }
      }).toDF("asset_id", "orig_id", "fp")
      .cache()
    bandNearDupSummary(hashed)
  }

  /** DuckDB replay of the band-join verdict stage over a persisted
    * fingerprint frame — (fp >> 8b) & 255 band keys are shift-mode
    * independent under the mask, xor/bit_count are exact, so the whole
    * candidate-generation + verification + accounting pipeline is
    * portable once the (engine-side, non-SQL) fingerprints are on disk. */
  private def bandVerdictSql(path: String): String =
    s"""WITH fp AS (SELECT asset_id, orig_id, fp
       |  FROM read_parquet('$path/*.parquet')),
       |banded AS (SELECT asset_id, orig_id, fp, b, (fp >> (b * 8)) & 255 AS bits
       |  FROM fp, (SELECT unnest(range(0, ${PHash.Bands})) AS b)),
       |cand AS (SELECT DISTINCT a.asset_id AS ida, c.asset_id AS idb,
       |    a.orig_id AS oa, c.orig_id AS ob, a.fp AS ha, c.fp AS hb
       |  FROM banded a JOIN banded c
       |    ON a.b = c.b AND a.bits = c.bits AND a.asset_id < c.asset_id),
       |ver AS (SELECT *, bit_count(xor(ha, hb)) AS d FROM cand
       |  WHERE bit_count(xor(ha, hb)) <= ${PHash.MaxHamming}),
       |expd AS (SELECT CAST(SUM(g * (g - 1) // 2) AS BIGINT) AS n_dup_pairs_expected
       |  FROM (SELECT COUNT(*) AS g FROM fp GROUP BY orig_id))
       |SELECT
       |  (SELECT COUNT(*) FROM fp) AS n_assets,
       |  expd.n_dup_pairs_expected,
       |  (SELECT COUNT(*) FROM cand) AS n_candidate_pairs,
       |  (SELECT COUNT(*) FROM ver) AS n_verified_pairs,
       |  (SELECT COUNT(*) FROM ver WHERE oa = ob) AS n_true_found,
       |  (SELECT COUNT(*) FROM ver WHERE oa <> ob) AS n_false_positives,
       |  (SELECT MAX(CASE WHEN oa = ob THEN d END) FROM ver) AS max_true_hamming
       |FROM expd""".stripMargin

  /** tq43's verdict stage, ORACLE-CHECKED (the round-10 ask): the pHash
    * fingerprints — the only part SQL can't reproduce — are persisted as
    * a parquet frame at plan time, then BOTH engines run the identical
    * pipeline from that frame: 8×8-bit Hamming-band candidate join,
    * bit_count(xor) verification at d ≤ 7, planted-truth accounting.
    * A hash match upgrades the candidate generator, the verifier, and
    * the bookkeeping from "planted proof says it worked" to
    * independently replayed — only the DCT itself remains engine-side
    * (PHashSpec + tq43 hold that). Same persisted-artifact shape as a
    * production fingerprint store: dedup serving never re-decodes
    * images, it joins the stored 8-byte hashes. */
  // per-run unique store paths (r11 ADVICE: the old fixed /tmp path let
  // concurrent runs clobber each other); oracleDir survives JVM exit so
  // the driver's DuckDB pass can still read the frames
  private val tq43bStore = graft.util.Scratch.oracleDir("graft-tq43b-fp")
  private val tq45bStore = graft.util.Scratch.oracleDir("graft-tq45b-fp")

  val tq43bPhashVerdictReplay: QueryDef = sqlChecked(
    "tq43b_phash_verdict_replay",
    bandVerdictSql(tq43bStore)) { (spark, dir) =>
    import spark.implicits._
    val store = tq43bStore
    Tables.documents(spark, dir)
      .filter($"doc_id" < 180).select($"doc_id").as[Long]
      .mapPartitions(_.flatMap { id =>
        val orig = PHash.encodePattern(64, 48, seed = id)
        val variants =
          Seq((id, orig)) ++
            (if (id % 3 == 0)
              Decode.resizeImage(orig, 44, 34).map(p => (id + 100000L, p))
            else None) ++
            (if (id % 5 == 0)
              Some((id + 200000L, PHash.encodePattern(64, 48, seed = id, "jpg")))
            else None)
        variants.flatMap { case (aid, p) =>
          PHash.phash(p).map(h => (aid, id, h))
        }
      }).toDF("asset_id", "orig_id", "fp")
      .write.mode("overwrite").parquet(store)
    bandNearDupSummary(spark.read.parquet(store))
  }

  /** tq45's verdict stage, oracle-checked from the persisted audio
    * fingerprints — same replay as [[tq43bPhashVerdictReplay]], second
    * modality, proving the band machinery is modality-blind once the
    * 64-bit fingerprint contract is met. */
  val tq45bAudioVerdictReplay: QueryDef = sqlChecked(
    "tq45b_audio_verdict_replay",
    bandVerdictSql(tq45bStore)) { (spark, dir) =>
    import spark.implicits._
    import graft.multimodal.AudioFp
    val store = tq45bStore
    Tables.documents(spark, dir)
      .filter($"doc_id" < 180).select($"doc_id").as[Long]
      .mapPartitions(_.flatMap { id =>
        val variants =
          Seq((id, AudioFp.encodeClip(seed = id))) ++
            (if (id % 3 == 0)
              Some((id + 100000L, AudioFp.encodeClip(seed = id, gain = 0.55)))
            else None) ++
            (if (id % 5 == 0)
              Some((id + 200000L, AudioFp.encodeClip(seed = id, sampleRate = 16000)))
            else None)
        variants.flatMap { case (aid, p) =>
          AudioFp.fingerprint(p).map(h => (aid, id, h))
        }
      }).toDF("asset_id", "orig_id", "fp")
      .write.mode("overwrite").parquet(store)
    bandNearDupSummary(spark.read.parquet(store))
  }

  val tq36FrameSample: QueryDef = sqlChecked(
    "tq36_frame_sample",
    """WITH docs AS (
      |  SELECT doc_id, CAST(doc_id % 4 + 1 AS INT) AS nf,
      |    CAST(n_chars % 256 AS INT) AS g
      |  FROM documents WHERE doc_id < 120),
      |lattice(nf, idx) AS (VALUES
      |  (1, 0), (2, 0), (2, 1), (3, 0), (3, 1), (3, 2), (4, 0), (4, 2), (4, 3))
      |SELECT d.doc_id, CAST(l.idx AS INT) AS frame_idx,
      |  CAST((d.g + 17 * l.idx) % 256 AS INT) AS gray
      |FROM docs d JOIN lattice l ON d.nf = l.nf
      |ORDER BY d.doc_id, frame_idx""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"doc_id" < 120)
      .select($"doc_id",
        ($"doc_id" % 4 + 1).cast("int").as("nf"),
        ($"n_chars" % 256).cast("int").as("g"))
      .as[(Long, Int, Int)]
      .flatMap { case (id, nf, g) =>
        val gif = Decode.VideoCodec.encodeFrames(
          4, 3, (0 until nf).map(j => (g + 17 * j) % 256))
        Decode.VideoCodec.sampleFrames(gif, 3).map { case (idx, lum) =>
          (id, idx, Math.round(lum * 255).toInt)
        }
      }
      .toDF("doc_id", "frame_idx", "gray")
      .orderBy($"doc_id", $"frame_idx")
  }

  /** Zipf-law fit per language: OLS slope of log10(freq) on log10(rank)
    * over each language's top-100 tokens — the standard sanity check
    * that a corpus (or a synthetic one) has natural-language token
    * statistics (Zipf 1949: slope ≈ −1; strong deviation flags
    * boilerplate floods or template-generated text). Everything that
    * feeds the fit is exact: integer counts, integer ranks with a
    * (cnt DESC, tok) total-order tie-break, logs rounded once to 9 dp
    * (pq05's ulp shield) into DECIMAL(12,9), and all OLS moments
    * (Σx, Σy, Σxy, Σx²) as exact decimal sums with width-managed casts —
    * the only doubles are the two final divisions, identical expression
    * trees in both engines.
    *
    * 100 TB: token counting is the map-side-combine groupBy every corpus
    * stat uses; the fit itself runs on ≤100 rows per language. */
  val tq41ZipfSlope: QueryDef = sqlChecked(
    "tq41_zipf_slope",
    """WITH toks AS (
      |  SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS tok
      |  FROM documents),
      |c AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS cnt
      |      FROM toks GROUP BY lang, tok),
      |r AS (SELECT lang, cnt,
      |        ROW_NUMBER() OVER (PARTITION BY lang ORDER BY cnt DESC, tok) AS rank
      |      FROM c),
      |pts AS (
      |  SELECT lang,
      |    CAST(round(log10(CAST(rank AS DOUBLE)), 9) AS DECIMAL(12,9)) AS x,
      |    CAST(round(log10(CAST(cnt AS DOUBLE)), 9) AS DECIMAL(12,9)) AS y
      |  FROM r WHERE rank <= 100),
      |mo AS (
      |  SELECT lang, COUNT(*) AS n_fit,
      |    CAST(SUM(x) AS DECIMAL(13,9)) AS sx,
      |    CAST(SUM(y) AS DECIMAL(13,9)) AS sy,
      |    CAST(SUM(x * y) AS DECIMAL(22,18)) AS sxy,
      |    CAST(SUM(x * x) AS DECIMAL(22,18)) AS sxx
      |  FROM pts GROUP BY lang)
      |SELECT lang, n_fit,
      |  round(CAST(CAST(n_fit AS DECIMAL(4,0)) * sxy - sx * sy AS DOUBLE)
      |    / CAST(CAST(n_fit AS DECIMAL(4,0)) * sxx - sx * sx AS DOUBLE), 6)
      |    AS zipf_slope,
      |  round((CAST(sy AS DOUBLE)
      |      - (CAST(CAST(n_fit AS DECIMAL(4,0)) * sxy - sx * sy AS DOUBLE)
      |         / CAST(CAST(n_fit AS DECIMAL(4,0)) * sxx - sx * sx AS DOUBLE))
      |        * CAST(sx AS DOUBLE)) / n_fit, 6) AS zipf_intercept
      |FROM mo ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val D9 = DecimalType(12, 9)
    val c = Tables.documents(spark, dir)
      .select($"lang", explode(split(lower($"text"), "\\s+")).as("tok"))
      .groupBy($"lang", $"tok").agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy($"lang").orderBy($"cnt".desc, $"tok")
    val pts = c.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 100)
      .select($"lang",
        round(log10($"rank".cast("double")), 9).cast(D9).as("x"),
        round(log10($"cnt".cast("double")), 9).cast(D9).as("y"))
    val mo = pts.groupBy($"lang").agg(
      count(lit(1)).as("n_fit"),
      sum($"x").cast(DecimalType(13, 9)).as("sx"),
      sum($"y").cast(DecimalType(13, 9)).as("sy"),
      sum($"x" * $"y").cast(DecimalType(22, 18)).as("sxy"),
      sum($"x" * $"x").cast(DecimalType(22, 18)).as("sxx"))
    val nDec = $"n_fit".cast(DecimalType(4, 0))
    val num = (nDec * $"sxy" - $"sx" * $"sy").cast("double")
    val den = (nDec * $"sxx" - $"sx" * $"sx").cast("double")
    val slopeRaw = num / den
    mo.select($"lang", $"n_fit",
        round(slopeRaw, 6).as("zipf_slope"),
        round(($"sy".cast("double") - slopeRaw * $"sx".cast("double")) / $"n_fit", 6)
          .as("zipf_intercept"))
      .orderBy($"lang")
  }

  /** Interpolated Kneser–Ney bigram probabilities (Kneser & Ney 1995;
    * Chen & Goodman 1999's interpolated form, fixed discount d=0.75) —
    * the smoothing every serious count-based LM uses, built from the
    * three count families a distributed LM pipeline aggregates anyway:
    * bigram counts c(v,w), left-context fanouts N1+(v·), and the
    * CONTINUATION counts N1+(·w) that replace raw unigram frequency
    * (the insight that makes KN work: "Francisco" is frequent but only
    * ever follows "San"). Evaluated for the corpus's top-20 bigrams
    * with the MLE ridealong, so the smoothing's effect is in the hash.
    * Every input is an exact integer count; the probability arithmetic
    * is an identical expression tree in both engines rounded once to
    * 9 dp (the tq15/PMI shield).
    *
    * 100 TB: the three count tables are vocab-bounded aggregates with
    * map-side partials; evaluation touches a bounded bigram set. */
  val tq42KneserNey: QueryDef = sqlChecked(
    "tq42_kneser_ney",
    """WITH toks AS (
      |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS w
      |  FROM documents),
      |bg AS (
      |  SELECT w[i] AS v, w[i+1] AS nw
      |  FROM (SELECT w, unnest(range(1, len(w))) AS i FROM toks)),
      |cvw AS (SELECT v, nw, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY v, nw),
      |cv AS (SELECT v, CAST(SUM(c) AS BIGINT) AS cv,
      |         CAST(COUNT(*) AS BIGINT) AS fanout FROM cvw GROUP BY v),
      |cont AS (SELECT nw, CAST(COUNT(*) AS BIGINT) AS n1w FROM cvw GROUP BY nw),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bigram_types FROM cvw),
      |top AS (
      |  SELECT v, nw, c FROM cvw
      |  ORDER BY c DESC, v, nw LIMIT 20)
      |SELECT t.v, t.nw, t.c AS c_vw,
      |  round((t.c - CAST(0.75 AS DOUBLE)) / cv.cv
      |    + (CAST(0.75 AS DOUBLE) * cv.fanout / cv.cv)
      |      * (CAST(cont.n1w AS DOUBLE) / tot.n_bigram_types),
      |    9) AS p_kn,
      |  round(CAST(t.c AS DOUBLE) / cv.cv, 9) AS p_mle
      |FROM top t
      |JOIN cv ON t.v = cv.v
      |JOIN cont ON t.nw = cont.nw
      |CROSS JOIN tot
      |ORDER BY c_vw DESC, t.v, t.nw""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val toks = Tables.documents(spark, dir)
      .select(split(lower($"text"), "\\s+").as("w"))
    // in-row adjacent pairs via zip of the array with its own tail —
    // stays codegen, no posexplode self-join
    val bg = toks
      .select(explode(zip_with($"w", slice($"w", 2, 1000000),
        (a, b) => struct(a.as("v"), b.as("nw")))).as("p"))
      .filter($"p.nw".isNotNull)
      .select($"p.v".as("v"), $"p.nw".as("nw"))
    val cvw = bg.groupBy($"v", $"nw").agg(count(lit(1)).as("c")).cache()
    val cv = cvw.groupBy($"v")
      .agg(sum($"c").cast("long").as("cv"), count(lit(1)).as("fanout"))
    val cont = cvw.groupBy($"nw").agg(count(lit(1)).as("n1w"))
    val tot = cvw.agg(count(lit(1)).as("n_bigram_types"))
    val top = cvw.orderBy($"c".desc, $"v", $"nw").limit(20)
    top
      .join(cv, Seq("v"))
      .join(cont, Seq("nw"))
      .crossJoin(broadcast(tot))
      .select($"v", $"nw", $"c".as("c_vw"),
        round(($"c" - 0.75) / $"cv"
          + (lit(0.75) * $"fanout" / $"cv") *
            ($"n1w".cast("double") / $"n_bigram_types"), 9).as("p_kn"),
        round($"c".cast("double") / $"cv", 9).as("p_mle"))
      .orderBy($"c_vw".desc, $"v", $"nw")
  }

  val all: Seq[QueryDef] = Seq(
    tq01CorpusStats, tq02TokenCounts, tq03LanguageId, tq04QualityScore,
    tq05Fingerprints, tq06MultimodalDecode, tq07MultimodalStats,
    tq08StratifiedSample, tq08bStratifiedPortable, tq09DeterministicSample,
    tq10BpeTokenCounts, tq11TokenPacking, tq12UnigramLogprob,
    tq13ContextChunks, tq14GlobalShuffle, tq15BigramPmi, tq16CdcBoundaries,
    tq17BigramLogprob, tq18VocabGrowth, tq20WeightedSample,
    tq21CompressionRatio, tq21bDeflatePortable, tq22AudioDecode, tq23VideoDecode, tq24Mp4Probe,
    tq25WebmProbe, tq26Mp4Bitrate, tq27WebmBitrate, tq28SourceOverlap,
    tq33PerplexityBuckets, tq35ImageResize, tq36FrameSample,
    tq43ImagePhashNearDup, tq45AudioFpNearDup,
    tq43bPhashVerdictReplay, tq45bAudioVerdictReplay, tq41ZipfSlope,
    tq42KneserNey)
}

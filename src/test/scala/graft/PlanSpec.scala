package graft

import graft.queries._
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan assertions for the scale-critical properties: predicate
  * pushdown into parquet scans, column pruning, broadcast joins for dims,
  * and the no-all-pairs guarantee for dedup/similarity. These are the
  * checks a 100 TB deployment lives or dies by; asserting them in CI stops
  * a refactor from silently regressing a plan.
  */
class PlanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(q: QueryDef): String =
    q.fn(spark, dir).queryExecution.explainString(ExplainMode.fromString("formatted"))

  test("q01: shipdate range predicate reaches the parquet scan (PushedFilters)") {
    val p = plan(Relational.q01PricingSummary)
    assert(p.contains("PushedFilters"), p.take(500))
    assert(p.contains("LessThanOrEqual(l_shipdate"), "filter not pushed:\n" + p)
  }

  test("q01: column pruning — scan reads only the 7 needed lineitem columns") {
    val p = plan(Relational.q01PricingSummary)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_returnflag") && readSchema.contains("l_quantity"))
    assert(!readSchema.contains("l_partkey") && !readSchema.contains("l_suppkey"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("q03: all four dimension joins broadcast; no sort-merge of dims") {
    val p = plan(Relational.q03StarJoinRevenue)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 3, s"expected >=3 broadcast joins, got $broadcasts:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q07: partition-key predicate sits below the window (pushed to scan)") {
    val p = plan(Relational.q07WindowTopkPerGroup)
    assert(p.contains("LessThan(o_custkey,200)"), "o_custkey filter not pushed:\n" + p)
  }

  test("q19: global top-K plans TakeOrderedAndProject, not a full sort") {
    val p = plan(Relational.q19TopkGlobal)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("dedup and similarity candidate generation never plans CartesianProduct") {
    for (q <- Seq(DedupQueries.dq03MinhashLsh, DedupQueries.dq05NgramJaccard,
        DedupQueries.dq07Decontaminate, SimilarityQueries.sq02AnnLshRecall)) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"${q.name} plans a cartesian product")
    }
  }

  test("sq01: brute-force KNN broadcasts the bounded QUERY side, streams the corpus") {
    val p = plan(SimilarityQueries.sq01KnnBruteForce)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(p.contains("BuildLeft"), "query set (left) must be the broadcast build side:\n" + p)
    assert(!p.contains("CartesianProduct"))
  }

  test("jq04: the regex-ETL plan stays small (optimizer barrier holds)") {
    val p = plan(JobEtlQueries.jq04FlagFeatures)
    assert(p.length < 100000,
      s"ETL plan blew up to ${p.length} chars — barrier regressed (see graft.util.Barrier)")
  }

  test("eq01: as-of join shuffles exactly once (union+window, no join node)") {
    val p = plan(TemporalQueries.eq01AsofJoin)
    // the final orderBy adds a range-partitioning exchange; the operator
    // itself must contribute exactly ONE hash-partitioning exchange (plus
    // the click-dedup aggregate's — both hash on user_id and Spark reuses
    // the partitioning, so hashpartitioning exchanges stay <= 2)
    val hashEx = "\\(\\d+\\) Exchange".r.findAllIn(p)
      .size
    assert(hashEx <= 3, s"as-of join plans $hashEx exchanges:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "as-of should be window-composed, not a join node")
  }

  test("q22: the derived nation-average aggregate broadcasts back onto customer") {
    val p = plan(Relational.q22JoinOnAggregate)
    assert(p.contains("BroadcastHashJoin"),
      "aggregated dim should broadcast, not shuffle the fact side:\n" + p)
  }

  test("q12: set-op counts are computed in a single scan of orders") {
    val p = plan(Relational.q12SetOps)
    // formatted mode prints each node twice (tree + detail); count the
    // "(n) Scan parquet" detail headers only
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 orders scan, got $scans")
  }

  test("q27: all six window functions share one partitioning (<=2 exchanges incl. final sort)") {
    val p = plan(Relational.q27WindowBattery)
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"window battery plans $exchanges exchanges:\n$p")
    assert(p.contains("PushedFilters"), "custkey predicate should reach the scan")
  }

  test("q28: arg-min/max is a pure hash aggregate — no window, one scan") {
    val p = plan(Relational.q28ArgMinMax)
    assert(!p.contains("() Window") && !"\\(\\d+\\) Window".r.findFirstIn(p).isDefined,
      "max_by/min_by should not plan a window:\n" + p)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 orders scan, got $scans")
  }

  test("q24: exact percentile never buffers groups in an ObjectHashAggregate") {
    val p = plan(Relational.q24Percentiles)
    assert(!p.contains("percentile"),
      "q24 must use the distributed ExactPercentile operator, not the buffering aggregate:\n" + p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "histogram/locate joins must broadcast:\n" + p)
  }

  test("kq01: bitmap distinct is a mergeable partial aggregate — no count-distinct Expand") {
    val p = plan(SketchQueries.kq01BitmapDistinct)
    assert(p.contains("partial_bitmap_construct_agg"),
      "bitmap partial aggregation missing:\n" + p)
    assert(!p.contains("Expand"),
      "sketch path must avoid the count-distinct Expand rewrite:\n" + p)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 orders scan, got $scans")
  }

  test("q32: correlated LATERAL decorrelates to a hash join, never a per-row subquery") {
    val p = plan(RelationalExt.q32LateralTopK)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "lateral subquery did not decorrelate:\n" + p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      "expected the decorrelated equi-join:\n" + p)
  }

  test("fq01-fq03: filter battery stays in-row — one scan, no Generate, no join") {
    for (q <- Seq(FilterQueries.fq01TermRedaction, FilterQueries.fq02FilterFunnel,
        FilterQueries.fq03Repetition)) {
      val p = plan(q)
      assert(!p.contains("Generate"),
        s"${q.name}: token arrays must not explode to row space:\n$p")
      val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
      assert(scans == 1, s"${q.name}: expected 1 documents scan, got $scans")
      assert(!p.contains("Join"), s"${q.name}: single-scan shape lost:\n$p")
    }
  }

  test("fq04: mixing weights/budget/fractions all broadcast onto the corpus scan") {
    val p = plan(FilterQueries.fq04CorpusMixing)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"),
      "per-lang fraction frame must broadcast, not shuffle the corpus:\n" + p)
    // corpus is read twice by design (availability counts + sampled draw);
    // anything more means a frame was recomputed
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"expected <=2 documents scans, got $scans")
  }

  test("q37: posexplode pushes the doc_id filter below the Generate") {
    val p = plan(RelationalExt.q37Posexplode)
    assert(p.contains("Generate"), "posexplode should plan a Generate:\n" + p)
    assert(p.contains("LessThan(doc_id,20)"),
      "doc_id filter must reach the scan, not sit above the explode:\n" + p)
  }

  test("q38: JSON round-trip is one events scan, fully in-row until the aggregate") {
    val p = plan(RelationalExt.q38JsonRoundtrip)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 events scan, got $scans")
    assert(!p.contains("Generate") && !p.contains("Join"), p)
  }

  test("dq07b: Bloom probe filters the corpus BELOW the confirm join") {
    val p = plan(DedupQueries.dq07bDecontaminateBloom)
    assert(!p.contains("CartesianProduct"), p)
    // the membership probe is a NATIVE codegen'd expression (r5 advice
    // replaced the scala UDF) appearing as a Filter condition — map-side,
    // ahead of the join: that is the 100 TB point of dq07b
    assert(!p.contains("UDF"), "plan must be ScalaUDF-free:\n" + p)
    assert(p.linesIterator.exists(l =>
      l.contains("Condition") && l.contains("graft_bloom_probe")),
      "Bloom probe is not a Filter condition:\n" + p)
  }

  test("tq12: token->vocab join broadcasts the vocab (stopword skew shield)") {
    val p = plan(TextQueries.tq12UnigramLogprob)
    assert(p.contains("BroadcastHashJoin"), "vocab must broadcast:\n" + p)
    assert(!p.contains("SortMergeJoin"),
      "a shuffle join on tok puts every stopword on one executor:\n" + p)
  }

  test("tq13: chunking is map-only — one scan, no join, no shuffle before output sort") {
    val p = plan(TextQueries.tq13ContextChunks)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 documents scan, got $scans")
    assert(!p.contains("Join"), p)
    assert(p.contains("Generate"), "chunk explode should plan a Generate:\n" + p)
    // only exchange allowed is the rangepartitioning for the final sort
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 1, s"chunking must not shuffle before the output sort:\n$p")
  }

  test("sq06: quantization stays in-row — no Generate, no join, one scan") {
    val p = plan(SimilarityQueries.sq06Int8Quantization)
    assert(!p.contains("Generate"),
      "array transforms must not explode 64-dim vectors to row space:\n" + p)
    assert(!p.contains("Join"), p)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 embeddings scan, got $scans")
  }

  test("eq05: keyless interval overlap joins on quantized buckets — never a nested loop") {
    val p = plan(TemporalQueries.eq05IntervalOverlap)
    assert(!p.contains("CartesianProduct"),
      "overlap join degenerated to all-pairs:\n" + p)
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "overlap join must be the bucket EQUI-join, not a range nested loop:\n" + p)
  }

  test("tq08b/fq05/tq16: sampling, PII scrub, CDC chunking stay in-row — one scan, no join") {
    for (q <- Seq(TextQueries.tq08bStratifiedPortable, FilterQueries.fq05PiiScrub,
        TextQueries.tq16CdcBoundaries)) {
      val p = plan(q)
      assert(!p.contains("Generate"), s"${q.name}: must not explode to row space:\n$p")
      assert(!p.contains("Join"), s"${q.name}: single-scan shape lost:\n$p")
      val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
      assert(scans == 1, s"${q.name}: expected 1 documents scan, got $scans")
    }
  }

  test("tq14: shuffle-by-shard is one scan, one hash exchange on shard (no global sort)") {
    val p = plan(TextQueries.tq14GlobalShuffle)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 documents scan, got $scans")
    assert(p.contains("hashpartitioning(shard"),
      "shard rank must hash-partition on the shard column:\n" + p)
    // window hash exchange + final output sort range exchange, nothing more
    val exchanges = "\\(\\d+\\) Exchange".r.findAllIn(p).size
    assert(exchanges <= 2, s"expected <=2 exchanges, got $exchanges:\n$p")
  }

  test("dq10: passage dedup shuffles 32-byte digests, not passage bodies") {
    val p = plan(DedupQueries.dq10PassageDedup)
    assert(p.contains("hashpartitioning(fp"),
      "dedup window must partition on the sha256 digest column:\n" + p)
    // column pruning must drop the passage text before the exchange: the
    // exchange input projection carries the digest, lang, and order keys
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 documents scan, got $scans")
    assert(!p.contains("Join"), p)
  }

  test("tq15: PMI joins run over cached vocab-sized frames — corpus scanned at most twice") {
    val p = plan(TextQueries.tq15BigramPmi)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"corpus must be scanned <=2 times (uni+bi), got $scans:\n$p")
    assert(p.contains("InMemoryTableScan") || p.contains("InMemoryRelation"),
      "count frames must be cached (no cross-branch CSE in Spark):\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q33: higher-order functions stay in-row — no Generate, pushed filter, one scan") {
    val p = plan(RelationalExt.q33HofBattery)
    assert(!p.contains("Generate"), "HOFs must not explode to row space:\n" + p)
    assert(p.contains("LessThan(doc_id,200)"), "doc_id filter not pushed:\n" + p)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 documents scan, got $scans")
  }

  test("eq06/eq07: funnel and cohort stages stay keyed on user_id — no dim-table sort-merge surprises") {
    for (q <- Seq(TemporalQueries.eq06EventFunnel, TemporalQueries.eq07CohortRetention)) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"${q.name}:\n$p")
    }
  }

  test("eq08: the per-type moment frame joins back via broadcast, not a shuffle of daily counts") {
    val p = plan(TemporalQueries.eq08DailyAnomaly)
    assert(p.contains("BroadcastHashJoin"), "stats frame must broadcast:\n" + p)
  }

  test("eq09: calendar bounds broadcast; the grid is a Generate explode, not a join blow-up") {
    val p = plan(TemporalQueries.eq09GapFill)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "1-row bounds must broadcast:\n" + p)
    assert(p.contains("Generate"), "grid must come from sequence+explode:\n" + p)
    assert(!p.contains("CartesianProduct"))
  }

  test("eq10: RANGE-interval frame (value bounds), single window pass") {
    val p = plan(TemporalQueries.eq10MovingWindow)
    assert(p.contains("RangeFrame") || p.toLowerCase.contains("rangebetween"),
      "moving window must use a RANGE frame:\n" + p)
    val windows = "\\(\\d+\\) Window".r.findAllIn(p).size
    assert(windows == 1, s"expected 1 window operator, got $windows")
  }

  test("fq06: NFC normalization is map-only — one scan, pushed residual, no shuffle before sort") {
    val p = plan(FilterQueries.fq06NfcNormalize)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 documents scan, got $scans")
    assert(!p.contains("Generate") && !p.contains("Join"), "must stay in-row:\n" + p)
  }

  test("sq07: BM25 query terms + corpus moments broadcast; posting join never sort-merges the query side") {
    val p = plan(RetrievalQueries.sq07Bm25TopK)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size +
      "BroadcastNestedLoopJoin".r.findAllIn(p).size
    assert(broadcasts >= 2, s"query side and stats must broadcast, got $broadcasts:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q39: winsorize thresholds broadcast back onto the fact scan") {
    val p = plan(RelationalExt.q39Winsorize)
    assert(p.contains("BroadcastHashJoin"), "threshold frame must broadcast:\n" + p)
    assert(!p.contains("CartesianProduct"))
  }

  test("tq17: unigram vocab and context totals broadcast; only the bigram model table hash-joins") {
    val p = plan(TextQueries.tq17BigramLogprob)
    val broadcasts = "BroadcastHashJoin".r.findAllIn(p).size
    assert(broadcasts >= 2, s"vocab/context joins must broadcast, got $broadcasts:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("dq11/sq08/eq11/eq12: fuzzy join, phrase search, SCD2 paths never plan a cartesian or nested loop over data") {
    for (q <- Seq(DedupQueries.dq11FuzzyJoin, RetrievalQueries.sq08PhraseSearch,
        TemporalQueries.eq11Scd2Versions, TemporalQueries.eq12PitJoin)) {
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"${q.name} plans a cartesian:\n$p")
    }
    // the PIT interval join must ride its user_id equi-key, not a nested loop
    val pit = plan(TemporalQueries.eq12PitJoin)
    assert(!pit.contains("BroadcastNestedLoopJoin"),
      "interval predicate must be a post-join filter on the hash join:\n" + pit)
  }

  test("tq20: weighted sampling is one scan ending in TakeOrderedAndProject") {
    val p = plan(TextQueries.tq20WeightedSample)
    assert(p.contains("TakeOrderedAndProject"), p)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 documents scan, got $scans")
  }

  test("tq21: compression scoring is map-only — one scan, no join") {
    val p = plan(TextQueries.tq21CompressionRatio)
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans == 1, s"expected 1 documents scan, got $scans")
    assert(!p.contains("Join"), "must stay in-row:\n" + p)
  }

  test("kq05/pq02: sketch-confirm and curriculum broadcast their tiny frames") {
    val kq = plan(SketchQueries.kq05HeavyHitters)
    assert(!kq.contains("CartesianProduct"))
    val pq = plan(PipelineQueries.pq02Curriculum)
    assert(pq.contains("BroadcastHashJoin") || pq.contains("BroadcastNestedLoopJoin"),
      "thresholds must broadcast:\n" + pq)
    assert(!pq.contains("CartesianProduct"))
  }

  test("tq18: vocab growth runs the running totals over the 10-row summary, not the corpus") {
    val p = plan(TextQueries.tq18VocabGrowth)
    // the window must sit ABOVE both aggregates: no Generate between the
    // window and the result (the explode happens below the aggregations)
    val afterWindow = p.substring(0, p.indexOf("Window"))
    assert(p.contains("Window"), p)
    assert(!afterWindow.contains("Generate"),
      "window must consume the slice summary, not exploded tokens:\n" + p)
  }

  test("multimodal decode queries are map-only: one scan, no join, no UDF") {
    for (q <- Seq(TextQueries.tq06MultimodalDecode, TextQueries.tq22AudioDecode,
        TextQueries.tq23VideoDecode, TextQueries.tq24Mp4Probe)) {
      val p = plan(q)
      val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
      assert(scans == 1, s"${q.name}: expected 1 documents scan, got $scans")
      assert(!p.contains("Join"), s"${q.name}: decode must not join:\n" + p)
      // the codec runs inside mapPartitions/Dataset.map — a
      // SerializeFromObject stage, not a per-column ScalaUDF
      assert(!p.contains("ScalaUDF"), s"${q.name}: no UDFs in decode:\n" + p)
    }
  }

  test("sq09: PQ encode and ADC search stay UDF-free; code side never broadcasts raw vectors") {
    val p = plan(SimilarityQueries.sq09AnnPqRecall)
    assert(!p.contains("ScalaUDF"),
      "PQ encode/search must be pure column expressions:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
  }
}

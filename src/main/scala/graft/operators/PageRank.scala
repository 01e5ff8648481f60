package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PageRank in deterministic integer fixed-point — distributed iterative
  * graph centrality (the second graph operator next to
  * [[ConnectedComponents]]' fixpoint labeling).
  *
  * Why fixed-point integers: float PageRank sums neighbor contributions,
  * and float addition is not associative — the result depends on shuffle
  * partitioning, so two runs (or two engines) disagree in the last bits
  * and any rank-ordered tie flips nondeterministically. Representing rank
  * as BIGINT "rank units" (scale = `units`, default 1e12 ≙ picorank) makes
  * every operation exact integer arithmetic: contributions are
  * `((r DIV deg) * 85) DIV 100` (damping 0.85), the per-vertex merge is
  * an associative integer SUM, and the result is bit-identical on any
  * cluster layout — reproducible enough to hash-compare against an
  * independent engine, which tq19's DuckDB oracle does. Truncation mass
  * (≤ deg + 1 units per vertex per round) leaks out of the system rather
  * than redistributing; at 1e12 scale that perturbs ranks in the 12th
  * decimal — far below any ranking decision — and determinism is what a
  * production dedup/curation pipeline actually needs from centrality.
  *
  * Each round is one hash join (ranks ⋈ edges, both keyed by src — the
  * edge frame is cached and its partitioning reused) and one aggregate;
  * per-round frames are vertex-sized, cached and materialized so lineage
  * stays flat across iterations (the KMeans-style distributed loop, no
  * driver-side per-row work).
  */
object PageRank {

  /** @param edges two-column DIRECTED edge frame; callers wanting the
    *              undirected semantics union the reversed edges first.
    *              Duplicate edges are deduplicated. Sink vertices (ones
    *              appearing only as destinations) are first-class: they
    *              receive and hold inbound rank, and their outbound mass
    *              leaks out of the system each round (the same drop-not-
    *              redistribute choice the truncation units make) rather
    *              than teleporting — determinism over mass conservation.
    * @param iterations fixed round count (rank differences below the
    *              truncation floor make convergence tests meaningless in
    *              integer arithmetic; fixed rounds are also what an
    *              oracle can replay)
    * @param units fixed-point scale: initial total rank mass
    * @return (vertex, r) — final rank in integer units */
  def ranks(edges: DataFrame, iterations: Int,
      units: Long = 1000000000000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val Array(sc, dc) = edges.columns
    val e0 = edges.select(col(sc).as("src"), col(dc).as("dst"))
      .distinct().cache()
    // vertex set = src ∪ dst: a sink (dst-only) vertex must exist in the
    // output and keep the rank that flows into it — building verts from
    // src alone silently dropped sinks and their inbound mass (r5 ADVICE)
    val verts0 = e0.select($"src".as("vertex"))
      .union(e0.select($"dst".as("vertex"))).distinct().cache()
    val n = verts0.count()
    require(n > 0, "PageRank needs a non-empty graph")
    // vocab/dedup-sized graphs (the common case) don't amortize 32-task
    // stages × 10 rounds of scheduler overhead — collapse small graphs to
    // a single partition, same adaptive call the tiny-frame ML fits make;
    // big graphs keep the cluster layout
    val small = n < 100000
    val e = (if (small) e0.coalesce(1) else e0).cache()
    val verts = (if (small) verts0.coalesce(1) else verts0).cache()
    val deg = e.groupBy($"src").agg(count(lit(1)).as("deg")).cache()
    val r0 = units / n
    val base = (units * 15L / 100L) / n
    // localCheckpoint, not cache: cache short-circuits EXECUTION but the
    // logical plan still deepens by a join+agg every round, and analyzer/
    // optimizer cost compounds with depth (measured: ~3.7 s/round of pure
    // planning by round 10). localCheckpoint truncates lineage to the
    // materialized partitions, so every round plans against a flat scan.
    var ranks = verts.select($"vertex", lit(r0).as("r"))
      .localCheckpoint(eager = true)
    for (_ <- 1 to iterations) {
      val contribs = ranks.withColumnRenamed("vertex", "src")
        .join(deg, Seq("src"))
        .join(e, Seq("src"))
        .select($"dst".as("vertex"),
          expr("((r DIV deg) * 85) DIV 100").as("c"))
        .groupBy($"vertex")
        .agg(sum($"c").as("s"))
      // left join: a vertex with no inbound edges still holds base rank
      val next = verts.join(contribs, Seq("vertex"), "left")
        .select($"vertex", (lit(base) + coalesce($"s", lit(0L))).as("r"))
        .localCheckpoint(eager = true)
      ranks = next
    }
    ranks
  }
}

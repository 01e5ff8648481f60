package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components — the step AFTER near-dup detection: candidate
  * pairs say "a duplicates b"; components turn the pair list into
  * duplicate GROUPS so a keeper can be chosen per group (dedup
  * correctness requires the transitive closure — a~b and b~c must
  * collapse to ONE keeper even if a~c was never paired).
  *
  * Two engines, dispatched by graph shape:
  *
  * 1. '''Min-label propagation''' (the dedup fast path): every vertex
  *    takes the min label among itself and its neighbors; one broadcast
  *    join + one aggregate per round. Rounds needed = component
  *    diameter. Near-dup components are overwhelmingly tiny dense
  *    clusters (diameter ≤ ~3), so this converges in 2–4 rounds with a
  *    single shuffle each.
  * 2. '''Alternating large-star / small-star''' (Kiveris et al.,
  *    "Connected Components in MapReduce and Beyond", SoCC'14): each
  *    round rewires the edge set so component diameters collapse
  *    geometrically — O(log² n) rounds worst-case, ~log n in practice
  *    on paths — independent of the input diameter, and no per-round
  *    broadcast requirement. This is the 100×-scale path: adversarial
  *    long chains, giant components, or vertex sets too big to
  *    broadcast.
  *
  * [[components]] starts with min-label (when the label frame is
  * broadcastable) and, if the fixpoint is not reached within a few
  * rounds, ESCALATES to the alternating algorithm — seeded with the
  * partial labels already computed (label edges connect within-component
  * only, so the union graph has identical components). Nothing is
  * thrown away and nothing diameter-shaped can make the operator fail.
  */
object ConnectedComponents {

  /** Double-hop rounds of min-label propagation to attempt before
    * escalating to the alternating algorithm (each round propagates two
    * hops, so this covers diameter ≤ 16). Dedup graphs converge in ≤ 2
    * such rounds; anything still moving after 8 has a long-diameter
    * component that min-label would chase linearly. */
  private val EscalationRounds = 8

  /** @param pairs two-column frame of undirected edges (src, dst)
    * @param maxIterations fail-safe bound on ALTERNATING rounds (the
    *        algorithm needs O(log² n); exhausting it THROWS rather than
    *        silently returning unconverged labels — wrong components
    *        would make a dedup keeper-choice quietly keep duplicates
    * @return (vertex, component) — component = min vertex id reachable */
  def components(pairs: DataFrame, maxIterations: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val Array(srcCol, dstCol) = pairs.columns
    val edges = pairs
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(pairs.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .filter($"a" =!= $"b")
      .distinct()
      .cache() // reused every round; edge list ≪ corpus (near-dups only)
    // initial labels fold in the FIRST propagation hop for free: before
    // any round, every neighbor's label IS itself, so min(least(a, b))
    // per vertex equals one hop of propagation without a join
    var labels = edges.groupBy($"a".as("vertex"))
      .agg(min(least($"a", $"b")).as("component"))
      .localCheckpoint(true)
    // one job for both the empty/broadcast decision and the convergence
    // baseline
    val firstAgg = labels
      .agg(count(lit(1)), sum($"component".cast("decimal(38,0)"))).head()
    val nVertices = firstAgg.getLong(0)
    if (nVertices == 0) { edges.unpersist(); return labels }
    // Dedup graphs have few vertices relative to the corpus, so the label
    // frame usually fits a broadcast — propagation then runs map-side and
    // each round pays ONE shuffle (the min-label groupBy). Past the
    // threshold, min-label would need a shuffle join per round with an
    // unknown round count: go straight to the alternating algorithm,
    // whose round count is bounded by log², not diameter.
    if (nVertices > 2_000_000) {
      val out = alternating(edges, maxIterations)
      edges.unpersist()
      return out
    }
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum($"component".cast("decimal(38,0)"))).head.getDecimal(0)
    // labels only ever decrease, so the sum strictly decreases until the
    // fixpoint — equality IS convergence, no per-vertex compare join
    def propagate(lbls: DataFrame): DataFrame = {
      val lbl = lbls.withColumnRenamed("vertex", "a")
      lbls.unionByName(
          edges.join(broadcast(lbl), Seq("a"))
            .select($"b".as("vertex"), $"component"))
        .groupBy($"vertex")
        .agg(min($"component").as("component"))
    }
    var prevSum = firstAgg.getDecimal(1)
    var converged = false
    var i = 0
    while (!converged && i < EscalationRounds) {
      // TWO propagation hops per materialization: labels only decrease,
      // so checksum equality after a double-hop still means fixpoint,
      // and the per-round fixed cost (checkpoint + checksum job) is paid
      // half as often — dedup graphs (diameter ≤ ~3) now converge in
      // two cycles. localCheckpoint, not cache: cached frames still
      // carry the full logical lineage, so analyzer/optimizer cost
      // compounds with round count (the pathology PageRank measured at
      // ~3.7 s/round by round 10); checkpointing keeps every round
      // planning against a flat scan
      val next = propagate(propagate(labels)).localCheckpoint(true)
      val nextSum = checksum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      i += 1
    }
    val out =
      if (converged) labels
      else {
        // Escalate: a component is still shrinking after EscalationRounds,
        // i.e. its diameter exceeds what linear propagation should chase.
        // Seed the alternating algorithm with the progress so far — the
        // (vertex, component) assignments ARE edges of the same component
        // structure, so the union graph has identical components and the
        // partial labels act as shortcuts.
        // checkpointed: the raw union of a cached frame with a
        // checkpoint-derived one trips Catalyst's Union constraint
        // rewrite (key-not-found on a child attribute); flattening to a
        // LogicalRDD sidesteps it and alternating re-plans from a scan
        val seeded = edges.unionByName(
          labels.filter($"vertex" =!= $"component")
            .select($"vertex".as("a"), $"component".as("b")))
          .localCheckpoint(true)
        alternating(seeded, maxIterations)
      }
    edges.unpersist()
    out
  }

  /** Alternating large-star/small-star connected components (Kiveris et
    * al., SoCC'14). Input: two-column undirected edge frame (self-loops
    * and duplicates tolerated). Output: (vertex, component) with
    * component = min vertex id of the component.
    *
    * Each round:
    *  - '''large-star''': every vertex connects its strictly-LARGER
    *    neighbors to the minimum of its neighborhood (incl. itself) —
    *    long chains split in half;
    *  - '''small-star''': every vertex connects its smaller-or-equal
    *    neighbors (and itself) to that minimum — local stars collapse
    *    onto their centers.
    *
    * Both steps preserve connectivity (proven in the paper) and strictly
    * drive the edge set toward a forest of stars centered at component
    * minima. Convergence is detected EXACTLY — the edge set is a star
    * forest iff no parent is itself a child and every child has one
    * parent — no checksum-collision risk.
    *
    * Per round: two aggregates + two joins (four shuffles). The round
    * count is O(log² n) worst-case and ~log₂(diameter) in practice, so a
    * 1000-executor job over billions of edges finishes in tens of
    * shuffles regardless of component shape.
    */
  def alternating(pairs: DataFrame, maxIterations: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val Array(srcCol, dstCol) = pairs.columns
    val init = pairs
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .filter($"u" =!= $"v")
      .distinct()
      .localCheckpoint(true)
    val vertices = init.select($"u".as("vertex"))
      .unionByName(init.select($"v".as("vertex")))
      .distinct()
      .localCheckpoint(true)
    if (init.isEmpty)
      return vertices.withColumn("component", $"vertex")

    // large-star: symmetrize, m(u) = min(Γ(u) ∪ {u}), emit (v, m) for
    // every neighbor v > u. Output edges always point large → small.
    def largeStar(dir: DataFrame): DataFrame = {
      val sym = dir.unionByName(dir.select($"v".as("u"), $"u".as("v")))
      val mins = sym.groupBy($"u").agg(min($"v").as("mn"))
        .select($"u", least($"u", $"mn").as("m"))
      sym.join(mins, Seq("u"))
        .filter($"v" > $"u")
        .select($"v".as("u"), $"m".as("v"))
        .distinct()
    }
    // small-star: input already points large → small; m(u) = min of the
    // smaller neighborhood; connect every smaller neighbor AND u itself
    // to m. Output still points large → small.
    def smallStar(dir: DataFrame): DataFrame = {
      val mins = dir.groupBy($"u").agg(min($"v").as("mn"))
      dir.join(mins, Seq("u"))
        .select($"v".as("u"), $"mn".as("v"))
        .filter($"u" =!= $"v")
        .unionByName(mins.select($"u", $"mn".as("v")))
        .distinct()
    }

    var cur = init
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      // localCheckpoint per round for the same flat-lineage reason as the
      // min-label loop: round r must not replan rounds 1..r-1
      val next = smallStar(largeStar(cur)).localCheckpoint(true)
      // EXACT star-forest test: (1) no chain — a parent that is itself a
      // child means some star still points at a non-root; (2) unique
      // parent — a child with two parents means stars still overlap.
      // Both are cheap limit-1 probes on the checkpointed frame.
      val chained = !next.as("x")
        .join(next.as("y"), col("x.v") === col("y.u"), "left_semi")
        .isEmpty
      lazy val multiParent = !next.groupBy($"u")
        .agg(count(lit(1)).as("c")).filter($"c" > 1)
        .isEmpty
      converged = !chained && !multiParent
      cur = next
      i += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"alternating connected components did not converge in " +
          s"$maxIterations rounds; raise maxIterations")
    // cur is a star forest: (child, root) with root = component min.
    // Roots appear only on the right — join them back as self-labels.
    vertices
      .join(cur.withColumnRenamed("u", "vertex"), Seq("vertex"), "left")
      .select($"vertex", coalesce($"v", $"vertex").as("component"))
  }
}

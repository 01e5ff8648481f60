package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the step
  * AFTER near-dup detection: candidate pairs say "a duplicates b";
  * components turn the pair list into duplicate GROUPS so a keeper can be
  * chosen per group (dedup correctness requires the transitive closure —
  * a~b and b~c must collapse to ONE keeper even if a~c was never paired).
  *
  * Each iteration: every vertex takes the min label among itself and its
  * neighbors (one shuffle join + one aggregate per round, all
  * DataFrame-level — the loop is a distributed fixpoint like KMeans, not
  * a per-row driver loop). Rounds needed = component diameter; near-dup
  * components are overwhelmingly tiny clusters (diameter ≤ ~3), and the
  * fixpoint test is one cheap aggregate per round. For adversarial
  * long-chain graphs the large-star/small-star variant halves diameters
  * per round; the simple form is the right tool for dedup-shaped inputs.
  */
object ConnectedComponents {

  /** @param pairs two-column frame of undirected edges (src, dst)
    * @param maxIterations fail-safe bound on propagation rounds (rounds
    *        needed = component diameter); exhausting it THROWS rather
    *        than silently returning unconverged labels — wrong components
    *        would make a dedup keeper-choice quietly keep duplicates
    * @return (vertex, component) — component = min vertex id reachable */
  def components(pairs: DataFrame, maxIterations: Int = 50): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val Array(srcCol, dstCol) = pairs.columns
    val edges = pairs
      .select(col(srcCol).as("a"), col(dstCol).as("b"))
      .unionByName(pairs.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .cache() // reused every round; edge list ≪ corpus (near-dups only)
    var labels = edges.select($"a".as("vertex")).distinct()
      .withColumn("component", $"vertex")
      .localCheckpoint(true)
    val nVertices = labels.count()
    if (nVertices == 0) return labels
    // Dedup graphs have few vertices relative to the corpus, so the label
    // frame usually fits a broadcast — propagation then runs map-side and
    // each round pays ONE shuffle (the min-label groupBy). Past the
    // threshold, fall back to the shuffle join (both sides partition).
    val broadcastLabels = nVertices <= 2_000_000
    def checksum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum($"component".cast("decimal(38,0)"))).head.getDecimal(0)
    // labels only ever decrease, so the sum strictly decreases until the
    // fixpoint — equality IS convergence, no per-vertex compare join
    var prevSum = checksum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIterations) {
      val lbl = labels.withColumnRenamed("vertex", "a")
      val propagated = edges
        .join(if (broadcastLabels) broadcast(lbl) else lbl, Seq("a"))
        .select($"b".as("vertex"), $"component")
      // localCheckpoint, not cache: cached frames still carry the full
      // logical lineage, so analyzer/optimizer cost compounds with round
      // count (the pathology PageRank measured at ~3.7 s/round by round
      // 10); checkpointing keeps every round planning against a flat
      // scan, which is what lets the adversarial long-chain case actually
      // reach maxIterations
      val next = labels.unionByName(propagated)
        .groupBy($"vertex")
        .agg(min($"component").as("component"))
        .localCheckpoint(true)
      val nextSum = checksum(next)
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      i += 1
    }
    edges.unpersist()
    if (!converged)
      throw new IllegalStateException(
        s"connected components did not converge in $maxIterations rounds " +
          "(component diameter exceeds the bound); raise maxIterations")
    labels
  }
}

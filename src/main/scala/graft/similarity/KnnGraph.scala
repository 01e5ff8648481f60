package graft.similarity

import graft.similarity.VectorOps.cosine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate k-NN graph: NN-Descent construction (Dong et al. 2011)
  * plus the stored-serving layout — the graph-index counterpart of
  * [[StoredIndex]]'s IVF-PQ pair. Build is pure relational algebra
  * (2-hop self-joins + exact-cosine top-k per node, lineage
  * localCheckpoint'd per round); serving is HNSW's layer-0 beam loop.
  *
  * Storage layout: the UNDIRECTED adjacency partitioned by
  * `bucket = src % NumBuckets`, so one beam step reads only the
  * frontier nodes' buckets — a partition-pruned scan exactly like
  * sq14's nprobe-pruned codes read (StoredGraphSpec asserts
  * `selectedPartitions ≤ frontier buckets` on the real plan). The
  * registry/pin lifecycle (ml/IndexLifecycle) applies to the store
  * path unchanged.
  *
  * 100 TB: the graph is the k·n edge list — index-sized, not
  * corpus-sized; a beam step shuffles only (qid, node) frontiers and
  * scans ≤ beam·|Q| buckets of it. */
object KnnGraph {

  val NumBuckets = 32

  /** e_0..e_rounds of the NN-Descent build, each (src, nbr, cos):
    * prime-stride spread init (never self), then per round the 2-hop
    * expansion over the undirected current graph, exact double-cosine
    * scoring and a (cos DESC, nbr) top-k per node. localCheckpoint per
    * round — the self-join lineage otherwise DOUBLES per round and
    * Catalyst re-analysis dominates wall time (cached frames still
    * carry their full logical plan). */
  def build(vecs: DataFrame, k: Int, rounds: Int): Seq[DataFrame] = {
    import vecs.sparkSession.implicits._
    def score(pairs: DataFrame) = pairs
      .join(vecs.select($"vec_id".as("src"), $"v".as("vs")), Seq("src"))
      .join(vecs.select($"vec_id".as("nbr"), $"v".as("vn")), Seq("nbr"))
      .select($"src", $"nbr", cosine($"vs", $"vn").as("cos"))
    val nn = vecs.agg(count(lit(1)).as("n"))
    val init = vecs.select($"vec_id".as("src"))
      .crossJoin(broadcast(nn))
      .select($"src", explode(sequence(lit(1), lit(k))).as("j"), $"n")
      .select($"src",
        pmod($"src" + 1 + pmod($"j" * 193, $"n" - 1), $"n").cast("long").as("nbr"))
      .distinct()
    var e = score(init).localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer(e)
    for (_ <- 1 to rounds) {
      val undirected = e.select($"src", $"nbr")
        .union(e.select($"nbr".as("src"), $"src".as("nbr"))).distinct()
      val cand = undirected.as("a")
        .join(undirected.as("b"), $"a.nbr" === $"b.src")
        .select($"a.src".as("src"), $"b.nbr".as("nbr"))
        .filter($"src" =!= $"nbr")
        .union(e.select($"src", $"nbr")).distinct()
      e = score(cand)
        .withColumn("rn", row_number().over(
          Window.partitionBy($"src").orderBy($"cos".desc, $"nbr")))
        .filter($"rn" <= k).drop("rn")
        .localCheckpoint(true)
      out += e
    }
    out.toSeq
  }

  /** Persist the UNDIRECTED adjacency of a built graph, partitioned by
    * src bucket — the layout that makes each beam step a pruned scan. */
  def writeStore(graph: DataFrame, path: String): Unit = {
    import graph.sparkSession.implicits._
    graph.select($"src", $"nbr")
      .union(graph.select($"nbr".as("src"), $"src".as("nbr"))).distinct()
      .withColumn("bucket", pmod($"src", lit(NumBuckets.toLong)).cast("int"))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
  }

  /** One frontier expansion from the stored adjacency: reads ONLY the
    * frontier nodes' buckets (≤ NumBuckets values, driver-bounded) and
    * returns the distinct (qid, neighbor) pairs. */
  def expandStored(spark: SparkSession, path: String,
      frontier: DataFrame): DataFrame = {
    import spark.implicits._
    val buckets = frontier
      .select(pmod($"node", lit(NumBuckets.toLong)).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val pruned = spark.read.parquet(path).filter($"bucket".isin(buckets: _*))
    frontier.join(pruned, frontier("node") === pruned("src"))
      .select(frontier("qid"), pruned("nbr").as("node")).distinct()
  }

  /** Beam-search serve from the STORED graph: `beamRounds` pruned
    * expansion steps, keeping the best `beam` unvisited nodes per query
    * each step, answering with the visited pool's exact-cosine top-k.
    * `queries` is (qid, v); entry node per query is (qid·37 + 1) mod n. */
  def serveStored(spark: SparkSession, path: String, vecs: DataFrame,
      queries: DataFrame, k: Int, beamRounds: Int): DataFrame = {
    import spark.implicits._
    val nn = vecs.agg(count(lit(1)).as("n"))
    def rankPool(pool: DataFrame, keep: Int) = pool
      .filter($"node" =!= $"qid")
      .join(broadcast(queries), Seq("qid"))
      .join(vecs.select($"vec_id".as("node"), $"v".as("cv")), Seq("node"))
      .withColumn("rn", row_number().over(
        Window.partitionBy($"qid").orderBy(cosine($"v", $"cv").desc, $"node")))
      .filter($"rn" <= keep).select($"qid", $"node")
    var pool = queries.crossJoin(broadcast(nn))
      .select($"qid", pmod($"qid" * 37 + 1, $"n").cast("long").as("node"))
      .localCheckpoint(true)
    var frontier = pool
    for (_ <- 1 to beamRounds) {
      val fresh = expandStored(spark, path, frontier)
        .join(pool, Seq("qid", "node"), "left_anti")
      frontier = fresh
        .join(broadcast(queries), Seq("qid"))
        .join(vecs.select($"vec_id".as("node"), $"v".as("cv")), Seq("node"))
        .withColumn("rn", row_number().over(
          Window.partitionBy($"qid").orderBy(cosine($"v", $"cv").desc, $"node")))
        .filter($"rn" <= k).select($"qid", $"node")
        .localCheckpoint(true)
      pool = pool.union(frontier).distinct().localCheckpoint(true)
    }
    rankPool(pool, k)
  }
}

package graft

import org.apache.spark.sql.functions._

/** 10× scale probe: measures whether the heaviest query plans scale
  * LINEARLY in input size — the brief's "would this survive a 100×
  * scale-up" question, measured instead of argued.
  *
  * Builds a key-shifted `factor`× replica of the tables the probed
  * queries read (documents / lineitem / events at ~sf1-equivalent row
  * counts for factor 10 over sf0.1): each copy shifts its unique keys by
  * copy-index × (max+1), so key cardinality, join fan-outs, and dedup
  * cluster structure scale with the data instead of degenerating into
  * one giant key. Values (text, prices, timestamps) are untouched, so
  * per-row work is representative.
  *
  * Prints one JSON line per probed query: seconds at 1×, seconds at
  * `factor`×, and the time ratio. ratio ≈ factor means linear scaling
  * (cost per row flat); ratio >> factor is a super-linear red flag the
  * round writeup must explain or fix. Results are recorded in
  * COVERAGE.md §scale-probe.
  *
  * Run: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleProbe"
  * Knobs: SPARK_GRAFT_SF_DIR (base, default sf0.1),
  *        SPARK_GRAFT_SCALE_DIR (replica cache, default /tmp/graft_scale10),
  *        SPARK_GRAFT_SCALE_FACTOR (default 10),
  *        SPARK_GRAFT_PROBES (comma list, default the 5 heaviest shapes).
  */
object ScaleProbe {

  def main(args: Array[String]): Unit = {
    // the probe times repeated runs of one query — the shared graph
    // build cache would make the timed run a reload of the warm run's
    // build and the ratio would measure parquet reads, not construction.
    // SPARK_GRAFT_KEEP_BUILD_CACHE=1 opts back in for rows whose
    // SUBJECT is the post-build path (sq28's store+serve+lifecycle —
    // its build scaling is sq21's separately-probed measurement):
    // there the cache mirrors deployment, where an index is built once
    // and every serving/maintenance consumer reloads it.
    if (!sys.env.get("SPARK_GRAFT_KEEP_BUILD_CACHE").contains("1"))
      System.setProperty("graft.noBuildCache", "1")
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale10")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val probes = sys.env.getOrElse("SPARK_GRAFT_PROBES",
      "q20b_moment_stats,q24_percentiles,dq03_minhash_lsh,eq02_range_join,dq09_dup_clusters," +
        "sq07_bm25_topk,tq19_textrank_keywords,sq09_ann_pq_recall,wq01_upsert_roundtrip," +
        "dq07b_decontaminate_bloom,dq12_substring_dedup,tq28_source_overlap,tq30_bpe_merges," +
        "tq31_bpe_encode,pq05_dsir_resample,dq13_semantic_decontam")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val spark = Sessions.local("graft-scale-probe", cpus)

    /** Write an n× key-shifted replica of `name` (cached across runs).
      * The 1× baseline is ALSO written through this path so both sides
      * share file count and layout — timing the raw single-row-group
      * fixture against a 32-file replica would compare scan parallelism,
      * not per-row scaling.
      *
      * EMBEDDINGS replicate PERTURBED-UNIQUE (r15 verdict #1): a pure
      * key-shift leaves `n` exact copies of every base vector, which
      * degenerates the true-neighbor structure — each query's top-k is
      * mostly its own clones, concentrated in its cell, inflating the
      * absolute recall of any cell-routed entry discipline and
      * saturating ADC shortlists with code-identical duplicates (the
      * r15 0.930/0.969 headline rode exactly this). Copy i > 0 moves
      * coordinate (i mod dim) by an ADDITIVE epsilon scaled by the
      * copy index — x + (0.01 + 0.001·i)·(|x|+1) — so every copy is
      * unique pairwise (coordinates collide only at i ≡ j mod dim,
      * where the epsilons differ), stays near its base (cluster
      * structure scales instead of shattering), and no zero coordinate
      * can silently degenerate back to a clone. Copy 0 IS the base
      * corpus. Deterministic — no RNG, so replicas are reproducible
      * and cacheable. */
    def replicate(name: String, keyCols: Seq[String], n: Int, dir: String): Unit = {
      val path = s"$dir/$name.parquet"
      // SPARK_GRAFT_EMB_MODE=fresh (r16 verdict #1): the embeddings
      // scale corpus is FRESH-SAMPLED from the base generator's fitted
      // per-label mixture instead of replicated — no perturbation
      // families, so no probe's truth set is its own replica family
      // and the battery's recall numbers transfer to arbitrary
      // embeddings with this cluster structure. Deterministic +
      // prefix-stable (FreshEmbeddingsSpec), so x1 ⊂ x10 ⊂ x100 like
      // the replicas.
      val embMode =
        if (sys.env.get("SPARK_GRAFT_EMB_MODE").contains("fresh")) "fresh"
        else "replica"
      // cache-validity = the _SUCCESS marker (a prior run killed
      // mid-write leaves a partial dir that must be rebuilt) AND, for
      // embeddings, the generation-mode marker: a cached replica
      // corpus must never be silently served to a fresh-mode battery
      // or vice versa (a missing marker reads as "replica" — the
      // pre-marker dirs are all replicas)
      val modeMarker = new java.io.File(s"$path/_graft_emb_mode")
      def cachedMode: String =
        if (!modeMarker.exists()) "replica"
        else new String(java.nio.file.Files.readAllBytes(
          modeMarker.toPath), "UTF-8").trim
      if (new java.io.File(s"$path/_SUCCESS").exists() &&
          (name != "embeddings" || cachedMode == embMode)) return
      val df = sources.Tables.load(spark, base, name)
      if (name == "embeddings" && embMode == "fresh") {
        val nBase = df.count()
        graft.similarity.FreshEmbeddings.sample(spark, df, nBase * n)
          .repartition(spark.sparkContext.defaultParallelism)
          .write.mode("overwrite").parquet(path)
        java.nio.file.Files.write(modeMarker.toPath,
          embMode.getBytes("UTF-8")): Unit
        return
      }
      val shift = keyCols.map(k =>
        k -> (df.agg(max(col(k)).cast("long")).head().getLong(0) + 1L)).toMap
      // the largest replica key is shift*n - 1; assert it fits the
      // column's physical type — a 32-bit key that wraps would silently
      // collapse the key space and invalidate the scaling measurement
      for (k <- keyCols) {
        import org.apache.spark.sql.types._
        val bound: Long = df.schema(k).dataType match {
          case LongType    => Long.MaxValue
          case IntegerType => Int.MaxValue.toLong
          case ShortType   => Short.MaxValue.toLong
          case ByteType    => Byte.MaxValue.toLong
          case dt => throw new IllegalArgumentException(
            s"unsupported key type $dt for replica key $k")
        }
        require(BigInt(shift(k)) * n - 1 <= BigInt(bound),
          s"replica keys for $name.$k overflow ${df.schema(k).dataType} " +
            s"at factor $n; promote the key to long before probing")
      }
      val embDim: Int =
        if (name == "embeddings")
          df.select(size(col("embedding"))).head().getInt(0)
        else 0
      val copies = (0 until n).map { i =>
        val shifted = keyCols.foldLeft(df) { (d, k) =>
          d.withColumn(k, (col(k) + lit(shift(k) * i)).cast(df.schema(k).dataType))
        }
        if (name == "embeddings" && i > 0) {
          val eps = 0.01 + 0.001 * i
          shifted.withColumn("embedding",
            transform(col("embedding"), (x, idx) =>
              when(idx === (i % embDim),
                (x + lit(eps) * (abs(x) + lit(1.0))).cast("float"))
                .otherwise(x)))
        } else shifted
      }
      copies.reduce(_ unionByName _)
        .repartition(spark.sparkContext.defaultParallelism)
        .write.mode("overwrite").parquet(path)
    }
    val base1 = s"$out/x1"
    val baseN = s"$out/x$factor"
    // SPARK_GRAFT_SCALE_TABLES restricts replica materialization to the
    // tables the probed queries actually read — at factor 100 building
    // every replica would dominate the run
    val allTables = Seq(
      "documents" -> Seq("doc_id"),
      "lineitem" -> Seq("l_orderkey"),
      "events" -> Seq("event_id", "user_id"),
      "embeddings" -> Seq("vec_id"),
      "orders" -> Seq("o_orderkey"),
      "customer" -> Seq("c_custkey"),
      "part" -> Seq("p_partkey"))
    val wanted = sys.env.get("SPARK_GRAFT_SCALE_TABLES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    for ((n, dir) <- Seq((1, base1), (factor, baseN));
         (t, ks) <- allTables if wanted.forall(_.contains(t)))
      replicate(t, ks, n, dir)

    // JIT/codegen warm-up outside every timed region (see Bench)
    try spark.range(1000000).agg(sum(col("id")))
      .write.mode("overwrite").format("noop").save()
    catch { case _: Throwable => () }

    def time(q: String, dir: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, dir).write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }

    // SPARK_GRAFT_PROBES= (empty) turns the run into replica
    // materialization only — how the ANN probes regenerate their
    // perturbed-unique corpora without timing anything here
    if (probes.isEmpty) { spark.stop(); return }
    val results = probes.map { q =>
      // untimed warm run on BOTH sides first: codegen compiles on the
      // first execution of each plan (AQE can pick different strategies
      // per size, so the two sides don't share generated classes), and
      // file listings/page cache warm per replica — a one-sided warm-up
      // biases the ratio in whichever direction it is applied
      time(q, base1)
      time(q, baseN)
      val t1 = time(q, base1)
      val tN = time(q, baseN)
      val ratio = tN / t1
      println(f"""{"probe":"$q","sec_1x":$t1%.2f,"sec_${factor}x":$tN%.2f,"ratio":$ratio%.2f}""")
      (q, t1, tN, ratio)
    }
    val worst = results.maxBy(_._4)
    println(f"""{"metric":"scale_probe","factor":$factor,"worst_ratio":${worst._4}%.2f,"worst_query":"${worst._1}"}""")
    spark.stop()
  }
}

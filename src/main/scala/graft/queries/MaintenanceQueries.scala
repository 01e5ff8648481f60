package graft.queries

import graft.QueryDef
import graft.QueryDef.sqlChecked
import graft.sources.Tables
import graft.util.Num._
import org.apache.spark.sql.functions._

/** Write-side table maintenance, oracle-checked END TO END (the pq03
  * pattern): each query performs the real maintenance operation against
  * a scratch table — upsert with partition relocation, small-file
  * compaction, incremental aggregate rollup, Z-order rewrite — then
  * reads the maintained table back and aggregates, while DuckDB computes
  * the same result straight from the source parquet with the operation's
  * SEMANTICS inlined as SQL. A hash match proves the physical operation
  * (prune → stage → overwrite → drain/compact/cluster) preserved or
  * transformed every row exactly as specified — upgrading these
  * operators from spec-only to driver-contract-checked.
  *
  * Scratch tables build at plan-construction time (like pq03) under
  * util/Scratch roots, reclaimed at JVM exit.
  */
object MaintenanceQueries {

  /** Upsert with partition relocation: every 10th order doubles its price
    * AND moves to status 'F' (a cross-partition move — the hard case:
    * the old partition must drop the row, the new one must gain it, and
    * untouched partitions' files stay byte-identical per UpsertSpec). */
  val wq01UpsertRoundtrip: QueryDef = sqlChecked(
    "wq01_upsert_roundtrip",
    s"""WITH final AS (
       |  SELECT o_orderkey,
       |    CASE WHEN o_orderkey % 10 = 0 THEN 'F' ELSE o_orderstatus END AS o_orderstatus,
       |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
       |  FROM orders)
       |SELECT o_orderstatus, COUNT(*) AS n,
       |  ${sqlDsum("o_totalprice")} AS total
       |FROM final GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val path = graft.util.Scratch.tempDir("graft-upsert-q") + "/t"
    val orders = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
    graft.sources.PartitionedLayout.write(orders, path, "o_orderstatus")
    val updates = orders.filter($"o_orderkey" % 10 === 0)
      .withColumn("o_orderstatus", lit("F"))
      .withColumn("o_totalprice", $"o_totalprice" * 2)
    graft.sources.PartitionedLayout.upsert(spark, path, updates,
      "o_orderkey", "o_orderstatus")
    graft.sources.PartitionedLayout.read(spark, path)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus")
  }

  /** Compaction: the table is written deliberately fragmented (32 files
    * per partition), compacted to ~file-per-partition, and read back —
    * rows must be preserved exactly; only layout may change
    * (CompactionSpec pins the file-count and byte-identity claims). */
  val wq02CompactionRoundtrip: QueryDef = sqlChecked(
    "wq02_compaction_roundtrip",
    s"""SELECT o_orderstatus, COUNT(*) AS n,
       |  ${sqlDsum("o_totalprice")} AS total,
       |  CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       |  CAST(MAX(o_orderkey) AS BIGINT) AS max_key
       |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val path = graft.util.Scratch.tempDir("graft-compact-q") + "/t"
    Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .repartition(32)
      .write.partitionBy("o_orderstatus").parquet(path)
    graft.sources.PartitionedLayout.compact(spark, path, "o_orderstatus"): Unit
    graft.sources.PartitionedLayout.read(spark, path)
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"),
        min($"o_orderkey").cast("long").as("min_key"),
        max($"o_orderkey").cast("long").as("max_key"))
      .orderBy($"o_orderstatus")
  }

  /** Incremental aggregate rollup: init from the first 80% of lineitem,
    * ingest the rest as a batch (only touched key-hash buckets rewrite),
    * serve the merged per-supplier totals — which must equal a one-shot
    * aggregate over everything. l_quantity is integer-valued, so the
    * long-accumulated rollup is exact. */
  val wq03IncrementalAggRoundtrip: QueryDef = sqlChecked(
    "wq03_incremental_agg_roundtrip",
    """SELECT l_suppkey,
      |  CAST(SUM(l_quantity) AS BIGINT) AS sum,
      |  COUNT(l_quantity) AS cnt,
      |  CAST(SUM(l_quantity) AS BIGINT) / COUNT(l_quantity) AS avg
      |FROM lineitem
      |GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val path = graft.util.Scratch.tempDir("graft-incragg-q") + "/t"
    val li = Tables.lineitem(spark, dir).select($"l_orderkey", $"l_suppkey", $"l_quantity")
    val cut = li.agg(floor(max($"l_orderkey") * 0.8).cast("long")).head().getLong(0)
    graft.sources.IncrementalAgg.init(spark, path,
      li.filter($"l_orderkey" < cut), "l_suppkey", "l_quantity")
    graft.sources.IncrementalAgg.ingest(spark, path,
      li.filter($"l_orderkey" >= cut), "l_suppkey", "l_quantity")
    graft.sources.IncrementalAgg.read(spark, path, "l_suppkey")
      .orderBy($"l_suppkey")
  }

  /** Z-order rewrite: cluster lineitem on (l_partkey, l_suppkey) into
    * compact z-range files (the two-dimensional file-skipping layout —
    * ZOrderSpec proves the skipping bound), read the rewrite back and
    * aggregate — clustering must preserve every row and value. */
  val wq04ZorderRoundtrip: QueryDef = sqlChecked(
    "wq04_zorder_roundtrip",
    s"""SELECT l_returnflag, COUNT(*) AS n,
       |  ${sqlDsum("l_extendedprice")} AS total,
       |  CAST(SUM(l_partkey) AS BIGINT) AS sum_part,
       |  CAST(SUM(l_suppkey) AS BIGINT) AS sum_supp
       |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val path = graft.util.Scratch.tempDir("graft-zorder-q") + "/t"
    val li = Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_partkey", $"l_suppkey", $"l_extendedprice")
    graft.operators.ZOrder.cluster(li, "l_partkey", "l_suppkey", nFiles = 16)
      .write.parquet(path)
    spark.read.parquet(path)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n"), dsum($"l_extendedprice").as("total"),
        sum($"l_partkey").cast("long").as("sum_part"),
        sum($"l_suppkey").cast("long").as("sum_supp"))
      .orderBy($"l_returnflag")
  }

  /** Schema evolution + backfill migration: batch 1 lands WITHOUT
    * o_orderpriority, batch 2 lands with it (the day-200 reality of
    * every ingest table), the merged-schema read surfaces the legacy
    * rows' nulls, and [[graft.sources.SchemaEvolution.addColumnBackfill]]
    * rewrites ONLY the legacy batch with the default — migration cost
    * proportional to legacy bytes, not table bytes (SchemaEvolutionSpec
    * pins that property: batch 2's files are byte-identical after the
    * migration). The oracle inlines the evolution semantics as a CASE
    * over the source parquet; a hash match proves the mergeSchema read,
    * the selective rewrite, and the swap preserved every row. */
  val wq05SchemaEvolutionRoundtrip: QueryDef = sqlChecked(
    "wq05_schema_evolution_roundtrip",
    s"""WITH cut AS (SELECT CAST(FLOOR(max(o_orderkey) * 0.8) AS BIGINT) AS c FROM orders),
       |v AS (
       |  SELECT o_orderstatus,
       |    CASE WHEN o_orderkey < c THEN 'LEGACY' ELSE o_orderpriority END AS pri,
       |    o_totalprice
       |  FROM orders, cut)
       |SELECT o_orderstatus, pri, COUNT(*) AS n,
       |  ${sqlDsum("o_totalprice")} AS total
       |FROM v GROUP BY o_orderstatus, pri
       |ORDER BY o_orderstatus, pri""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val root = graft.util.Scratch.tempDir("graft-schemaevo-q") + "/t"
    val o = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderpriority")
    // the split point stays a broadcast scalar, never a driver literal
    val cut = o.agg(floor(max($"o_orderkey") * 0.8).cast("long").as("c"))
    val oc = o.crossJoin(broadcast(cut))
    oc.filter($"o_orderkey" < $"c")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
      .write.parquet(root + "/batch=1")
    oc.filter($"o_orderkey" >= $"c")
      .select($"o_orderkey", $"o_orderstatus", $"o_totalprice", $"o_orderpriority")
      .write.parquet(root + "/batch=2")
    graft.sources.SchemaEvolution.addColumnBackfill(
      spark, root, "o_orderpriority", lit("LEGACY")): Unit
    graft.sources.SchemaEvolution.read(spark, root)
      .groupBy($"o_orderstatus", $"o_orderpriority".as("pri"))
      .agg(count(lit(1)).as("n"), dsum($"o_totalprice").as("total"))
      .orderBy($"o_orderstatus", $"pri")
  }

  /** Targeted key DELETE round trip — the GDPR/right-to-be-forgotten
    * maintenance primitive at its 100 TB cost bound: erase every 37th
    * document AND the whole 'de' slice from a lang-partitioned copy,
    * rewriting ONLY partitions that contain erased keys (the de
    * partition drains away entirely — dynamic overwrite's blind spot,
    * handled; untouched partitions keep byte-identical files, pinned by
    * DeleteSpec). The read-back aggregate must match the oracle's
    * anti-join semantics over the ORIGINAL table — proof the erasure
    * removed exactly the requested keys and nothing else. */
  val wq06TargetedDelete: QueryDef = sqlChecked(
    "wq06_targeted_delete",
    """SELECT lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(MIN(doc_id) AS BIGINT) AS min_id,
      |  CAST(MAX(doc_id) AS BIGINT) AS max_id
      |FROM documents
      |WHERE NOT (doc_id % 37 = 0 OR lang = 'de')
      |GROUP BY lang ORDER BY lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val path = graft.util.Scratch.tempDir("graft-delete-q") + "/t"
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"n_chars")
    graft.sources.PartitionedLayout.write(docs, path, "lang")
    val erase = docs.filter($"doc_id" % 37 === 0 || $"lang" === "de")
      .select($"doc_id")
    graft.sources.PartitionedLayout.delete(spark, path, erase, "doc_id", "lang")
    graft.sources.PartitionedLayout.read(spark, path)
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").cast("long").as("sum_chars"),
        min($"doc_id").cast("long").as("min_id"),
        max($"doc_id").cast("long").as("max_id"))
      .orderBy($"lang")
  }

  /** Snapshot-HISTORY erasure round trip — the half of the GDPR story
    * wq06 can't give: a snapshot-versioned table keeps every retained
    * version readable (time travel), so deleting a key from the head
    * still leaves it servable from any pre-erasure version. Here v1 is
    * the full table and v2 an appended re-ingest that mentions the
    * victims again (staged-manifest append, sharing v1's files); then
    * [[graft.sources.Snapshots.erase]] rewrites history in place —
    * contaminated files only, manifests republished under their original
    * version numbers, victim bytes deleted last. The query reads BOTH
    * versions back post-erase and aggregates per (version, lang); the
    * oracle inlines each version's expected content minus the victims.
    * A hash match proves no retained version can serve an erased key
    * and no non-victim row moved. SnapshotsSpec pins the byte-level
    * claims (clean files byte-identical, contaminated bytes gone). */
  val wq07SnapshotErase: QueryDef = sqlChecked(
    "wq07_snapshot_erase",
    """WITH base AS (SELECT doc_id, lang, n_chars FROM documents),
      |extra AS (SELECT doc_id + 10000000 AS doc_id, lang, n_chars
      |  FROM base WHERE lang = 'de'),
      |u AS (
      |  SELECT 1 AS version, * FROM base
      |  UNION ALL SELECT 2 AS version, * FROM base
      |  UNION ALL SELECT 2 AS version, * FROM extra),
      |purged AS (SELECT * FROM u WHERE doc_id % 37 <> 0)
      |SELECT version, lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(MIN(doc_id) AS BIGINT) AS min_id,
      |  CAST(MAX(doc_id) AS BIGINT) AS max_id
      |FROM purged GROUP BY version, lang
      |ORDER BY version, lang""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.sources.Snapshots
    val path = graft.util.Scratch.tempDir("graft-snap-erase-q") + "/t"
    val docs = Tables.documents(spark, dir)
      .select($"doc_id", $"lang", $"n_chars")
    val v1 = Snapshots.commit(spark, path, docs)
    // appended re-ingest of the de slice under shifted ids — v2 shares
    // v1's files, so the erase must chase victims through both versions
    val vb = Snapshots.commit(spark, path,
      docs.filter($"lang" === "de")
        .select(($"doc_id" + 10000000L).as("doc_id"), $"lang", $"n_chars"))
    val v2 = Snapshots.commitStaged(spark, path,
      Snapshots.manifest(spark, path, v1) ++ Snapshots.manifest(spark, path, vb))
    Snapshots.erase(spark, path, $"doc_id" % 37 === 0): Unit
    def agg(v: Long, tag: Int) =
      Snapshots.read(spark, path, v).withColumn("version", lit(tag))
    agg(v1, 1).unionByName(agg(v2, 2))
      .groupBy($"version", $"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").cast("long").as("sum_chars"),
        min($"doc_id").cast("long").as("min_id"),
        max($"doc_id").cast("long").as("max_id"))
      .orderBy($"version", $"lang")
  }

  /** Stored-GRAPH erasure, oracle-checked END TO END (r12 — the graph
    * edition of wq06/wq07's discipline; until now KnnGraph.eraseStored
    * was spec-only): build the NN-Descent graph, persist the
    * bucket-partitioned undirected adjacency, erase two victim NODES
    * through the real store machinery (both edge directions, pruned
    * rewrite, pairwise neighbor re-link), then read the store back and
    * summarize per bucket. DuckDB replays EVERYTHING: the 2-round
    * NN-Descent build (sq21's unroll), the undirected store, the
    * victims' neighbor discovery, the both-direction removal, the
    * re-link pair algebra, and the per-bucket integer checksums — a
    * hash match proves the physical erase transformed exactly the
    * claimed edges and nothing else.
    *
    * 100 TB: the erase reads/rewrites only victim ∪ neighbor buckets
    * (≤ 1 + k·|victims| dirs of the k·n edge list); cost is
    * erasure-request-sized, never index- or corpus-sized
    * (StoredGraphSpec holds the file-identity proof; the depth/bytes
    * complexity is measured in COVERAGE's erase-depth probe). */
  val wq08GraphErase: QueryDef = sqlChecked(
    "wq08_graph_erase",
    s"""WITH vecs AS (
       |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       |${SimilarityQueries.nnDescentSql(8, 2)},
       |und AS MATERIALIZED (
       |  SELECT src, nbr FROM e_2 UNION SELECT nbr, src FROM e_2),
       |victims(vid) AS (VALUES (101), (202)),
       |vn AS (SELECT u.src AS vid, u.nbr
       |  FROM und u JOIN victims ON u.src = victims.vid
       |  WHERE u.nbr NOT IN (SELECT vid FROM victims)),
       |repair AS (
       |  SELECT a.nbr AS src, b.nbr AS nbr FROM vn a JOIN vn b
       |    ON a.vid = b.vid AND a.nbr < b.nbr
       |  UNION
       |  SELECT b.nbr AS src, a.nbr AS nbr FROM vn a JOIN vn b
       |    ON a.vid = b.vid AND a.nbr < b.nbr),
       |kept AS (SELECT src, nbr FROM und
       |  WHERE src NOT IN (SELECT vid FROM victims)
       |    AND nbr NOT IN (SELECT vid FROM victims)),
       |final AS (SELECT src, nbr FROM kept UNION SELECT src, nbr FROM repair)
       |SELECT CAST(src % ${graft.similarity.KnnGraph.NumBuckets} AS INT) AS bucket,
       |  COUNT(*) AS n_edges,
       |  CAST(SUM(src) AS BIGINT) AS src_sum,
       |  CAST(SUM(src * 521 + nbr) AS BIGINT) AS edge_sum
       |FROM final GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    import graft.similarity.{KnnGraph, VectorOps}
    val vecs = Tables.embeddings(spark, dir)
      .select($"vec_id", VectorOps.toDouble($"embedding").as("v")).cache()
    val store = graft.util.Scratch.tempDir("graft-wq08") + "/g"
    // write with the default the oracle's modulus interpolates — the
    // two sides share the ONE constant by construction
    KnnGraph.writeStore(
      KnnGraph.buildCached(vecs, dir, 8, rounds = 2).last, store,
      numBuckets = KnnGraph.NumBuckets)
    KnnGraph.eraseStored(spark, store, Seq(101L, 202L))
    vecs.unpersist()
    spark.read.parquet(store)
      .groupBy($"bucket".cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_edges"),
        sum($"src").cast("long").as("src_sum"),
        sum($"src" * 521 + $"nbr").cast("long").as("edge_sum"))
      .orderBy($"bucket")
  }

  val all: Seq[QueryDef] = Seq(wq01UpsertRoundtrip, wq02CompactionRoundtrip,
    wq03IncrementalAggRoundtrip, wq04ZorderRoundtrip,
    wq05SchemaEvolutionRoundtrip, wq06TargetedDelete, wq07SnapshotErase,
    wq08GraphErase)
}

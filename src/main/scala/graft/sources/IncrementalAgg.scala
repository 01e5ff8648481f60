package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained aggregate table — the metrics-pipeline day-2
  * primitive: a stored per-key (sum, cnt) rollup is updated from each
  * ingest batch by MERGING partial aggregates, never by recomputing
  * history. This is the same algebra that makes Spark's own partial
  * aggregation work (sum and count are commutative monoids; avg is
  * derived at read time, never stored — a stored average cannot merge).
  *
  * Layout: the table is partitioned by a hash bucket of the key, so a
  * batch that touches few keys rewrites few partitions:
  *   1. the batch collapses to per-key partials (its only shuffle);
  *   2. affected buckets = the batch keys' buckets (tiny, broadcast);
  *      the stored table is partition-pruned to those buckets;
  *   3. stored slice ∪ batch partials re-aggregate per key (merge of two
  *      partials) and dynamically overwrite just the affected buckets —
  *      untouched buckets keep their files byte-identical.
  *
  * At 100 TB the rollup is keys-sized, not events-sized; each ingest
  * costs O(batch + affected slice), independent of history length.
  * IncrementalAggSpec proves two sequential ingests equal the one-shot
  * aggregate of all rows, and that a single-key batch leaves other
  * buckets' files untouched.
  */
object IncrementalAgg {

  val NumBuckets = 64

  private def bucketOf(key: org.apache.spark.sql.Column) =
    pmod(hash(key), lit(NumBuckets))

  /** One-shot initialization from a full history. */
  def init(spark: SparkSession, path: String, rows: DataFrame,
      keyCol: String, valueCol: String): Unit =
    partials(rows, keyCol, valueCol)
      .write.mode("overwrite").partitionBy("bucket").parquet(path)

  /** Merge one ingest batch into the stored rollup. */
  def ingest(spark: SparkSession, path: String, batch: DataFrame,
      keyCol: String, valueCol: String): Unit =
    merge(spark, path, partials(batch, keyCol, valueCol), keyCol)

  /** RETRACT previously-ingested rows — the anti-monoid half of
    * incremental view maintenance (sum and count admit exact inverses,
    * which is why this rollup can honor an erasure request without
    * recomputing history): the batch's partials merge NEGATED, so the
    * stored (sum, cnt) land exactly where a from-scratch rebuild without
    * those rows would put them. Same bucket-pruned cost bound as
    * [[ingest]]. */
  def retract(spark: SparkSession, path: String, batch: DataFrame,
      keyCol: String, valueCol: String): Unit =
    merge(spark, path,
      partials(batch, keyCol, valueCol)
        .select(col(keyCol), negate(col("sum")).as("sum"),
          negate(col("cnt")).as("cnt"), col("bucket")),
      keyCol)

  private def merge(spark: SparkSession, path: String, batchAgg0: DataFrame,
      keyCol: String): Unit =
    PartitionedLayout.withDynamicOverwrite(spark) {
      val batchAgg = batchAgg0
      // a rollup initialized from zero history (stream-everything-in) has
      // no schema-bearing parquet files yet — read it as an empty store.
      // Matched on the structured error condition, not message substrings:
      // a genuinely corrupt store must fail loudly, not masquerade as
      // empty and silently drop history from the merge.
      val stored =
        try spark.read.parquet(path)
        catch {
          case e: org.apache.spark.sql.AnalysisException
              if Option(e.getCondition).exists(c =>
                c.startsWith("UNABLE_TO_INFER_SCHEMA") || c.startsWith("PATH_NOT_FOUND")) =>
            spark.createDataFrame(
              new java.util.ArrayList[org.apache.spark.sql.Row](), batchAgg.schema)
        }
      val affected = broadcast(batchAgg.select(col("bucket")).distinct())
      val slice = stored
        .join(affected, Seq("bucket"), "left_semi")
      val merged = slice.unionByName(batchAgg)
        .groupBy(col(keyCol), col("bucket"))
        .agg(sum(col("sum")).as("sum"), sum(col("cnt")).as("cnt"))
        // a key whose entire history has been retracted nets to cnt = 0;
        // a from-scratch rebuild would have no row for it at all, so the
        // exact-inverse guarantee requires dropping it here rather than
        // storing a phantom (key, 0, 0) row that read() would serve with
        // a null avg.
        .filter(col("cnt") =!= 0L)
      // dropping cnt=0 keys can DRAIN a bucket entirely (a retract that
      // erases every key the bucket held) — dynamic overwrite only
      // replaces partitions present in the written data, so a drained
      // bucket's old files must be deleted explicitly, exactly
      // PartitionedLayout.delete's blind-spot handling. The affected
      // list is ≤ NumBuckets values — bounded driver state.
      val affectedVals = batchAgg.select(col("bucket")).distinct()
        .collect().map(_.get(0))
      PartitionedLayout.withStaging(spark, path, merged) { staged =>
        staged.write.mode("overwrite").partitionBy("bucket").parquet(path)
        val present = staged.select(col("bucket")).distinct()
          .collect().map(_.get(0)).toSet
        val drained = affectedVals.filterNot(present)
        if (drained.nonEmpty) {
          val root = new org.apache.hadoop.fs.Path(path)
          val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
          drained.foreach { v =>
            val dirName = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
              .getPartitionPathString("bucket", if (v == null) null else v.toString)
            fs.delete(new org.apache.hadoop.fs.Path(root, dirName), true)
          }
        }
      }
    }

  /** The served view: merged totals plus the derived mean. */
  def read(spark: SparkSession, path: String, keyCol: String): DataFrame =
    spark.read.parquet(path)
      .select(col(keyCol), col("sum"), col("cnt"),
        (col("sum") / col("cnt")).as("avg"))

  private def partials(rows: DataFrame, keyCol: String, valueCol: String): DataFrame =
    rows.groupBy(col(keyCol))
      .agg(sum(col(valueCol)).cast("long").as("sum"),
        count(col(valueCol)).as("cnt"))
      .withColumn("bucket", bucketOf(col(keyCol)))
}

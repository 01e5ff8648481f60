package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 maintenance — versioned dimension
  * history with validity intervals, the warehouse primitive for "what did
  * this customer's segment look like WHEN the order shipped" (the as-of
  * join's natural table shape; eq01 consumes exactly this kind of data).
  *
  * History schema: key, attribute struct, `valid_from`, `valid_to`
  * (null = open/current version), `is_current`. An update batch is
  * (key, attributes, ts). Semantics per key, in ts order:
  *   - a genuinely CHANGED attribute tuple closes the open version at the
  *     update ts and opens a new one;
  *   - an update identical to the prevailing version is a NO-OP (no
  *     version churn from idempotent re-deliveries);
  *   - several updates to one key in one batch chain correctly;
  *   - keys absent from the batch are never touched;
  *   - an update EARLIER than the open version's valid_from fails the
  *     merge at execution time: closed intervals are immutable history,
  *     and silently splicing a late update before the open version would
  *     overlap them. Out-of-order feeds must be repaired upstream (or the
  *     key's history rebuilt); the guard runs distributed, costs one
  *     window aggregate over the batch-sized merge frame, and names the
  *     offending key in the error.
  *
  * Scale shape: the merge runs only over keys PRESENT in the batch (one
  * left-semi prune of the history), everything hashes on the key, and
  * per-key state inside the window pass is one lagged attribute struct —
  * no version lists are ever collected. The stored variant reuses the
  * IncrementalAgg bucket layout, so a small batch rewrites only the
  * key-hash buckets it touches — O(batch + affected slice), independent
  * of history size.
  */
object Scd2 {

  /** Pure merge: returns the post-batch history frame.
    *
    * @param history current SCD2 table (key, attrs..., valid_from,
    *                valid_to, is_current)
    * @param updates batch (key, attrs..., tsCol)
    * @param keyCol  dimension key column name
    * @param tsCol   update-effective-time column in `updates`
    * @param attrs   tracked attribute column names (version identity) */
  def merge(history: DataFrame, updates: DataFrame, keyCol: String,
      tsCol: String, attrs: Seq[String]): DataFrame = {
    val key = col(keyCol)
    val attrStruct: Column = struct(attrs.map(col): _*)
    val batchKeys = updates.select(key).distinct()

    // keys not in the batch pass through byte-identical
    val untouched = history.join(batchKeys, Seq(keyCol), "left_anti")
    val affected = history.join(batchKeys, Seq(keyCol), "left_semi")
    // closed versions of affected keys are immutable history — only the
    // OPEN version participates in the merge
    val closed = affected.filter(!col("is_current"))
    val open = affected.filter(col("is_current"))

    // candidate version stream per key: the open version (at its original
    // valid_from) then the batch updates, in time order; src breaks the
    // tie so the prevailing version sorts first at equal timestamps
    val cand0 = open
      .select(key, attrStruct.as("a"), col("valid_from").as("ts"), lit(0).as("src"))
      .unionByName(updates
        .select(key, attrStruct.as("a"), col(tsCol).as("ts"), lit(1).as("src")))
    // fail fast on late-arriving updates (ts before the open version):
    // they would sort ahead of the open version and overlap immutable
    // closed history. assert_true keeps the guard inside the lazy plan
    // and the filter keeps it from being pruned away.
    val wKey = Window.partitionBy(key)
    val cand = cand0
      .withColumn("__open_from",
        max(when(col("src") === 0, col("ts"))).over(wKey))
      .withColumn("__no_late", assert_true(
        col("src") === 0 || col("__open_from").isNull ||
          col("ts") >= col("__open_from"),
        concat(lit(s"SCD2 late-arriving update: $keyCol="), key.cast("string"),
          lit(" has ts before the open version's valid_from; "
            + "repair the feed or rebuild this key's history"))))
      .filter(col("__no_late").isNull)
      .drop("__open_from", "__no_late")
    val wOrd = Window.partitionBy(key).orderBy(col("ts"), col("src"))
    // drop candidates equal to the version they would supersede; repeat
    // suppression must compare against the last SURVIVING version, which
    // for (open, upd1=open, upd2=upd1) collapses to the plain lag chain
    // only after the first differing row — two window passes: mark equal-
    // to-lag, then keep rows whose attrs differ from the previous KEPT
    // row. A run of identical candidates has exactly one survivor (the
    // first), so lag-based suppression IS last-survivor suppression.
    val marked = cand
      .withColumn("prev_a", lag(col("a"), 1).over(wOrd))
      .filter(col("prev_a").isNull || !(col("a") <=> col("prev_a")))
    val merged = marked
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(wOrd))
      .withColumn("is_current", col("valid_to").isNull)
      .select(Seq(key) ++ attrs.map(n => col("a").getField(n).as(n)) ++
        Seq(col("valid_from"), col("valid_to"), col("is_current")): _*)

    untouched.unionByName(closed).unionByName(merged)
  }

  /** Quarantining merge — the operational variant of [[merge]] for CDC
    * feeds where occasional late updates are expected: instead of
    * failing the whole merge job for one bad key, rows whose ts lands
    * BEFORE the open version's valid_from are split to a side output
    * (with every original update column intact, ready to write to a
    * quarantine table for upstream repair) and the remaining rows merge
    * normally. The fail-fast [[merge]] stays the default: quarantining
    * must be an explicit operational decision, because a quarantined row
    * is an update the dimension will never reflect until someone acts.
    *
    * @return (post-batch history, quarantined update rows) */
  def mergeWithQuarantine(history: DataFrame, updates: DataFrame,
      keyCol: String, tsCol: String, attrs: Seq[String]): (DataFrame, DataFrame) = {
    val key = col(keyCol)
    // one broadcast-ready frame of open-version anchors; a key with no
    // open version (first sighting) can never be late
    val openFrom = history.filter(col("is_current"))
      .select(key, col("valid_from").as("__open_from"))
    val flagged = updates.join(openFrom, Seq(keyCol), "left")
      .withColumn("__late",
        col("__open_from").isNotNull && col(tsCol) < col("__open_from"))
    val quarantined = flagged.filter(col("__late"))
      .drop("__open_from", "__late")
    val ok = flagged.filter(!col("__late"))
      .drop("__open_from", "__late")
    (merge(history, ok, keyCol, tsCol, attrs), quarantined)
  }

  /** First write: every batch row opens a version at its own ts. */
  def init(spark: SparkSession, path: String, rows: DataFrame,
      keyCol: String, tsCol: String, attrs: Seq[String]): Unit = {
    val empty = rows
      .select(Seq(col(keyCol)) ++ attrs.map(col) ++ Seq(
        col(tsCol).as("valid_from"),
        // valid_to must take tsCol's own type (epoch longs, dates, ...):
        // a hard-coded timestamp cast fails the unionByName with the
        // merged frame, whose valid_to is lead(ts) in tsCol's native type
        lit(null).cast(rows.schema(tsCol).dataType).as("valid_to"),
        lit(true).as("is_current")): _*)
      .limit(0)
    writeBucketed(path, merge(empty, rows, keyCol, tsCol, attrs), keyCol)
  }

  /** Merge a batch into the stored table, rewriting only the key-hash
    * buckets the batch touches (IncrementalAgg layout + staging). */
  def ingest(spark: SparkSession, path: String, updates: DataFrame,
      keyCol: String, tsCol: String, attrs: Seq[String]): Unit =
    PartitionedLayout.withDynamicOverwrite(spark) {
      val stored = spark.read.parquet(path)
      val buckets = updates.select(bucketOf(col(keyCol)).as("bucket")).distinct()
      val slice = stored.join(broadcast(buckets), Seq("bucket"), "left_semi")
        .drop("bucket")
      val merged = merge(slice, updates, keyCol, tsCol, attrs)
      PartitionedLayout.withStaging(spark, path,
          merged.withColumn("bucket", bucketOf(col(keyCol)))) { staged =>
        staged.write.mode("overwrite").partitionBy("bucket").parquet(path)
      }
    }

  /** Point-in-time lookup: the version of each key valid at `at`. */
  def asOf(table: DataFrame, at: Column): DataFrame =
    table.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))

  private def bucketOf(key: Column) =
    pmod(hash(key), lit(IncrementalAgg.NumBuckets))

  private def writeBucketed(path: String, df: DataFrame, keyCol: String): Unit =
    df.withColumn("bucket", bucketOf(col(keyCol)))
      .write.mode("overwrite").partitionBy("bucket").parquet(path)
}

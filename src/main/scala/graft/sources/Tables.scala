package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the star-schema + document/embedding corpus (TESTDATA.md).
  *
  * One parquet file per table. All reads go through here so that scan-level
  * concerns (schema pinning, future bucketing/partitioning of the 100 TB
  * layout) live in one place. Parquet scans get predicate pushdown + column
  * pruning from Catalyst for free — query code just selects/filters.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS), which Spark's parquet
    * reader rejects ([PARQUET_TYPE_ILLEGAL]). Read nanos as long via the
    * legacy conf, then rebuild a microsecond timestamp column — semantics
    * identical at any granularity the queries use (>= microsecond).
    *
    * graft.Sessions sets `nanosAsLong` at session construction; a
    * set/restore scoped to this method would NOT work because the parquet
    * reader consults the conf again at physical planning, i.e. after this
    * method returns. For sessions built outside graft.Sessions we set it
    * here once if absent — a documented session-wide requirement of the
    * events table, not a silent per-read side effect. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    if (!spark.conf.getOption(key).contains("true")) spark.conf.set(key, "true")
    import org.apache.spark.sql.functions._
    // `div` (integral) — a double division of epoch-nanos (~1.7e18) loses
    // the low bits (2^53 mantissa) and lands a microsecond off
    load(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every table as a temp view — the SQL catalog surface.
    * Routes through the per-table loaders so schema quirks (events' nanos
    * timestamps) are handled regardless of which query runs first.
    * Memoized per (session, dir): registration costs one parquet-footer
    * read per table, which is catalog START-UP cost, not per-query cost;
    * a session conf key records the registered dir so repeat callers
    * (aq04, q29, ad-hoc spark.sql users) don't re-pay it. The fixture
    * dirs are immutable, so re-registration is only needed when the dir
    * actually changes. */
  def registerAll(spark: SparkSession, dir: String): Unit = {
    val key = "graft.catalog.registeredDir"
    if (spark.conf.getOption(key).contains(dir)) return
    names.foreach { n =>
      val df = if (n == "events") events(spark, dir) else load(spark, dir, n)
      df.createOrReplaceTempView(n)
    }
    spark.conf.set(key, dir)
  }

  /** Fan a narrow scan out to all cores before CPU-heavy per-row work.
    *
    * The test fixtures are single-row-group parquet files, so Spark plans
    * ONE scan task regardless of maxPartitionBytes — and a regex-cascade
    * ETL or shingling pass then runs on one core. One cheap round-robin
    * shuffle of the narrow input (MBs) buys full-cluster parallelism for
    * the expensive projection. On a real 100 TB layout scans are already
    * split; this guards the small-file / few-row-group edge, which exists
    * at every scale (the "last small dimension file" problem). */
  def fanOut(spark: SparkSession, df: DataFrame): DataFrame =
    df.repartition(spark.sparkContext.defaultParallelism)
}

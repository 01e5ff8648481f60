package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Local-mode settings tuned for the test harness (local[N], one JVM) while
  * keeping every knob that matters at cluster scale explicit:
  *   - AQE on (runtime re-plan: partition coalescing, skew-join splitting)
  *   - shuffle.partitions sized to the machine, not the 200 default
  *   - UTC session timezone so results hash-match the DuckDB oracle
  */
object Sessions {
  def local(appName: String = "graft", cpus: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // Reference-compatible cast semantics (Spark 3.5 pre-ANSI): failed
      // string→number casts yield null, which the regex-ETL cascades rely on.
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}

package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine query: the Spark implementation plus (when SQL-expressible)
  * the ANSI SQL a DuckDB oracle runs over the same parquet tables.
  * Column names/ordering semantics must line up between the two — the
  * driver sorts columns by name and hash-compares values.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    measurement: Boolean = false) {
  /** Tag this row as a MEASUREMENT row: its output is a metric about
    * the engine (recall, latency split, drift, footprint, candidate
    * fraction), not a query answer a user would consume. Bench reports
    * engine-query and measurement-row subtotals separately, so a
    * regression in a 1-second engine query stays visible as the
    * deliberate measurement rows accumulate wall. */
  def measured: QueryDef = copy(measurement = true)
}

object QueryDef {
  def sqlChecked(name: String, oracle: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(oracle))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}

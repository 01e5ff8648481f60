package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric helpers for oracle-exact aggregation.
  *
  * Floating-point SUM/AVG are association-order dependent, so a parallel
  * Spark sum and a DuckDB sum of the same doubles can differ in the last
  * bits. Casting each row to a fixed-scale decimal BEFORE the sum makes the
  * aggregate exact and order-independent in both engines; casting the exact
  * decimal result back to double is then deterministic. This is also the
  * right call at 100 TB: decimal partial aggregates stay exact across any
  * number of shuffle partitions.
  */
object Num {
  private val D = DecimalType(30, 6)

  /** Order-independent, engine-portable sum of a double expression. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast("double")

  /** Order-independent average (sum/count, double division at the end). */
  def davg(c: Column): Column = dsum(c) / count(c)

  /** DuckDB oracle fragment equivalent to [[dsum]]. */
  def sqlDsum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(30,6))) AS DOUBLE)"

  /** DuckDB oracle fragment equivalent to [[davg]]. */
  def sqlDavg(expr: String): String =
    s"${sqlDsum(expr)} / COUNT(($expr))"
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: each left row picks up the most recent right row with
  * right.time <= left.time for the same key — the temporal-lookup
  * operator Spark's built-in join surface lacks (the builder-prompt's
  * canonical example of a custom operator).
  *
  * Composition strategy (rung (a) of the ladder — built-ins express the
  * semantics exactly, no custom plan needed): tag both sides, UNION, one
  * window pass per key ordered by (time, side) carrying the right-side
  * payload forward with last(ignoreNulls), keep left rows. Right-before-
  * left on time ties makes the match INCLUSIVE (right.ts == left.ts
  * matches), mirroring ASOF JOIN ... ON l.ts >= r.ts.
  *
  * Scale: ONE shuffle of (|L|+|R|) rows on the key + a linear in-order
  * scan per key — the same asymptotics as a dedicated sort-merge as-of
  * operator, and AQE-skew-splittable like any window. No per-row lookups,
  * no broadcast requirement on either side.
  *
  * Caller contract: right side must be unique per (key, time) — dedupe
  * first or the carried payload is the max-by-insertion arbitrary row.
  */
object AsOfJoin {

  /** @param rightPayload right-side columns to carry onto left rows
    *                     (each emitted as `asof_<name>`, null if no match) */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideTag = "__asof_side"
    val timeCol = "__asof_ts"
    val rTagged = right.select(
      (col(key) +: (col(rightTime).as(timeCol) +: lit(0).as(sideTag) +:
        (rightPayload.map(c => col(c).as(s"asof_$c")) ++
          leftCols.filterNot(_ == key).map(c => lit(null).as(c))))): _*)
    val lTagged = left.select(
      (col(key) +: (col(leftTime).as(timeCol) +: lit(1).as(sideTag) +:
        (rightPayload.map(c => lit(null).as(s"asof_$c")) ++
          leftCols.filterNot(_ == key).map(col)))): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(timeCol), col(sideTag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(rTagged.unionByName(lTagged)) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried
      .filter(col(sideTag) === 1)
      .drop(sideTag, timeCol)
  }
}

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
    *                     (each emitted as `asof_<name>`, null if no match).
    *
    * All payload columns travel as ONE struct carried by a single
    * last(ignoreNulls) — the struct is non-null for every right row, so the
    * match is row-atomic: a matching right row with a null in one payload
    * column yields that null, never a value backfilled from an older right
    * row. (Per-column last() would mix columns across right rows.) */
  def joinAsOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val sideTag = "__asof_side"
    val timeCol = "__asof_ts"
    val payload = "__asof_payload"
    val rTagged = right.select(
      (col(key) +: (col(rightTime).as(timeCol) +: lit(0).as(sideTag) +:
        (struct(rightPayload.map(c => col(c).as(s"asof_$c")): _*).as(payload) +:
          leftCols.filterNot(_ == key).map(c => lit(null).as(c))))): _*)
    val lTagged = left.select(
      (col(key) +: (col(leftTime).as(timeCol) +: lit(1).as(sideTag) +:
        (lit(null).as(payload) +:
          leftCols.filterNot(_ == key).map(col)))): _*)
    val w = Window.partitionBy(col(key))
      .orderBy(col(timeCol), col(sideTag))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rTagged.unionByName(lTagged)
      .withColumn(payload, last(col(payload), ignoreNulls = true).over(w))
      .filter(col(sideTag) === 1)
      .select((rightPayload.map(c => col(s"$payload.asof_$c").as(s"asof_$c")) ++
        leftCols.map(col)): _*)
  }
}

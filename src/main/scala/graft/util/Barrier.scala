package graft.util

import org.apache.spark.sql.DataFrame

/** Optimizer barrier for layered expression pipelines.
  *
  * Catalyst's CollapseProject + PushPredicateThroughProject SUBSTITUTE
  * aliases into consumers. For a cascade like
  * fixture-CASE → regex parse → derived labels → filter, each layer
  * references the previous one several times, so inlining multiplies:
  * the jq04 plan reached 371 KB of duplicated regex/CASE trees, codegen
  * fell back to interpreted mode, and a 150k-row map took 15 s.
  *
  * `stage(df)` re-roots the frame on the upstream RDD lineage
  * (LogicalRDD): still lazy, still distributed, nothing materialized —
  * but the optimizer cannot substitute across it, so each stage's
  * expressions are evaluated exactly once per row. Use it where a real
  * pipeline would have a table boundary (ETL output, feature output).
  * The cost is a row-format conversion at the boundary; the win is
  * linear-size plans and whole-stage codegen staying on.
  */
object Barrier {
  def stage(df: DataFrame): DataFrame =
    df.sparkSession.createDataFrame(df.rdd, df.schema)
}

package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe of a string column against a broadcast
  * `org.apache.spark.util.sketch.BloomFilter` — the map-side pre-filter of
  * the decontamination pipeline (dq07b) as a native codegen'd expression.
  *
  * Spark's own `might_contain` expression only pairs with filters built by
  * `BloomFilterAggregate` (xxhash64-of-long domain), not with the public
  * `DataFrameStatFunctions.bloomFilter` API, so probing a stat-built
  * filter is usually done with a Scala UDF — boxing every row and breaking
  * whole-stage codegen exactly where the 100 TB corpus scan is hottest.
  * Rung (b) instead: the expression carries only the broadcast HANDLE
  * (the bitset ships once via torrent, not per-task in the serialized
  * plan), resolves it lazily per executor, and the generated code calls
  * a plain instance method — the surrounding projection stays fused.
  *
  * `mightContainBinary` over the UTF8String's bytes is bit-identical to
  * `mightContainString` (which UTF-8-encodes and delegates), so probes
  * match filters built from the same strings without materializing
  * java.lang.String per row. Null in → null out (nullIntolerant), which
  * under `filter()` drops nulls — same semantics as the UDF it replaces.
  */
case class BloomProbe(bloom: Broadcast[BloomFilter], child: Expression)
    extends UnaryExpression with Serializable {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_probe"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.catalogString}")
  }

  @transient private lazy val filter: BloomFilter = bloom.value

  /** Public so generated code can call it on the referenced instance. */
  def probe(s: UTF8String): Boolean = filter.mightContainBinary(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    probe(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomProbe].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)
}

object BloomProbe {
  /** DataFrame-API entry point. */
  def mightContain(bloom: Broadcast[BloomFilter], col: Column): Column =
    GraftBridge.column(BloomProbe(bloom, GraftBridge.expression(col)))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: spark.ml's FEATURE-HASHING murmur3 of a
  * string — `Murmur3_x86_32.hashUnsafeBytes2(utf8, seed=42)`, the exact
  * function `HashingTF`/`FeatureHasher` bucket terms with.
  *
  * Exists because Spark SQL's builtin `hash()` is NOT that function:
  * both are murmur3 x86_32 seed 42 over the UTF-8 bytes, but `hash()`
  * (`hashUnsafeBytes`) mixes each TAIL byte through a full
  * mixK1/mixH1 round AS SIGNED, while the ML side (`hashUnsafeBytes2`)
  * is reference MurmurHash3 — the ≤3 tail bytes XOR-accumulate
  * little-endian into one k1, one mixK1, no extra h1 mix (measured:
  * "job" buckets to 1557 under ML, 2470 under `hash()` at 3000
  * features). A frozen-model replay (mq16) must reproduce the model's
  * buckets, so it needs the ML variant as a first-class codegen'd
  * expression — the (b) rung of the custom-operator ladder, calling
  * THE SAME platform method the model called at training time (zero
  * reimplementation risk on the Spark side; the DuckDB oracle replays
  * the algorithm arithmetically, [[graft.ml.FrozenJobTfidf]]).
  *
  * 100 TB: one fused hash call per row inside whole-stage codegen — no
  * UDF boundary, no allocation beyond the already-materialized UTF8
  * bytes. */
case class MlMurmur3(child: Expression)
    extends UnaryExpression with Serializable {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_ml_murmur3"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val s = a.asInstanceOf[UTF8String]
    Murmur3_x86_32.hashUnsafeBytes2(
      s.getBaseObject, s.getBaseOffset, s.numBytes(), MlMurmur3.Seed)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.hash.Murmur3_x86_32
         |  .hashUnsafeBytes2($s.getBaseObject(), $s.getBaseOffset(),
         |    $s.numBytes(), ${MlMurmur3.Seed});
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MlMurmur3 =
    copy(child = newChild)
}

object MlMurmur3 {
  /** FeatureHasher/HashingTF's fixed seed. */
  val Seed: Int = 42

  /** Column-API entry point. */
  def apply(c: Column): Column =
    GraftBridge.column(MlMurmur3(GraftBridge.expression(c)))
}

package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native expression.
  *
  * Canonical-composition normalization is the first step of any serious
  * text-cleaning pipeline (the same glyph "é" arrives both precomposed
  * U+00E9 and decomposed e+U+0301; un-normalized corpora double-count
  * vocabulary, split dedup clusters, and leak near-duplicates past
  * hash-based dedup) — yet Spark ships no normalization function at all.
  * Rung (b) of the custom-operator ladder: a UnaryExpression over
  * java.text.Normalizer (the JDK's ICU-derived implementation of UAX #15)
  * with a codegen'd helper call, so it composes inside whole-stage
  * codegen like any built-in.
  *
  * Scale note: real corpus text is overwhelmingly ALREADY in NFC, so the
  * hot path is `Normalizer.isNormalized` — a scan that allocates nothing
  * and lets us return the original UTF8String untouched (no
  * decode→normalize→re-encode round trip). Only the rare decomposed row
  * pays for materialization. Null in → null out (nullIntolerant).
  */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with Serializable {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.NfcNormalize.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  /** DataFrame-API entry point. */
  def nfc(text: Column): Column =
    GraftBridge.column(NfcNormalize(GraftBridge.expression(text)))

  /** Static so generated code calls it without a reference object. */
  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}

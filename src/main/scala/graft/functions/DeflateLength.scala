package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** DEFLATE-compressed length of a string — the compression-ratio quality
  * signal of corpus curation (Gopher/CCNet lineage): text that machine-
  * compresses far below ~0.3× its raw size is boilerplate, template spam,
  * or token repetition that per-token heuristics (fq03) under-detect
  * because the repetition spans longer ranges than single tokens or
  * bigrams. ratio = graft_deflate_len(text) / octet_length(text).
  *
  * Native expression (rung (b)): compression is inherently sequential
  * per document and allocation-heavy if done via UDF boxing; here the
  * codegen'd call feeds the UTF-8 bytes straight from the UTF8String to
  * one Deflater per evaluation (level 6, raw/nowrap — no zlib header
  * noise in tiny inputs), keeping the surrounding projection inside
  * whole-stage codegen. Deterministic for a given JDK zlib, which is why
  * the query consuming it is rows-only with spec'd invariants rather
  * than cross-engine hash-checked (DuckDB ships no compression scalar).
  */
case class DeflateLength(child: Expression)
    extends UnaryExpression with Serializable {

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_deflate_len"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    DeflateLength.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev,
      c => s"${ev.value} = graft.functions.DeflateLength.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(child = newChild)
}

object DeflateLength {
  /** DataFrame-API entry point. */
  def deflateLen(text: Column): Column =
    GraftBridge.column(DeflateLength(GraftBridge.expression(text)))

  /** Static so generated code calls it without a reference object. */
  def compute(s: UTF8String): Int = {
    val in = s.getBytes
    val d = new java.util.zip.Deflater(6, true)
    try {
      d.setInput(in)
      d.finish()
      val buf = new Array[Byte](1024)
      var total = 0
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }
}

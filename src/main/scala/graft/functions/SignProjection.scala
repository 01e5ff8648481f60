package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: all `planes` random-hyperplane sign
  * projections of one quantized embedding in a single fused loop —
  * dots[p] = Σ_i signs[p·dim + i] · x[i] over BIGINT milli-unit
  * coordinates (exact, engine-portable arithmetic).
  *
  * This is the (b) rung of the custom-operator ladder for the LSH
  * signature stage. The declarative alternatives both lose by orders of
  * magnitude at a few hundred planes: an explode × broadcast-sign-matrix
  * equi-join + partial aggregation materializes rows·dim·planes join
  * tuples through the hash aggregate (61M for sq02c's 480-plane sweep —
  * ~9 s in-bench), and an in-row `transform`/`aggregate` fold never
  * enters whole-stage codegen (15.5 s interpreted, the round-10
  * HOF-no-codegen trap). Here the sign matrix rides along as a
  * `±1`-byte reference object and the multiply-adds run as one tight
  * JIT-compiled nest inside WholeStageCodegen — no join, no shuffle, no
  * per-element lambda dispatch.
  *
  * 100 TB shape: signatures are embarrassingly map-side; this keeps the
  * entire signature stage at memory bandwidth so the candidate join
  * (the only shuffle) stays the sole scaling term.
  *
  * Semantics: null in → null out; vectors shorter than `dim` use the
  * available prefix (equal-length embeddings are the upstream contract).
  */
case class SignProjection(child: Expression, signs: Array[Byte],
    planes: Int, dim: Int)
    extends UnaryExpression with Serializable {

  require(signs.length == planes * dim,
    s"sign matrix length ${signs.length} != $planes x $dim")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_sign_project"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = math.min(dim, x.numElements())
    val dots = new Array[Long](planes)
    var p = 0
    while (p < planes) {
      var acc = 0L
      val off = p * dim
      var i = 0
      while (i < n) {
        acc += signs(off + i) * x.getLong(i)
        i += 1
      }
      dots(p) = acc
      p += 1
    }
    new GenericArrayData(dots)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val s = ctx.addReferenceObj("signs", signs, "byte[]")
      val n = ctx.freshName("n")
      val p = ctx.freshName("p")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val acc = ctx.freshName("acc")
      val dots = ctx.freshName("dots")
      s"""
         |int $n = java.lang.Math.min($dim, $a.numElements());
         |long[] $dots = new long[$planes];
         |for (int $p = 0; $p < $planes; $p++) {
         |  long $acc = 0L;
         |  int $off = $p * $dim;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += $s[$off + $i] * $a.getLong($i);
         |  }
         |  $dots[$p] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($dots);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignProjection =
    copy(child = newChild)
}

object SignProjection {
  /** Column-API entry point: `planes` signed projections of a
    * quantized (array<bigint>) vector under the flattened ±1 matrix. */
  def apply(x: Column, signs: Array[Byte], planes: Int, dim: Int): Column =
    GraftBridge.column(
      SignProjection(GraftBridge.expression(x), signs, planes, dim))
}

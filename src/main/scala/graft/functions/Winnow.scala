package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm): rolling polynomial hashes of every k-char gram,
  * then the rightmost-minimum of each w-hash window, deduplicated and
  * sorted. Guarantees every shared substring of length ≥ w+k−1 between two
  * documents yields at least one shared fingerprint, while keeping the
  * fingerprint density at ~2/(w+1) per character — bounded per-document
  * state, which is what makes fingerprint-based near-dup detection viable
  * at 100 TB (vs hashing every k-gram).
  *
  * Native expression (rung (b) of the custom-operator ladder): the rolling
  * hash + monotonic-deque window minimum is inherently sequential per
  * document — array built-ins would re-hash every gram from scratch
  * (O(n·k)) and can't express the deque. One fused O(n) loop, codegen via
  * a compiled helper call so the surrounding projection stays whole-stage.
  */
case class Winnow(child: Expression, k: Int, w: Int)
    extends UnaryExpression with Serializable {
  require(k >= 2 && w >= 1, "winnow needs k >= 2, w >= 1")

  override def nullIntolerant: Boolean = true
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  /** Codegen-reachable instance method (k, w baked in). */
  def compute(s: UTF8String): ArrayData = Winnow.compute(s, k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("winnow", this, classOf[Winnow].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

object Winnow {
  private val B = 1000003L // polynomial rolling-hash base

  def compute(s: UTF8String, k: Int, w: Int): ArrayData = {
    val str = s.toString
    val n = str.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val m = n - k + 1
    // rolling hashes of all k-grams: h(i+1) = (h(i) − c(i)·B^(k−1))·B + c(i+k)
    val hs = new Array[Long](m)
    var pow = 1L
    var h = 0L
    var i = 0
    while (i < k) {
      h = h * B + str.charAt(i)
      if (i < k - 1) pow *= B
      i += 1
    }
    hs(0) = h
    i = 1
    while (i < m) {
      h = (h - str.charAt(i - 1) * pow) * B + str.charAt(i + k - 1)
      hs(i) = h
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (m <= w) { // single window: global rightmost minimum
      var best = 0
      var j = 1
      while (j < m) { if (hs(j) <= hs(best)) best = j; j += 1 }
      selected.add(hs(best))
    } else {
      // monotonic deque of gram indexes (hashes increasing head→tail);
      // popping on >= makes the surviving minimum the RIGHTMOST one, the
      // paper's tie rule (maximizes window-to-window re-selection)
      val dq = new Array[Int](m)
      var head = 0
      var tail = 0
      var lastSel = -1
      var j = 0
      while (j < m) {
        while (tail > head && hs(dq(tail - 1)) >= hs(j)) tail -= 1
        dq(tail) = j
        tail += 1
        val windowStart = j - w + 1
        if (windowStart >= 0) {
          while (dq(head) < windowStart) head += 1
          if (dq(head) != lastSel) {
            lastSel = dq(head)
            selected.add(hs(lastSel))
          }
        }
        j += 1
      }
    }
    val out = new Array[Long](selected.size)
    var idx = 0
    val it = selected.iterator()
    while (it.hasNext) { out(idx) = it.next(); idx += 1 }
    new GenericArrayData(out) // sorted distinct fingerprints
  }

  /** Column-API entry point. */
  def apply(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(Winnow(GraftBridge.expression(text), k, w))
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Physical as-of join: a single streaming merge over co-partitioned,
  * (key, time)-sorted children — the plan a dedicated time-series engine
  * would pick.
  *
  * Scale shape: EnsureRequirements gives both sides one hash exchange on
  * the key plus a sort, identical to a SortMergeJoin's prologue; the merge
  * itself holds ONE right row per key in memory (the current as-of
  * candidate), so per-task state is O(1) regardless of group size — vs the
  * union+window composition, which buffers each key's window frame. No
  * codegen: the merge is a stateful two-iterator walk, the part of the
  * operator codegen cannot express; children still codegen up to the sort.
  *
  * Ties: right.time == left.time matches (inclusive, same as the composed
  * operator and DuckDB's ASOF semantics with >=).
  */
case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute], payloadOut: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  // payloadOut attrs are born here, not read from children
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(payloadOut)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val keyType = leftKey.dataType
    val timeType = leftTime.dataType
    val lKeyIdx = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTimeIdx = left.output.indexWhere(_.exprId == leftTime.exprId)
    val rKeyIdx = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTimeIdx = right.output.indexWhere(_.exprId == rightTime.exprId)
    val payloadIdx = payload.map(a => right.output.indexWhere(_.exprId == a.exprId))
    val payloadTypes = payload.map(_.dataType)
    val outAttrs = output
    val inAttrs = left.output ++ payloadOut

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val keyOrd = TypeUtils.getInterpretedOrdering(keyType)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val resultProj = UnsafeProjection.create(outAttrs, inAttrs)
      val joined = new JoinedRow
      val nullPayload = new GenericInternalRow(payload.size)
      // current unconsumed right row; sort iterators reuse row objects, so
      // anything held across next() must be a copy
      var rBuf: InternalRow = if (rIter.hasNext) rIter.next().copy() else null
      var lastKey: Any = null
      var lastPayload: InternalRow = null

      lIter.map { lrow =>
        val lk = lrow.get(lKeyIdx, keyType)
        val lt = lrow.get(lTimeIdx, timeType)
        // consume right rows at or before (lk, lt) in key-major order;
        // rows with a smaller key can never match a later (sorted) left row
        var advancing = true
        while (advancing && rBuf != null) {
          val rk = rBuf.get(rKeyIdx, keyType)
          val kc = keyOrd.compare(rk, lk)
          if (kc < 0 ||
              (kc == 0 && timeOrd.compare(rBuf.get(rTimeIdx, timeType), lt) <= 0)) {
            if (kc == 0) { // newest matching row so far for this key
              lastKey = rk
              val vals = new GenericInternalRow(payload.size)
              var i = 0
              while (i < payloadIdx.length) {
                vals.update(i, rBuf.get(payloadIdx(i), payloadTypes(i)))
                i += 1
              }
              lastPayload = vals
            }
            rBuf = if (rIter.hasNext) rIter.next().copy() else null
          } else advancing = false
        }
        val p =
          if (lastPayload != null && keyOrd.compare(lastKey, lk) == 0) lastPayload
          else nullPayload
        resultProj(joined(lrow, p))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

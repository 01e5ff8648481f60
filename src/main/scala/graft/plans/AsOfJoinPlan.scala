package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeSet}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical as-of join node — rung (c) of the custom-operator ladder: a
  * whole-operator semantic Spark's built-in join surface lacks, carried
  * through planning as a first-class plan node so the physical strategy
  * (AsOfJoinExec's streaming sort-merge) is chosen by the planner, not
  * hand-assembled by the caller.
  *
  * Semantics match graft.operators.AsOfJoin (the union+window composition,
  * kept as the no-extension fallback): every left row picks up the payload
  * of the most recent right row with right.time <= left.time for the same
  * key; nulls when no such row. Right side unique per (key, time) — caller
  * contract shared with the composed form.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    payload: Seq[Attribute], payloadOut: Seq[Attribute]) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ payloadOut
  // payloadOut attrs are born here, not read from children
  override def producedAttributes: AttributeSet = AttributeSet(payloadOut)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

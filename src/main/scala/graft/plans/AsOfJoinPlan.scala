package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}

/** Logical node for a left as-of join: each left row is paired with the
  * single right row in the same key group having the greatest
  * `rightTime <= leftTime` (ties on time broken by `rightTies`, greatest
  * tuple wins — matching [[graft.ops.TemporalJoins.asofJoin]] and DuckDB
  * `ASOF LEFT JOIN`). Unmatched left rows keep null right columns.
  *
  * This is rung (c) of the custom-operator ladder: whole-operator
  * semantics Spark's DataFrame API lacks, expressed as a first-class
  * plan node so Catalyst sees a single operator (column pruning and
  * filter pushdown still apply to the children), planned by
  * [[GraftStrategy]] into the sort-merge [[graft.plans.AsOfJoinExec]].
  */
final case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTies: Seq[Expression]) extends BinaryNode {

  require(leftKeys.nonEmpty && leftKeys.size == rightKeys.size,
    "as-of join needs at least one equi-key and matching key arity")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

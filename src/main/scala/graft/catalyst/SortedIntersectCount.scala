package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `sorted_intersect_count(a, b)` — size of the intersection of two
  * ASCENDING-sorted integral arrays (both `array<bigint>` or both
  * `array<int>`), by a single merge walk (O(|a|+|b|), zero allocation —
  * no intersection array is ever built). The int variant exists for
  * shuffle-byte economy: when node ids fit 32 bits the adjacency
  * arrays — the bulk of the triangle closing's shuffle traffic — move
  * at half width (q163's conditioned narrow-id path).
  *
  * This is the triangle-count kernel (q163): with edges degree-oriented,
  * each triangle is counted exactly once as a common out-neighbor of an
  * oriented edge's endpoints, so the whole O(m^1.5) wedge volume
  * becomes per-row array arithmetic inside whole-stage codegen instead
  * of 10⁷-row wedge materialization through an exchange + sort. The
  * built-in `size(array_intersect(a, b))` computes the same number but
  * builds a per-row hash set AND the result array; this kernel is the
  * reason a custom Expression exists at all — counting without
  * materializing.
  *
  * PRECONDITION: both arrays sorted ascending with no duplicates (the
  * producer is `sort_array(collect_set(...))`-shaped). Not enforced at
  * runtime — a gate spec pins kernel == size(array_intersect) on random
  * sorted inputs.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      // containsNull=false only: the merge walk reads elements with
      // getLong/getInt, which silently decode a null slot as 0 — a
      // nullable-element array type would produce wrong counts with no
      // error. Producers are sort_array(collect_set/collect_list)-shaped,
      // which never emit null elements (r10 ADVICE).
      case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(IntegerType, false), ArrayType(IntegerType, false)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sorted_intersect_count requires two array<bigint> or two " +
          s"array<int> with non-nullable elements (inputs must be " +
          s"ascending-sorted and duplicate-free, e.g. " +
          s"sort_array(collect_set(...))), got ${l.catalogString}, " +
          s"${r.catalogString}")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  private def isInt: Boolean = left.dataType match {
    case ArrayType(IntegerType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isInt)
      SortedIntersectCount.countInt(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      SortedIntersectCount.count(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (isInt) "countInt" else "count"
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.catalyst.SortedIntersectCount.$m($a, $b)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {
  /** Static merge-walk kernel, callable from generated code. */
  def count(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }

  /** Int-element variant (same walk, half the bytes per element). */
  def countInt(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      val x = a.getInt(i)
      val y = b.getInt(j)
      if (x < y) i += 1
      else if (x > y) j += 1
      else { n += 1; i += 1; j += 1 }
    }
    n
  }
}

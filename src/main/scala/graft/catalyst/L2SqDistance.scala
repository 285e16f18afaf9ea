package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `l2sq_distance(a, b)` — native Catalyst expression for the squared
  * Euclidean distance of two equal-length float/double vectors.
  *
  * Determinism contract (the [[CosineSimilarity]] discipline): the
  * accumulator sums `(a(i) − b(i))²` in ascending index order with every
  * element widened to double first — the same IEEE op sequence as the
  * DuckDB `list_reduce(list_transform(...))` left fold and as
  * [[IvfProbe]]'s per-centroid loop, so distances hash bit-identically
  * cross-engine. One fused JVM loop inside whole-stage codegen replaces
  * an interpreted `aggregate(zip_with(...))` fold (the q79 lesson: the
  * HOF path evaluates a lambda per element and was half that query).
  */
case class L2SqDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"l2sq_distance requires two array<float|double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2sq_distance"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    L2SqDistance.compute(a.asInstanceOf[ArrayData], elemIsFloat(left),
      b.asInstanceOf[ArrayData], elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.catalyst.L2SqDistance.compute($a, ${elemIsFloat(left)}, " +
        s"$b, ${elemIsFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L2SqDistance =
    copy(left = newLeft, right = newRight)
}

object L2SqDistance {
  /** Static kernel, callable from generated code. Sums run in index
    * order — do not reorder or vectorize into a different association;
    * the DuckDB oracle folds left in the same order. */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean)
      : Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"l2sq_distance: length mismatch ${n} vs ${b.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      // LOUD on null elements (r13 ADVICE): ArrayData.getFloat/getDouble
      // on a null slot silently yields 0.0 — a wrong distance, not an
      // error. Schemas commonly carry containsNull=true even when no
      // nulls exist (parquet default), so the gate is runtime, not
      // checkInputDataTypes.
      if (a.isNullAt(i) || b.isNullAt(i))
        throw new IllegalArgumentException(
          s"l2sq_distance: null element at index $i — vectors must be dense")
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      val dx = x - y
      acc += dx * dx
      i += 1
    }
    acc
  }
}

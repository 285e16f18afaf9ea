package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `cosine_similarity(a, b)` — native Catalyst expression for the cosine
  * of two equal-length float/double vectors.
  *
  * Determinism contract: bit-identical to the composed formulation in
  * [[graft.ml.SimilarityOps]] (`aggregate(zip_with(...))` left folds) and
  * its DuckDB oracle — each accumulator (dot, |a|², |b|²) sums in index
  * order with every element widened to double first, and the final
  * expression associates as `dot / (sqrt(na) * sqrt(nb))`. One fused JVM
  * loop replaces three interpreted higher-order-function folds (Catalyst
  * evaluates lambda bodies per element without codegen), and the static
  * call participates in whole-stage codegen.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isVec(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity requires two array<float|double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    CosineSimilarity.compute(a.asInstanceOf[ArrayData], elemIsFloat(left),
      b.asInstanceOf[ArrayData], elemIsFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.catalyst.CosineSimilarity.compute($a, ${elemIsFloat(left)}, " +
        s"$b, ${elemIsFloat(right)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Static kernel, callable from generated code. Sums run in index
    * order — do not reorder or vectorize into a different association;
    * the DuckDB oracle folds left in the same order. */
  def compute(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean)
      : Double = {
    val n = a.numElements()
    require(b.numElements() == n,
      s"cosine_similarity: length mismatch ${n} vs ${b.numElements()}")
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (java.lang.Math.sqrt(na) * java.lang.Math.sqrt(nb))
  }
}

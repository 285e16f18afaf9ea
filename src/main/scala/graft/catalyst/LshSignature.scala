package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `LshSignature(v, planes)` — native Catalyst expression for the
  * random-hyperplane LSH signature: bit i is set iff `dot(v, planes(i))
  * >= 0`.
  *
  * Determinism contract: each plane's dot is a left fold in index order
  * with elements widened to double (identical to the composed
  * `aggregate(zip_with(...))` per plane and the DuckDB `list_reduce`
  * oracle). One pass over the vector updates all plane accumulators —
  * per-plane order is preserved, so every accumulator sees the same
  * addition sequence as the composed form. Replaces `planes.length`
  * interpreted higher-order folds with one codegen-participating static
  * call.
  *
  * The plane matrix is a constructor parameter (a query-compile-time
  * constant), not a child expression — it serializes with the plan.
  */
case class LshSignature(child: Expression, planes: Seq[Seq[Int]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_signature requires array<float|double>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_signature"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // the flattened plane matrix, shared by interpreted and codegen paths
  @transient private lazy val flat: Array[Int] = planes.flatten.toArray
  private def nPlanes: Int = planes.length

  override protected def nullSafeEval(input: Any): Any =
    LshSignature.compute(input.asInstanceOf[ArrayData], elemIsFloat,
      flat, nPlanes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // embed the plane matrix once as a class field of the generated code
    val planesRef = ctx.addReferenceObj("lshPlanes", flat, "int[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.catalyst.LshSignature.compute($c, $elemIsFloat, $planesRef, $nPlanes)")
  }

  override protected def withNewChildInternal(newChild: Expression): LshSignature =
    copy(child = newChild)
}

object LshSignature {
  /** Static kernel. `flat` is the row-major plane matrix
    * (nPlanes × dim). Per-plane sums accumulate in vector-index order —
    * do not reorder; the oracle folds left in the same order. */
  def compute(v: ArrayData, isFloat: Boolean, flat: Array[Int], nPlanes: Int)
      : Long = {
    val dim = v.numElements()
    val acc = new Array[Double](nPlanes)
    var i = 0
    while (i < dim) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      var p = 0
      while (p < nPlanes) {
        acc(p) += x * flat(p * dim + i)
        p += 1
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < nPlanes) {
      if (acc(p) >= 0) sig |= 1L << p
      p += 1
    }
    sig
  }
}

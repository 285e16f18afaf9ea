package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Residual product-quantization kernels — the encode/ADC pair of the
  * classic IVF-PQ design (q214): vectors are PQ-coded on their RESIDUAL
  * against the coarse centroid of their cell (`v − c_cell`), which
  * centers every cell's population near the origin and tightens ADC at
  * the same byte budget.
  *
  * Both expressions take (vector, cell id) and carry the coarse
  * centroids (k_cells × Dim) plus the residual codebooks
  * (M × K × SubDim) as plan REFERENCE OBJECTS (the [[IvfProbe]] /
  * [[CmsEstimate]] pattern — plan text stays constant in codebook
  * size), and run as static calls inside whole-stage codegen. A
  * composed formulation would need a per-row zip_with residual
  * subtraction — an interpreted lambda over every corpus element, the
  * exact HOF trap q79 measured at half its runtime.
  *
  * Determinism contract (oracle = DuckDB folds): per (m, j) the
  * distance accumulates `((v[i] − c[i]) − w[i])²` in ascending index
  * order with the vector element widened to double first — the same
  * IEEE op sequence as the oracle's left fold — and argmin tie-breaks
  * on the smaller codeword index (strict-less replacement over
  * ascending j). ADC table entries snap to the integer ppm grid with
  * `floor(d · 1e6 + 0.5)` exactly as the oracle spells it.
  */
object PqResidual {
  /** M codes (0-based codeword indices), one per subspace. */
  def encode(v: ArrayData, cell: Int,
      cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): ArrayData = {
    require(cell >= 0 && cell < cents.length,
      s"pq_encode_residual: cell $cell outside codebook 0..${cents.length - 1}")
    require(v.numElements() == cents(0).length,
      s"pq_encode_residual: vector dim ${v.numElements()} != codebook dim " +
        s"${cents(0).length}")
    val c = cents(cell)
    val m = books.length
    val out = new Array[Int](m)
    var mi = 0
    // cumulative subspace offset from the ACTUAL per-book widths (r13
    // ADVICE: `mi * sd` assumed equal widths; heterogeneous books would
    // silently mis-slice even though the summed widths tile Dim)
    var lo = 0
    while (mi < m) {
      val book = books(mi)
      val sd = book(0).length
      var best = 0
      var bd = Double.MaxValue
      var j = 0
      while (j < book.length) {
        val w = book(j)
        var acc = 0.0
        var i = 0
        while (i < sd) {
          val dx = (v.getFloat(lo + i).toDouble - c(lo + i)) - w(i)
          acc += dx * dx
          i += 1
        }
        if (acc < bd) { bd = acc; best = j }
        j += 1
      }
      out(mi) = best
      lo += sd
      mi += 1
    }
    new GenericArrayData(out)
  }

  /** The per-query ADC distance table for ONE probed cell: M × K longs,
    * table[m][j] = floor(subL2sq(residual, codeword) · 1e6 + 0.5). */
  def adcTable(v: ArrayData, cell: Int,
      cents: Array[Array[Double]],
      books: Array[Array[Array[Double]]]): ArrayData = {
    require(cell >= 0 && cell < cents.length,
      s"pq_adc_residual: cell $cell outside codebook 0..${cents.length - 1}")
    require(v.numElements() == cents(0).length,
      s"pq_adc_residual: vector dim ${v.numElements()} != codebook dim " +
        s"${cents(0).length}")
    val c = cents(cell)
    val rows = new Array[ArrayData](books.length)
    var mi = 0
    var lo = 0 // cumulative per-book offset (see encode)
    while (mi < books.length) {
      val book = books(mi)
      val sd = book(0).length
      val row = new Array[Long](book.length)
      var j = 0
      while (j < book.length) {
        val w = book(j)
        var acc = 0.0
        var i = 0
        while (i < sd) {
          val dx = (v.getFloat(lo + i).toDouble - c(lo + i)) - w(i)
          acc += dx * dx
          i += 1
        }
        row(j) = math.floor(acc * 1000000 + 0.5).toLong
        j += 1
      }
      rows(mi) = new GenericArrayData(row)
      lo += sd
      mi += 1
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }
}

sealed trait PqResidualExpr extends BinaryExpression {
  def cents: Array[Array[Double]]
  def books: Array[Array[Array[Double]]]
  require(cents.nonEmpty && books.nonEmpty && books.forall(_.nonEmpty),
    "residual PQ needs non-empty centroid and codebook tables")
  require(books.map(b => b(0).length).sum == cents(0).length,
    "subspace widths must tile the full dimension exactly")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, int), got " +
          s"${l.catalogString}, ${r.catalogString}")
    }
}

case class PqEncodeResidual(left: Expression, right: Expression,
    cents: Array[Array[Double]], books: Array[Array[Array[Double]]])
    extends PqResidualExpr {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode_residual"

  override protected def nullSafeEval(v: Any, cell: Any): Any =
    PqResidual.encode(v.asInstanceOf[ArrayData], cell.asInstanceOf[Int],
      cents, books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "double[][]")
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.catalyst.PqResidual.encode($v, $c, $centsRef, $booksRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeResidual =
    copy(left = newLeft, right = newRight)
}

case class PqAdcResidual(left: Expression, right: Expression,
    cents: Array[Array[Double]], books: Array[Array[Array[Double]]])
    extends PqResidualExpr {
  override def dataType: DataType =
    ArrayType(ArrayType(LongType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_adc_residual"

  override protected def nullSafeEval(v: Any, cell: Any): Any =
    PqResidual.adcTable(v.asInstanceOf[ArrayData], cell.asInstanceOf[Int],
      cents, books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("pqCents", cents, "double[][]")
    val booksRef = ctx.addReferenceObj("pqBooks", books, "double[][][]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.catalyst.PqResidual.adcTable($v, $c, $centsRef, $booksRef)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcResidual =
    copy(left = newLeft, right = newRight)
}

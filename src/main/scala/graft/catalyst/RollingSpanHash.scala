package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `rolling_span_hashes(text, span)` — native Catalyst expression
  * computing the Rabin-Karp polynomial hash of EVERY `span`-character
  * window of a string at stride 1, in O(n) per row (the rolling
  * update; a lambda-based spelling would be O(n·span) since Catalyst
  * does no CSE inside lambda bodies).
  *
  * The kernel powers exact cross-document substring dedup
  * (graft.text.DedupOps q226): hashes are the SHUFFLE representation —
  * 8 bytes per window position instead of `span` characters — and are
  * never trusted for equality; candidates are re-verified against the
  * actual substring text, so the wrap-around mod-2^64 arithmetic needs
  * no collision guarantees.
  *
  * Window indexing is by CODE POINT, exactly matching Spark's
  * `length()` and `Column.substr` semantics, so a returned position i
  * (1-based) always satisfies `substr(text, i, span)` = the hashed
  * window.
  */
case class RollingSpanHash(child: Expression, span: Int)
    extends UnaryExpression {
  require(span >= 1, s"rolling_span_hashes: span must be >= 1, got $span")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_span_hashes requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_span_hashes"

  override protected def nullSafeEval(input: Any): Any =
    RollingSpanHash.compute(input.asInstanceOf[UTF8String], span)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.catalyst.RollingSpanHash.compute($c, $span)")

  override protected def withNewChildInternal(newChild: Expression)
      : RollingSpanHash = copy(child = newChild)
}

object RollingSpanHash {
  /** Polynomial base; odd and large so low bits mix. Arithmetic is
    * plain wrap-around mod 2^64 — collisions are handled by the
    * caller's verify step, never by the hash. */
  val B = 1000003L

  /** Static kernel, callable from generated code. Returns one hash per
    * window start (code-point indexed); empty for strings shorter than
    * `span`. */
  def compute(text: UTF8String, span: Int): ArrayData = {
    val s = text.toString
    // code-point array: indexing must match Spark length()/substr
    val n = s.codePointCount(0, s.length)
    if (n < span) return new GenericArrayData(Array.empty[Long])
    val cps = new Array[Int](n)
    var ci = 0
    var k = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      cps(k) = cp
      k += 1
      ci += Character.charCount(cp)
    }
    var pow = 1L // B^(span-1), wrap-around
    var i = 0
    while (i < span - 1) { pow *= B; i += 1 }
    val out = new Array[Long](n - span + 1)
    var h = 0L
    i = 0
    while (i < span) { h = h * B + cps(i); i += 1 }
    out(0) = h
    i = span
    while (i < n) {
      h = (h - cps(i - span) * pow) * B + cps(i)
      out(i - span + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }
}

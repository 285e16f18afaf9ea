package graft.catalyst

import graft.text.PortableHash
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `cms_estimate(term)` — native Catalyst expression probing a FROZEN
  * Count-Min sketch ([[graft.ml.CMSketch]]) for a term's frequency
  * estimate (the q55 heavy-hitter bound check).
  *
  * This replaces the last Scala UDF in an operator path (r9 verdict
  * task 2): the sketch's (depth × width) table is embedded as a plan
  * REFERENCE OBJECT (`ctx.addReferenceObj` — shipped once per plan, like
  * a literal, ~80 KB at the default 5×2048), and the probe is a static
  * call inside whole-stage codegen: no `ScalaUDF` node, no encoder
  * round-trip, no broadcast-variable plumbing. The hash is the same
  * seeded [[PortableHash]] the sketch was built with, so native and
  * aggregator-side bucketing agree bit-for-bit (pinned by
  * CmsEstimateSpec: native == UDF output over the whole vocabulary).
  *
  * The sketch is an immutable snapshot taken on the driver — the
  * expression is only correct for probing the FINISHED sketch, which is
  * exactly the two-pass q55 shape (fold stream → sketch, then score
  * terms against it).
  */
case class CmsEstimate(child: Expression, depth: Int, width: Int,
    table: Array[Long]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate requires string, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(input: Any): Any =
    CmsEstimate.estimate(input.asInstanceOf[UTF8String], depth, width, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tableRef = ctx.addReferenceObj("cmsTable", table, "long[]")
    defineCodeGen(ctx, ev,
      c => s"graft.catalyst.CmsEstimate.estimate($c, $depth, $width, $tableRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)
}

object CmsEstimate {
  /** Static kernel, callable from generated code. Must bucket exactly
    * like [[graft.ml.CMSketch.bucket]]: seeded portable hash of
    * "row:key" mod width, minimum across rows (CMS point estimate —
    * never below the true count). */
  def estimate(key: UTF8String, depth: Int, width: Int, table: Array[Long]): Long = {
    val k = key.toString
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = table(r * width + (PortableHash.hash60Jvm(r + ":" + k) % width).toInt)
      if (v < best) best = v
      r += 1
    }
    best
  }
}

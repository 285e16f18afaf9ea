package graft.catalyst

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinBinningRuleSpec extends SparkSpec {

  private def withRule[T](width: Option[String])(f: => T): T = {
    val had = spark.experimental.extraOptimizations.contains(RangeJoinBinningRule)
    if (!had) spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinBinningRule
    width.foreach(w => spark.conf.set(RangeJoinBinningRule.ConfKey, w))
    try f
    finally {
      spark.conf.unset(RangeJoinBinningRule.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == RangeJoinBinningRule)
    }
  }

  private def fact = spark.range(5000)
    .select(col("id"), (col("id") * 37 % 100000).cast("double").as("v"))
  // overlapping intervals incl. fractional bounds (the (hi-1) trick of
  // the manual operator would under-cover these)
  private def intervals = spark.range(50)
    .select(col("id").as("iid"),
      (col("id") * 2000.0 + 0.5).as("lo"),
      (col("id") * 2000.0 + 3000.7).as("hi"))

  test("band join rewrites to a hash join on the bin and keeps results") {
    val expected = fact.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(expected.nonEmpty)
    withRule(Some("1000")) {
      val joined = fact.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"rule must eliminate the nested-loop join:\n$plan")
      assert(plan.contains("__graft_bin"), s"bin key missing:\n$plan")
      val got = joined.select("id", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    }
  }

  test("auto mode: rule fires with NO conf, width from span stats, results identical") {
    val expected = fact.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    withRule(None) { // conf unset → auto: avg(hi-lo)≈3000 becomes the width
      val joined = fact.join(intervals,
        col("v") >= col("lo") && col("v") < col("hi"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        s"auto mode must still eliminate the nested-loop join:\n$plan")
      assert(plan.contains("__graft_bin"), s"bin key missing:\n$plan")
      val got = joined.select("id", "iid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected)
    }
  }

  test("rule disabled with binWidth=off") {
    withRule(Some("off")) {
      val plan = fact.join(intervals,
          col("v") >= col("lo") && col("v") < col("hi"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    }
  }

  test("auto mode backs off on an empty interval side (no width derivable)") {
    withRule(None) {
      val empty = intervals.filter(col("iid") < 0)
      val plan = fact.join(empty,
          col("v") >= col("lo") && col("v") < col("hi"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_bin"), plan)
    }
  }

  test("joins that already have an equi key are left alone") {
    withRule(Some("1000")) {
      val plan = fact.join(intervals,
          col("id") % 50 === col("iid") &&
            col("v") >= col("lo") && col("v") < col("hi"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_bin"),
        s"equi-join must not gain a bin key:\n$plan")
    }
  }
}

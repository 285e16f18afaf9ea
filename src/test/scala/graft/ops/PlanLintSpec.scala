package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** PlanLint: each rule fires on a plan known to contain the smell and
  * stays quiet on a plan known to be clean.
  */
class PlanLintSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def rules(df: org.apache.spark.sql.DataFrame): Set[String] =
    PlanLint.lint(df).map(_.rule).toSet - "shuffle-count"

  test("flags the intentional 1x1 cross join in q09") {
    val df = RelationalOps.queries("q09_audit_counts")(spark, sf)
    assert(rules(df).contains("cross-join"))
  }

  test("flags a global window and is quiet on a keyed one") {
    val base = Tables.orders(spark, sf)
    val global = base.withColumn("rn",
      row_number().over(Window.orderBy("o_orderkey")))
    assert(rules(global).contains("global-window"))
    val keyed = base.withColumn("rn", row_number().over(
      Window.partitionBy("o_custkey").orderBy("o_orderkey")))
    assert(!rules(keyed).contains("global-window"))
  }

  test("q63 map-only sampling: zero shuffles, no joins/windows, and its " +
      "computed hash predicate is NOT a finding (unpushable by construction)") {
    val df = graft.text.SamplingOps.queries("q63_stratified_sample")(spark, sf)
    val fs = PlanLint.lint(df)
    // the seeded-hash sampling predicate is computed per row — parquet
    // could never evaluate it, so nothing was lost and the lint is quiet
    assert(fs.map(_.rule).toSet === Set("shuffle-count"))
    assert(fs.find(_.rule == "shuffle-count").get.detail === "0")
  }

  test("q16 reports exactly one shuffle exchange") {
    val df = RelationalOps.queries("q16_multikey_agg")(spark, sf)
    val n = PlanLint.lint(df).find(_.rule == "shuffle-count").get.detail
    assert(n === "1")
  }

  test("unpushed-scan fires only on a real pushdown loss: quiet on " +
      "computed predicates and on predicates that pushed") {
    // computed predicate: parquet can never evaluate it — not a loss
    val computed = Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey") * 7, lit(13)) === 0)
    assert(!rules(computed).contains("unpushed-scan"))
    // pushable predicate that DID push — quiet
    val pushable = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 100000)
    assert(!rules(pushable).contains("unpushed-scan"))
    // the real loss: the same eligible predicate stranded above the scan
    // by an intervening non-deterministic projection (planning cannot
    // push filters through rand() for correctness)
    val lost = Tables.orders(spark, sf)
      .select(col("o_totalprice"), rand().as("r"))
      .filter(col("o_totalprice") > 100000)
    assert(rules(lost).contains("unpushed-scan"))
  }

  test("report() returns the findings as a DataFrame") {
    val df = RelationalOps.queries("q09_audit_counts")(spark, sf)
    val rep = PlanLint.report(spark, df)
    assert(rep.columns.toSeq === Seq("rule", "node", "detail"))
    assert(rep.filter(col("rule") === "cross-join").count() >= 1)
  }
}

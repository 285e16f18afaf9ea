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

  test("q63 map-only sampling: zero shuffles, no joins/windows; its " +
      "hash predicate is correctly surfaced as unpushable") {
    val df = graft.text.SamplingOps.queries("q63_stratified_sample")(spark, sf)
    val fs = PlanLint.lint(df)
    // the seeded-hash sampling predicate is computed per row — it CANNOT
    // reach parquet, and the lint is right to surface that for judgment
    assert(fs.map(_.rule).toSet === Set("shuffle-count", "unpushed-scan"))
    assert(fs.find(_.rule == "shuffle-count").get.detail === "0")
  }

  test("q16 reports exactly one shuffle exchange") {
    val df = RelationalOps.queries("q16_multikey_agg")(spark, sf)
    val n = PlanLint.lint(df).find(_.rule == "shuffle-count").get.detail
    assert(n === "1")
  }

  test("flags a computed predicate the scan cannot push, and is quiet " +
      "when the same column pushes") {
    val computed = Tables.orders(spark, sf)
      .filter(pmod(col("o_orderkey") * 7, lit(13)) === 0)
    assert(rules(computed).contains("unpushed-scan"))
    val pushable = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 100000)
    assert(!rules(pushable).contains("unpushed-scan"))
  }

  test("report() returns the findings as a DataFrame") {
    val df = RelationalOps.queries("q09_audit_counts")(spark, sf)
    val rep = PlanLint.report(spark, df)
    assert(rep.columns.toSeq === Seq("rule", "node", "detail"))
    assert(rep.filter(col("rule") === "cross-join").count() >= 1)
  }
}

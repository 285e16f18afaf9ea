package graft.plans

import graft.SparkSpec

/** Physical-plan regression pins: the plan properties the 100 TB design
  * depends on, asserted so a refactor can't silently regress them.
  * (Initial pre-AQE plans — shape, not runtime re-planning.)
  */
class PlanShapeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def plan(name: String): String =
    graft.SparkEntry.queries(name)(spark, sf)
      .queryExecution.executedPlan.toString

  // The suite-wide cartesian and global-window sweeps (with their
  // rationaled allowlists) moved to graft.ops.PlanLintGateSpec, the
  // one-pass PlanLint CI gate that also checks unpushed scans. This spec
  // keeps the targeted per-query plan pins.

  test("q05 inner join broadcasts the dimension side") {
    assert(plan("q05_join_inner").contains("BroadcastHashJoin"))
  }

  test("q63 stratified sample is map-only (zero exchanges)") {
    assert(!plan("q63_stratified_sample").contains("Exchange"))
  }

  test("q18 top-k plans TakeOrderedAndProject, not a global sort") {
    val p = plan("q18_topk")
    assert(p.contains("TakeOrderedAndProject"), p.take(800))
  }

  test("q03 predicates reach the parquet scan as pushed filters") {
    val p = plan("q03_predicates")
    assert(p.contains("PushedFilters: ["), p.take(800))
    assert(!p.replaceAll("PushedFilters: \\[\\]", "").contains("PushedFilters: []")
      || p.contains("PushedFilters: [Is"), p.take(800))
  }

  test("q01 aggregation is partial before the exchange (map-side combine)") {
    val p = plan("q01_agg")
    val aggBeforeExchange = p.indexOf("HashAggregate") < p.indexOf("Exchange")
    assert(p.contains("Exchange") && aggBeforeExchange, p.take(1200))
  }

  test("q16 8-key aggregation shuffles exactly once") {
    val p = plan("q16_multikey_agg")
    assert("Exchange hashpartitioning".r.findAllIn(p).length == 1, p.take(1200))
  }
}

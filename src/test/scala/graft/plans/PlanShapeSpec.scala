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

  /** Queries with an INTENTIONAL nested-loop/cross join, each bounded by
    * construction: q09 joins two 1-row count frames (reference S4 shape);
    * q98 broadcasts a 1-row global-bounds frame onto the scan; q28/q29
    * pair a broadcast ≤10-row query set against the corpus on a
    * non-equi predicate; q87 pairs a fixed-size (<200-key) block; q66's
    * quantile VALUES frame is 5 literal rows (same for q97's bounds
    * when AQE picks BNLJ).
    */
  private val boundedCrossAllowed = Set(
    "q09_audit_counts", "q98_histogram", "q28_cosine_topk", "q29_ann_lsh",
    "q87_fuzzy_match", "q66_exact_quantiles", "q97_winsorized_stats",
    "q53_embedding_near_dup", "q86_date_spine",
    // 1-row broadcast scalar frames (corpus totals onto per-term scores;
    // q108's totals row onto per-key counts; q113's Dim-row Gramian /
    // 1-row eigenvector iteration frames — the corpus pass itself is
    // join-free)
    "q38_tfidf_top_terms", "q68_collocations", "q108_key_skew",
    "q113_power_iteration",
    // q126's 1-row total-weight frame broadcast onto the bucketed
    // cumsum (the corpus pass is a single bucket-keyed window)
    "q126_weighted_systematic",
    // the BROADCAST band-join path by design — q76 is the binned
    // non-broadcast alternative for large interval sides
    "q59_range_join",
    // q132's corpus pass broadcasts the single query row
    "q132_rrf_fusion",
    // q133's global prior is a 1-row broadcast onto the cell frame
    "q133_target_encoding",
    // q136's corpus length stats are a 1-row broadcast onto the tf frame
    "q136_bm25_ranking")

  test("no unbounded cartesian or nested-loop join anywhere in the suite") {
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val p = plan(name)
      val hasCross = p.contains("CartesianProduct") ||
        p.contains("BroadcastNestedLoopJoin")
      if (hasCross && !boundedCrossAllowed(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"unexpected cartesian/nested-loop joins in: $offenders")
  }

  /** Queries with an INTENTIONAL empty-PARTITION-BY window, every one on
    * a bounded post-aggregation frame, never on the raw data: the
    * reference's W3 global LAG runs on the monthly mart (q12/q45); q86's
    * spine is |months| rows; q108/q119/q123 rank a handful of summary
    * rows; q126's offset window covers |buckets| rows; q131 ranks the
    * path census; q48/q18-family global ranks are the suite's own
    * ordering demos on capped frames.
    */
  private val boundedGlobalWindowAllowed = Set(
    "q12_window_lag_global", "q45_gold_executive_summary", "q48_window_suite",
    "q86_date_spine", "q108_key_skew", "q119_mixture_manifest",
    "q123_sequence_funnel", "q126_weighted_systematic", "q131_session_paths",
    // contingency-table marginals: SUM() OVER () on the |types|×7 cells
    "q117_chi_square",
    // q132 ranks its two TakeOrdered 100-row pools, never the corpus
    "q132_rrf_fusion")

  test("global windows appear only on known bounded frames (PlanLint sweep)") {
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val findings = graft.ops.PlanLint.lint(
        graft.SparkEntry.queries(name)(spark, sf))
      if (findings.exists(_.rule == "global-window") &&
        !boundedGlobalWindowAllowed(name)) Some(name) else None
    }
    assert(offenders.isEmpty, s"unexpected global windows in: $offenders")
  }

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

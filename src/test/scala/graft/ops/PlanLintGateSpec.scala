package graft.ops

import graft.SparkSpec

/** Suite-wide PlanLint CI gate (round-3 verdict item 7): every
  * registered query's physical plan is linted against an explicit,
  * rationaled allowlist. A new cartesian product, data-sized global
  * window, or unpushed scan filter anywhere in the suite fails this spec
  * — the review-time analogue of `graft.engine.Checks` for plans.
  *
  * The allowlists are the PlanShapeSpec exemption tables (moved here
  * when the two per-rule sweeps were consolidated into this one-pass
  * gate); every entry is bounded by construction, with the rationale
  * recorded next to it.
  */
class PlanLintGateSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

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
    "q136_bm25_ranking",
    // q139's pair comparison crosses the two |sources|-row signature
    // frames (≤ S² pairs of 128-long arrays, broadcast both sides)
    "q139_source_minhash_similarity",
    // q141's vocabulary size V is a 1-row broadcast scalar onto the
    // scored-bigram stream (the LM count joins themselves are keyed)
    "q141_lm_perplexity",
    // q145 rewrites the vocab frame against each round's 1-row learned
    // merge pair (TakeOrdered(1) broadcast, never a collected literal)
    "q145_bpe_merges",
    // q146's merged-sketch row crosses the 1-row global exact count
    "q146_hll_union",
    // q147's node count N is a 1-row broadcast onto the rank frame at
    // initialization and after each iteration's aggregation
    "q147_pagerank",
    // q150's corpus-total row broadcasts onto the source×lang cells
    "q150_mixture_drift",
    // q154's corpus token total is a 1-row broadcast onto the ≤1000-row
    // coverage frame
    "q154_vocab_coverage",
    // q156 composes q28+q29, inheriting their broadcast ≤10-row query
    // set × corpus non-equi pairing (both allowlisted above)
    "q156_ann_recall",
    // q163 assembles its final row from three 1-row scalar count frames
    // (nodes, edges, triangles) — the graph passes themselves are keyed
    // joins with broadcast degree frames
    "q163_triangle_count",
    // q165's pooled totals are a 1-row broadcast onto the |cohorts|-row
    // frame (the corpus pass is a single map-side-combinable aggregation)
    "q165_ab_test",
    // q170 inherits q28's broadcast ≤10-row query set × corpus non-equi
    // pairing (two rankings over the same scored frame)
    "q170_matryoshka_audit",
    // q171's basket total N is a 1-row broadcast onto the pair frame
    "q171_frequent_pairs",
    // q172's cohort totals (n1, n2) are a 1-row broadcast onto the
    // cumulative census
    "q172_ks_drift",
    // q175's corpus total is a 1-row broadcast onto the 9-digit frame
    "q175_benford",
    // q177's quantization bounds and total-count frames are 1-row
    // broadcasts onto the map-only quantize/bucket passes
    "q177_zorder_layout",
    // q176 assembles its single row from three 1-row sketch/count frames
    // (the corpus passes are plain aggregations)
    "q176_hll_intersection",
    // q184's boundary pick pairs the ranked reference against the
    // broadcast 100-row percentile frame (q66's rank-and-pick shape);
    // scoring itself is a keyed broadcast join + map-only array fold
    "q184_pit_scoring",
    // q187's bounds/winning-bucket/median frames are all 1-row
    // broadcasts onto the map-only binning passes
    "q187_global_median",
    // q192 cross-assembles its six audit rows from three 1-row check
    // frames (scan-wide conditionals, uniqueness rollup, anti-join count)
    "q192_dq_audit",
    // q204 assembles its single row from three 1-row frames (two KMV
    // sketches + the exact-truth flag rollup) — the q176 pattern
    "q204_kmv_set_algebra",
    // q207 inherits q28's broadcast ≤10-row query set × corpus
    // non-equi pairing (Hamming + cosine over the same scored frame)
    "q207_binary_quantization",
    // q208 same shape: the ≤10-row broadcast query set (ADC tables in
    // tow) pairs against the coded corpus on the non-equi
    // query_id <> vec_id predicate — map-only over the corpus
    "q208_product_quantization",
    // q215's exact-reference audit is q212's verbatim (the ANN path
    // itself is an equi-join on the cell key against the persisted
    // index; only the ≤10-row broadcast audit pass is non-equi)
    "q215_persisted_ivfpq",
    // q227 runs the SAME search-gate body as q215 (shared
    // ivfpqSearchGate) over the upsert-maintained index — identical
    // ≤10-row broadcast audit, identical rationale
    "q227_incremental_ivfpq",
    // q212/q214's exact-reference audit passes are the same q208/q28
    // shape (the RETRIEVAL paths themselves equi-join on the cell id)
    "q212_ivfpq_search", "q214_residual_ivfpq")

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
    // q218 recomputes q45's derived tail (the same global monthly lag)
    // from maintained ≤|months| state — the corpus never sees a window
    "q218_incremental_gold",
    // q238 is q218's production-shape one-batch variant: the same
    // mart tail over the same ≤|months| maintained state
    "q238_exec_summary_onebatch",
    "q86_date_spine", "q108_key_skew", "q119_mixture_manifest",
    "q123_sequence_funnel", "q126_weighted_systematic", "q131_session_paths",
    // contingency-table marginals: SUM() OVER () on the |types|×7 cells
    "q117_chi_square",
    // q132 ranks its two TakeOrdered 100-row pools, never the corpus
    "q132_rrf_fusion",
    // q149's prefix-sum window runs on the partition-count frame
    // (≤ 32 rows by construction) — the corpus itself gets only
    // partitioned windows; that inversion is the point of the operator
    "q149_global_rownumber",
    // q154's rank+cumsum windows run on the TakeOrdered ≤1000-row
    // top-vocabulary frame, never the vocabulary itself
    "q154_vocab_coverage",
    // q172's prefix-sum offsets window covers the ≤32-row partition-count
    // frame (the census itself gets pid-partitioned windows — q149 shape)
    "q172_ks_drift",
    // q174's prefix-MIN offsets window covers the ≤32-row partition-min
    // frame (the corpus gets pid-partitioned windows — q149 with MIN)
    "q174_global_skyline",
    // q177's prefix-sum offsets window covers the ≤32-row partition-count
    // frame (q149 shape — the corpus gets only pid-partitioned windows)
    "q177_zorder_layout",
    // q179's centered-12 window runs on the |months| monthly mart
    // (q12/W3 precedent), never the orders scan
    "q179_seasonal_decomposition",
    // q186's suffix-sum windows run on the calendar-bounded gap
    // histogram (≤ |distinct gap hours| rows), never the events scan
    "q186_survival_curve",
    // q187's prefix-sum windows ride the ≤1024-row bucket histogram and
    // the single winning bucket's value census (distinct values ≤ the
    // bucket's integer width by construction) — never the corpus; that
    // inversion is the selection algorithm's point
    "q187_global_median",
    // q189's prefix-sum offsets window covers the ≤32-row partition-count
    // frame (q149 shape — the score census gets pid-partitioned windows)
    "q189_auc",
    // q198's prefix-sum offsets window covers the ≤32-row partition-count
    // frame (q149 shape) and its corpus-total window the 16-row shard
    // frame — the corpus itself gets only pid-partitioned windows
    "q198_shard_packing")

  /** Queries where a FilterExec legitimately sits above a scan with no
    * pushed predicate — populated only with rationaled entries discovered
    * by the sweep (predicates on computed/derived columns parquet cannot
    * evaluate). */
  private val unpushedScanAllowed = Set.empty[String]

  /** Queries with an INTENTIONAL collect_set/collect_list over a window
    * frame, each with a bounded collected domain: q166's rolling
    * COUNT(DISTINCT part) collects part ids over a 3-quarter RANGE frame
    * per supplier — the buffer is ≤ |parts one supplier ships in 3
    * quarters|, and its scaladoc points hot-key cases at q167, the
    * HLL-sketch formulation that never buffers the domain. */
  private val windowCollectAllowed = Set("q166_window_distinct")

  /** Queries with an INTENTIONAL ScalaUDF — each is FIXTURE SYNTHESIS
    * (building genuine PNG/JPEG/GIF container bytes per row via
    * ImageFixtures.payloadFor, i.e. input construction for the codec
    * under test), not a data operator. Operator paths are UDF-free:
    * the q55 Count-Min probe moved to the native CmsEstimate expression
    * (r9 verdict task 2), which this rule now guards suite-wide. */
  private val scalaUdfAllowed = Set(
    "q194_image_header_decode", "q34_media_features", "q72_frame_sample",
    "q73_resize_plan", "q199_wav_header_decode",
    // q219/q220/q225's UDFs encode the baseline-JPEG fixture bytes per
    // row (input construction for JpegPixelCodec, the codec under test)
    "q219_jpeg_pixel_stats", "q220_jpeg_color_stats",
    "q225_jpeg_422_stats")

  test("suite-wide gate: every query's plan is lint-clean modulo the allowlist, " +
      "and per-query shuffle counts match the golden budget") {
    // The golden budget (src/test/resources/shuffle_budget.tsv) is
    // SCALE.md's shuffle inventory mechanized: a refactor that silently
    // adds an exchange to ANY of the 193 queries fails here. Regenerate
    // with `sbt "Test/runMain graft.ops.ShuffleBudgetDump"` only when a
    // plan change is intentional, and say why in the commit message.
    // Caveat: queries that eagerly localCheckpoint intermediates
    // (q90/q147/q163/q178/q190) truncate lineage, so their recorded
    // count covers only the FINAL assembly — the checkpointed fronts
    // are audited in SCALE.md/PLANS.md instead.
    val golden: Map[String, String] = {
      val src = scala.io.Source.fromInputStream(
        getClass.getResourceAsStream("/shuffle_budget.tsv"), "UTF-8")
      try src.getLines().map { l =>
        val Array(n, c) = l.split("\t"); n -> c
      }.toMap finally src.close()
    }
    val drift = scala.collection.mutable.ArrayBuffer[String]()
    // drift is bidirectional (r6 ADVICE): a query deleted from the suite
    // must also leave the golden file, or stale rows accumulate unseen
    golden.keySet.diff(graft.SparkEntry.queries.keySet).toSeq.sorted
      .foreach(n => drift += s"$n: in golden budget but not in the suite (regenerate)")
    val offenders = graft.SparkEntry.queries.keys.toSeq.sorted.flatMap { name =>
      val findings = PlanLint.lint(graft.SparkEntry.queries(name)(spark, sf))
      val shuffles = findings.find(_.rule == "shuffle-count").map(_.detail)
      (golden.get(name), shuffles) match {
        case (Some(g), Some(actual)) if g != actual =>
          drift += s"$name: golden $g, actual $actual"
        case (None, _) => drift += s"$name: not in golden budget (regenerate)"
        case _ =>
      }
      findings.flatMap {
        case f if f.rule == "cross-join" && !boundedCrossAllowed(name) =>
          Some(s"$name [${f.rule}] ${f.detail.take(90)}")
        case f if f.rule == "global-window" && !boundedGlobalWindowAllowed(name) =>
          Some(s"$name [${f.rule}] ${f.detail.take(90)}")
        case f if f.rule == "unpushed-scan" && !unpushedScanAllowed(name) =>
          Some(s"$name [${f.rule}] ${f.detail.take(90)}")
        case f if f.rule == "window-collect" && !windowCollectAllowed(name) =>
          Some(s"$name [${f.rule}] ${f.detail.take(90)}")
        case f if f.rule == "scala-udf" && !scalaUdfAllowed(name) =>
          Some(s"$name [${f.rule}] ${f.detail.take(90)}")
        case _ => None
      }
    }
    assert(offenders.isEmpty,
      s"PlanLint gate: new findings need a fix or a rationaled allowlist entry:\n  ${offenders.mkString("\n  ")}")
    assert(drift.isEmpty,
      s"shuffle budget drift (intentional? regenerate via ShuffleBudgetDump and explain):\n  ${drift.mkString("\n  ")}")
  }

  test("q161 storage-partitioned join executes with ZERO shuffle exchanges") {
    // r5 regression gate: the DSv2 bucketing flag moved from a per-query
    // conf.set to session build; this pins that the EXECUTED q161 plan
    // (same session-build flag as Bench/Verify) still zips the aligned
    // residue-class splits with no exchange — the whole point of the
    // storage-partitioned join path.
    val df = graft.SparkEntry.queries("q161_partitioned_join")(spark, sf)
    // collect() executes df's OWN QueryExecution so the lint sees the
    // FINAL adaptive plan (a side-car write would spawn a separate
    // QueryExecution and leave df's plan un-finalized — the vacuous-
    // under-AQE class of mistake this very test exists to prevent)
    assert(df.collect().length === 97)
    val shuffleCount = PlanLint.lint(df)
      .find(_.rule == "shuffle-count").map(_.detail)
    assert(shuffleCount.contains("0"),
      s"q161 must stay zero-shuffle, got $shuffleCount")
  }

  test("a deliberately bad plan trips every rule") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window

    // cross-join: two unkeyed frames
    val a = (1 to 10).toDF("x")
    val b = (1 to 10).toDF("y")
    assert(PlanLint.lint(a.crossJoin(b)).exists(_.rule == "cross-join"))

    // global-window: empty PARTITION BY over the data
    val gw = a.withColumn("rn", row_number().over(Window.orderBy(col("x"))))
    assert(PlanLint.lint(gw).exists(_.rule == "global-window"))

    // unpushed-scan: a push-eligible v = 3 predicate stranded above the
    // scan by an intervening NON-DETERMINISTIC projection (planning
    // cannot push filters through rand() for correctness) — the
    // realistic way a selective filter silently stops reaching parquet
    val d = java.nio.file.Files.createTempDirectory("lintgate").toString
    (1 to 100).toDF("v").write.mode("overwrite").parquet(s"$d/t.parquet")
    val up = spark.read.parquet(s"$d/t.parquet")
      .select(col("v"), rand().as("r"))
      .filter(col("v") === 3)
    assert(PlanLint.lint(up).exists(_.rule == "unpushed-scan"))
    // while a non-pushable predicate (modulo) above the same scan is NOT
    // a finding — parquet could never evaluate it, nothing was lost
    val modOnly = spark.read.parquet(s"$d/t.parquet")
      .filter(pmod(col("v"), lit(7)) === 3)
    assert(!PlanLint.lint(modOnly).exists(_.rule == "unpushed-scan"))

    // window-collect: collect_set over an unbounded-domain window frame
    val wc = a.withColumn("seen",
      collect_set(col("x")).over(Window.orderBy(col("x"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(PlanLint.lint(wc).exists(_.rule == "window-collect"))
    // while the same collect_set under a groupBy is NOT a finding — the
    // buffer lives in a hash aggregate, bounded per group, not per row
    val ga = a.groupBy(pmod(col("x"), lit(3))).agg(collect_set(col("x")))
    assert(!PlanLint.lint(ga).exists(_.rule == "window-collect"))

    // and the shuffle-count informational finding is always present
    assert(PlanLint.lint(a).exists(_.rule == "shuffle-count"))
  }
}

package graft.plans

import graft.SparkSpec
import graft.ops.{Tables, TemporalJoins}
import org.apache.spark.sql.functions._

/** The custom-plan as-of join (AsOfJoinPlan → GraftStrategy →
  * AsOfJoinExec) against the composed union+window formulation and
  * hand-computed edges.
  */
class NativeAsOfSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("native as-of join matches the composed formulation on events") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val composed = TemporalJoins
      .asofJoin(purchases, views, "user_id", "ts", Seq("view_id", "view_ts"))
      .select("user_id", "ts", "purchase_id", "view_id", "view_ts")
    val nviews = views.select(col("user_id").as("v_user_id"),
      col("ts").as("v_ts"), col("view_id"), col("view_ts"))
    val native = GraftPlans
      .asofJoin(purchases, nviews, "user_id", "ts", "v_user_id", "v_ts",
        ties = Seq("view_id", "view_ts"))
      .select("user_id", "ts", "purchase_id", "view_id", "view_ts")
    assert(native.count() === purchases.count(), "left join must preserve left rows")
    assert(native.exceptAll(composed).isEmpty &&
      composed.exceptAll(native).isEmpty)
  }

  test("unmatched left rows keep null right columns; null times never match") {
    val left = Seq(
      (1L, ts("2024-01-01 00:00:00"), "before-any-right"),
      (1L, ts("2024-01-03 00:00:00"), "after-r1"),
      (2L, ts("2024-01-05 00:00:00"), "key-without-rights")
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, Some(ts("2024-01-02 00:00:00")), 100L),
      (1L, None, 999L) // null time: must never match anything
    ).toDF("rk", "rt", "rid")
    val out = GraftPlans.asofJoin(left, right, "k", "t", "rk", "rt", Seq("rid"))
      .select("tag", "rid").collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out("before-any-right") === -1L)
    assert(out("after-r1") === 100L)
    assert(out("key-without-rights") === -1L)
  }

  test("same-timestamp ties pick the greatest tie tuple, deterministically") {
    val t0 = ts("2024-01-01 00:00:00")
    val left = Seq((1L, t0)).toDF("k", "t")
    val right = Seq((1L, t0, 10L), (1L, t0, 30L), (1L, t0, 20L))
      .toDF("rk", "rt", "rid")
    (1 to 5).foreach { _ =>
      val got = GraftPlans
        .asofJoin(left, right.repartition(5), "k", "t", "rk", "rt", Seq("rid"))
        .select("rid").head().getLong(0)
      assert(got === 30L)
    }
  }

  test("copy-on-persist merge survives buffer reuse: skipped keys, carry " +
      "overwrites, and rows persisted across left rows") {
    // Exercises every path of the merge's copy-on-persist discipline in
    // ONE sorted partition pair: right keys with no left partner
    // (skipped, never copied), runs of same-key past rows (carry
    // overwritten repeatedly), a future row that terminates one left
    // row's scan and matches the next (persisted across next() calls),
    // and string payloads (offset-based UnsafeRow data — the kind a
    // reused buffer corrupts first).
    val left = (1 to 50).flatMap { k =>
      Seq((k.toLong, ts(f"2024-01-${10}%02d 00:00:00"), s"L$k-early"),
        (k.toLong, ts(f"2024-01-${20}%02d 00:00:00"), s"L$k-late"))
    }.toDF("k", "t", "ltag")
    val right = (0 to 51).flatMap { k =>
      // k=0 and k=51 have no left partner; every other key gets five
      // past rows (carry churn), one row between the two left times,
      // and one far-future row
      Seq.tabulate(5)(i =>
        (k.toLong, ts(f"2024-01-0${i + 1} 00:00:00"), s"R$k-past$i")) ++
        Seq((k.toLong, ts("2024-01-15 00:00:00"), s"R$k-mid"),
          (k.toLong, ts("2024-02-01 00:00:00"), s"R$k-future"))
    }.toDF("rk", "rt", "rtag")
    val out = GraftPlans
      .asofJoin(left.repartition(4), right.repartition(3),
        "k", "t", "rk", "rt", Seq("rtag"))
      .select("ltag", "rtag").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.size === 100)
    (1 to 50).foreach { k =>
      assert(out(s"L$k-early") === s"R$k-past4", s"k=$k early")
      assert(out(s"L$k-late") === s"R$k-mid", s"k=$k late")
    }
  }

  test("physical plan uses AsOfJoinExec with exactly one exchange per side") {
    val left = Seq((1L, ts("2024-01-01 00:00:00"))).toDF("k", "t")
    val right = Seq((1L, ts("2024-01-01 00:00:00"), 1L)).toDF("rk", "rt", "rid")
    val df = GraftPlans.asofJoin(left, right, "k", "t", "rk", "rt", Seq("rid"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected AsOfJoinExec in:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 2, s"expected 2 shuffles, got $exchanges in:\n$plan")
  }

  test("merge is whole-stage-codegen'd, and codegen-off results are identical") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    def run() = GraftPlans.asofJoin(purchases, views, "user_id", "ts",
      "v_user_id", "v_ts", ties = Seq("view_id"))
      // a downstream projection + aggregate that must FUSE with the merge
      .groupBy(col("user_id")).agg(count(col("view_id")).as("n_matched"),
        count(lit(1)).as("n"))
    val withCg = run()
    // COLLECT while codegen is still on: a lazy DataFrame compared after
    // the conf flips would replan BOTH sides interpreted and the
    // equality check would be vacuous (the AQE-assert lesson, again)
    val cgRows = withCg.collect().map(_.toString).sorted
    val planStr = withCg.queryExecution.executedPlan.toString
    // the join sits inside a WholeStageCodegen span (stage-root shape):
    // its tree string carries the codegen star marker
    assert(planStr.linesIterator.exists(l =>
      l.contains("AsOfJoin") && l.contains("*(")),
      s"AsOfJoinExec should codegen:\n${planStr.take(1500)}")
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val noCg = run()
      val noCgPlan = noCg.queryExecution.executedPlan.toString
      assert(!noCgPlan.linesIterator.exists(l =>
        l.contains("AsOfJoin") && l.contains("*(")),
        "codegen-off run must take the interpreted merge")
      val noCgRows = noCg.collect().map(_.toString).sorted
      assert(cgRows.sameElements(noCgRows),
        "codegen and interpreted merges must agree row-for-row")
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("column pruning reaches through the custom node's children") {
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"),
        col("event_id").as("view_id"))
    val df = GraftPlans.asofJoin(purchases, views, "user_id", "ts",
      "v_user_id", "v_ts", ties = Seq("view_id"))
    val scan = df.queryExecution.executedPlan.toString
    // the parquet scans must not read the wide props/value columns
    assert(!scan.contains("props"), "scan should prune unused columns")
  }
}

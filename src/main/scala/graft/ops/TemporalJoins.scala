package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal join operators Spark lacks natively: as-of join and range
  * join, built from compositions of existing operators (preference (a)
  * of the custom-operator ladder — no custom plan node needed).
  *
  * Scale design: the as-of join is the union+window formulation — ONE
  * shuffle on (key, time) instead of the naive inequality join's
  * per-key cross product; a real cluster handles arbitrarily many rows
  * per key. The range join broadcasts the (small) band table and lets
  * the inequality predicate evaluate map-side.
  */
object TemporalJoins extends QueryModule {
  import Tables.{events, orders}

  /** As-of join: for each left row, the latest right row with
    * right.time <= left.time within the same key. Implemented by
    * unioning both sides tagged, sorting once per key on (time, side),
    * and carrying the last-seen right payload forward with a window.
    *
    * Tie semantics: when multiple right rows share (key, time), the one
    * with the greatest payload tuple (compared in `payloadCols` order)
    * wins — include a unique right-side id in `payloadCols` to make the
    * choice deterministic (the window ordering appends the payload
    * columns as a tie-break; (time, side) alone would leave the winner
    * physically arbitrary).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      time: String, payloadCols: Seq[String]): DataFrame = {
    val leftTagged = left.withColumn("__side", lit(1))
      .select(Seq(col(key), col(time), col("__side")) ++
        left.columns.filterNot(c => c == key || c == time)
          .map(c => col(c)) ++
        payloadCols.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"__r_$c")): _*)
    val rightTagged = right.withColumn("__side", lit(0))
      .select(Seq(col(key), col(time), col("__side")) ++
        left.columns.filterNot(c => c == key || c == time)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        payloadCols.map(c => col(c).as(s"__r_$c")): _*)
    // right rows sort before left rows at equal times (side 0 < 1), so a
    // same-timestamp right row IS visible to the left row (<= semantics);
    // the payload columns break ties among same-timestamp right rows
    // (greatest payload tuple wins — nulls-first keeps left rows, whose
    // __r_* are all null, ordered before any real right payload)
    val w = Window.partitionBy(col(key))
      .orderBy(Seq(col(time), col("__side")) ++
        payloadCols.map(c => col(s"__r_$c").asc_nulls_first): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = leftTagged.unionByName(rightTagged)
      .select(Seq(col(key), col(time), col("__side")) ++
        left.columns.filterNot(c => c == key || c == time).map(col) ++
        payloadCols.map(c =>
          last(col(s"__r_$c"), ignoreNulls = true).over(w).as(c)): _*)
    carried.filter(col("__side") === 1).drop("__side")
  }

  // ============================================================ as-of join
  // each purchase matched to the user's latest preceding (or same-time)
  // view event. DuckDB has native ASOF JOIN — the oracle uses it, which
  // also cross-checks the union+window formulation against a real ASOF
  // implementation.
  // The right side is deduped to ONE row per (user, instant) — max
  // event_id wins — before the as-of, in BOTH engines. DuckDB's native
  // ASOF has no expressible tie-break, so on tie-heavy data (the soak
  // replicas share timestamps) the oracle is underdetermined unless
  // ties are removed by construction (q122's contract). A no-op at the
  // base scales; one extra (user, ts)-keyed partial-agg shuffle.
  register("q58_asof_join",
    """SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
      |  v.event_id AS view_id, v.ts AS view_ts,
      |  CASE WHEN v.ts IS NULL THEN NULL
      |       ELSE epoch_us(p.ts) - epoch_us(v.ts) END AS view_to_purchase_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, ts, MAX(event_id) AS event_id
      |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts) v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id", "ts")
      .agg(max(col("event_id")).as("view_id"))
      .withColumn("view_ts", col("ts"))
    asofJoin(purchases, views, "user_id", "ts", Seq("view_id", "view_ts"))
      .select(col("user_id"), col("purchase_id"),
        col("ts").as("purchase_ts"), col("view_id"), col("view_ts"),
        when(col("view_ts").isNull, lit(null))
          .otherwise(unix_micros(col("ts")) - unix_micros(col("view_ts")))
          .as("view_to_purchase_us"))
  }

  // ============================================================ native as-of
  // the same as-of semantics through the custom plan node
  // (AsOfJoinPlan → GraftStrategy → sort-merge AsOfJoinExec): one shuffle
  // per side, O(1) merge state per key. Oracle = DuckDB native ASOF JOIN,
  // so the custom physical operator is hash-verified against a real ASOF
  // implementation, and NativeAsOfSpec pins it row-identical to the
  // composed formulation (q58).
  register("q62_asof_native",
    """SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
      |  v.event_id AS view_id, v.ts AS view_ts,
      |  CASE WHEN v.ts IS NULL THEN NULL
      |       ELSE epoch_us(p.ts) - epoch_us(v.ts) END AS view_to_purchase_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, ts, MAX(event_id) AS event_id
      |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts) v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    // tie-free right side by construction (see q58's rationale)
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user_id"), col("ts").as("v_ts"))
      .agg(max(col("event_id")).as("view_id"))
      .withColumn("view_ts", col("v_ts"))
    graft.plans.GraftPlans
      .asofJoin(purchases, views, "user_id", "ts", "v_user_id", "v_ts",
        ties = Seq("view_id", "view_ts"))
      .select(col("user_id"), col("purchase_id"),
        col("ts").as("purchase_ts"), col("view_id"), col("view_ts"),
        when(col("view_ts").isNull, lit(null))
          .otherwise(unix_micros(col("ts")) - unix_micros(col("view_ts")))
          .as("view_to_purchase_us"))
  }

  // ============================================================ forward as-of
  // each purchase matched to the NEXT view at-or-after it (time-to-next-
  // event lookup) — the same native operator with the time axis negated;
  // oracle = DuckDB ASOF with the <= inequality
  register("q77_asof_forward",
    """SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
      |  v.event_id AS view_id, v.ts AS view_ts,
      |  CASE WHEN v.ts IS NULL THEN NULL
      |       ELSE epoch_us(v.ts) - epoch_us(p.ts) END AS purchase_to_view_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT user_id, ts, MAX(event_id) AS event_id
      |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts) v
      |  ON p.user_id = v.user_id AND p.ts <= v.ts""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    // tie-free right side by construction (see q58's rationale)
    val views = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user_id"), col("ts").as("view_ts"))
      .agg(max(col("event_id")).as("view_id"))
    graft.plans.GraftPlans
      .asofJoinForward(purchases, views, "user_id", "ts", "v_user_id",
        "view_ts", ties = Seq("view_id", "view_ts"))
      .select(col("user_id"), col("purchase_id"),
        col("ts").as("purchase_ts"), col("view_id"), col("view_ts"),
        when(col("view_ts").isNull, lit(null))
          .otherwise(unix_micros(col("view_ts")) - unix_micros(col("ts")))
          .as("purchase_to_view_us"))
  }

  /** Binned range join — the scale path when the interval table is too
    * large to broadcast (where q59's broadcast formulation stops
    * working). Each interval explodes into the fixed-width bins it
    * covers; each fact row computes its bin; an EQUI-join on the bin
    * co-partitions both sides (one shuffle each), and the exact
    * `lo <= v < hi` predicate filters the bin-collisions. Row-identical
    * to the inequality join; never a broadcast nested loop.
    *
    * `binWidth` trades replication (an interval appears in
    * ceil(span/width) bins) against bin-collision filtering — pick it
    * near the median interval span.
    */
  def binnedRangeJoin(fact: DataFrame, value: Column, intervals: DataFrame,
      lo: Column, hi: Column, binWidth: Long): DataFrame = {
    // floor-divide via floor(): Column `/` is double division; lo/hi are
    // integral here so the quotient never sits within an ulp of the next
    // integer (hi-1 is never a multiple of binWidth for integral bounds)
    val binned = intervals.withColumn("__bin",
      explode(sequence(floor(lo / binWidth).cast(LongType),
        floor((hi - 1) / binWidth).cast(LongType))))
    fact.withColumn("__bin", floor(value / binWidth).cast(LongType))
      .join(binned, Seq("__bin"))
      .filter(value >= lo && value < hi)
      .drop("__bin")
  }

  // ============================================================ binned range
  // 100 OVERLAPPING price bands (a row can match 2) joined via the binned
  // equi-join — verified against the plain inequality join in the oracle
  register("q76_binned_range_join",
    """WITH bands AS (
      |  SELECT i AS band_id, i * 50000.0 AS band_lo, i * 50000.0 + 75000.0 AS band_hi
      |  FROM (SELECT unnest(range(0, 100)) AS i))
      |SELECT band_id, COUNT(*) AS order_count,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders JOIN bands
      |  ON o_totalprice >= band_lo AND o_totalprice < band_hi
      |GROUP BY band_id""".stripMargin) { (s, d) =>
    val bands = s.range(100).select(col("id").as("band_id"),
      (col("id") * 50000.0).as("band_lo"),
      (col("id") * 50000.0 + 75000.0).as("band_hi"))
    binnedRangeJoin(orders(s, d), col("o_totalprice"), bands,
      col("band_lo"), col("band_hi"), binWidth = 50000L)
      .groupBy("band_id")
      .agg(count(lit(1)).as("order_count"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("revenue"))
  }

  // ============================================================ range join
  // banding join: each order matched to its price band (lo <= price < hi);
  // the tiny band table broadcasts, the predicate evaluates map-side
  register("q59_range_join", {
    val bands = Seq((0, 50000, "small"), (50000, 150000, "medium"),
      (150000, 300000, "large"), (300000, 1000000, "jumbo"))
    val oBands = bands.map { case (lo, hi, n) => s"($lo, $hi, '$n')" }
      .mkString(", ")
    s"""SELECT band_name, COUNT(*) AS order_count,
       |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
       |FROM orders
       |JOIN (SELECT * FROM (VALUES $oBands) b(band_lo, band_hi, band_name)) b
       |  ON o_totalprice >= band_lo AND o_totalprice < band_hi
       |GROUP BY band_name""".stripMargin
  }) { (s, d) =>
    import s.implicits._
    val bands = Seq((0, 50000, "small"), (50000, 150000, "medium"),
      (150000, 300000, "large"), (300000, 1000000, "jumbo"))
      .toDF("band_lo", "band_hi", "band_name")
    orders(s, d)
      .join(broadcast(bands), col("o_totalprice") >= col("band_lo") &&
        col("o_totalprice") < col("band_hi"))
      .groupBy("band_name")
      .agg(count(lit(1)).as("order_count"),
        sum(col("o_totalprice").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("revenue"))
  }

  // ==================================================== interval overlap
  /** Bin width (days) for the overlap join's co-partitioning. */
  val OverlapBinDays = 16

  /** Deterministic per-order activity window in anchor-day integers:
    * [order date, order date + (key % 20) + 5 days]. Integer day math on
    * a fixed anchor keeps both engines exact and makes `div` bucketing
    * floor-safe (days since 1990 are non-negative).
    */
  private def orderIntervals(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey").as("id"), col("o_custkey").as("cust"),
      datediff(to_date(col("o_orderdate")), to_date(lit("1990-01-01")))
        .cast(LongType).as("lo"))
      .withColumn("hi", col("lo") + col("id") % 20 + 5)

  private val oIntervals =
    """SELECT o_orderkey AS id, o_custkey AS cust,
      |    CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) AS lo,
      |    CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) + (o_orderkey % 20) + 5 AS hi
      |  FROM orders""".stripMargin

  // Interval×interval overlap join (distinct from q59's point-in-band
  // shape): pairs of same-customer order windows that overlap in time.
  // The scalable plan is the binned self-join — each interval explodes to
  // the 16-day bins it touches (≤ 3 bins for a ≤ 25-day window), pairs
  // meet on (cust, bin) as an EQUI-join, and each surviving pair is kept
  // exactly once by the bin-ownership rule: only the bin containing the
  // overlap's start (greatest lo) emits it. No nested loop, no N² per
  // customer — the shuffle key is (cust, bin) and skew is bounded by the
  // bin population. The DuckDB twin is the direct quadratic join: same
  // result, different plan — which is the point.
  register("q127_interval_overlap",
    s"""WITH iv AS (
       |  $oIntervals)
       |SELECT a.cust AS cust, a.id AS id_a, b.id AS id_b,
       |  LEAST(a.hi, b.hi) - GREATEST(a.lo, b.lo) + 1 AS overlap_days
       |FROM iv a JOIN iv b
       |  ON a.cust = b.cust AND a.id < b.id
       |  AND a.lo <= b.hi AND b.lo <= a.hi""".stripMargin) { (s, d) =>
    val W = OverlapBinDays
    val bins = orderIntervals(s, d)
      .withColumn("bin", explode(sequence(expr(s"lo div $W"), expr(s"hi div $W"))))
    val a = bins.select(col("cust"), col("id").as("id_a"),
      col("lo").as("lo_a"), col("hi").as("hi_a"), col("bin"))
    val b = bins.select(col("cust").as("cust_b"), col("id").as("id_b"),
      col("lo").as("lo_b"), col("hi").as("hi_b"), col("bin").as("bin_b"))
    a.join(b, col("cust") === col("cust_b") && col("bin") === col("bin_b") &&
        col("id_a") < col("id_b"))
      .filter(col("lo_a") <= col("hi_b") && col("lo_b") <= col("hi_a"))
      .filter(col("bin") === expr(s"greatest(lo_a, lo_b) div $W"))
      .select(col("cust"), col("id_a"), col("id_b"),
        (least(col("hi_a"), col("hi_b")) - greatest(col("lo_a"), col("lo_b")) + 1)
          .as("overlap_days"))
  }

  // ======================================================= peak concurrency
  // Max-concurrency sweep: how many order windows per customer are open
  // at once, and the first day the maximum is reached. The classic
  // +1/-1 boundary sweep — intervals become (lo, +1) / (hi+1, -1)
  // events, a per-customer cumulative sum walks the open count, and the
  // peak row is picked with a per-customer max window. Both windows
  // partition on cust (the sweep never goes global), and the boundary
  // union is map-side — one shuffle on the customer key end to end.
  register("q128_peak_concurrency",
    s"""WITH iv AS (
       |  $oIntervals),
       |bdy AS (
       |  SELECT cust, lo AS day, 1 AS delta FROM iv
       |  UNION ALL
       |  SELECT cust, hi + 1 AS day, -1 AS delta FROM iv),
       |daily AS (
       |  SELECT cust, day, CAST(SUM(delta) AS BIGINT) AS d
       |  FROM bdy GROUP BY cust, day),
       |cum AS (
       |  SELECT cust, day,
       |    CAST(SUM(d) OVER (PARTITION BY cust ORDER BY day
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |      AS open
       |  FROM daily),
       |pk AS (
       |  SELECT cust, day, open, MAX(open) OVER (PARTITION BY cust) AS peak
       |  FROM cum)
       |SELECT cust, CAST(MAX(open) AS BIGINT) AS peak_open,
       |  CAST(DATE '1990-01-01' + CAST(MIN(day) AS INTEGER) * INTERVAL 1 DAY
       |    AS DATE) AS peak_day
       |FROM pk WHERE open = peak GROUP BY cust""".stripMargin) { (s, d) =>
    val iv = orderIntervals(s, d)
    val bdy = iv.select(col("cust"), col("lo").as("day"), lit(1L).as("delta"))
      .unionAll(iv.select(col("cust"), (col("hi") + 1).as("day"),
        lit(-1L).as("delta")))
    val daily = bdy.groupBy("cust", "day").agg(sum("delta").as("d"))
    val wCum = Window.partitionBy("cust").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("cust")
    daily
      .select(col("cust"), col("day"), sum(col("d")).over(wCum).as("open"))
      .withColumn("peak", max(col("open")).over(wAll))
      .filter(col("open") === col("peak"))
      .groupBy("cust")
      .agg(max(col("open")).as("peak_open"), min(col("day")).as("peak_day_idx"))
      .select(col("cust"), col("peak_open"),
        date_add(to_date(lit("1990-01-01")),
          col("peak_day_idx").cast(IntegerType)).as("peak_day"))
  }

  // ========================================================== proration
  // Earned-revenue proration — the reference domain's "earned premium"
  // calculation (a policy's premium is earned day by day across the
  // months its coverage window overlaps): each order's amount is
  // prorated to every calendar month its activity window touches, in
  // proportion to overlapping days. Exact integer arithmetic: cents ×
  // overlap-days × 10⁶ with one truncating division by the window
  // length — earned_micro is bit-identical across engines, and monthly
  // revenue-recognition totals are a plain SUM over this table.
  //
  // Scale: the month explode is bounded by each window's month span
  // (≤ 2 for these ≤ 25-day windows, ≤ span/28 generally) and fuses
  // map-side; there is NO shuffle at all — proration is a projection.
  register("q135_earned_revenue",
    """WITH iv AS (
      |  SELECT o_orderkey AS id,
      |    CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) AS lo,
      |    CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
      |      AS BIGINT) + (o_orderkey % 20) + 5 AS hi,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |mo AS (
      |  SELECT id, lo, hi, cents,
      |    CAST(unnest(generate_series(
      |      date_trunc('month', DATE '1990-01-01' + lo * INTERVAL 1 DAY),
      |      date_trunc('month', DATE '1990-01-01' + hi * INTERVAL 1 DAY),
      |      INTERVAL 1 MONTH)) AS DATE) AS month
      |  FROM iv),
      |ov AS (
      |  SELECT id, month, lo, hi, cents,
      |    LEAST(hi, CAST(datediff('day', DATE '1990-01-01',
      |        CAST(last_day(month) AS DATE)) AS BIGINT))
      |      - GREATEST(lo, CAST(datediff('day', DATE '1990-01-01', month)
      |        AS BIGINT)) + 1 AS overlap_days
      |  FROM mo)
      |SELECT id AS o_orderkey, month, overlap_days,
      |  hi - lo + 1 AS window_days,
      |  cents * overlap_days * 1000000 // (hi - lo + 1) AS earned_micro
      |FROM ov""".stripMargin) { (s, d) =>
    val anchor = to_date(lit("1990-01-01"))
    val iv = orders(s, d).select(
      col("o_orderkey").as("id"),
      datediff(to_date(col("o_orderdate")), anchor).cast(LongType).as("lo"),
      floor(col("o_totalprice") * 100 + 0.5).cast(LongType).as("cents"))
      .withColumn("hi", col("lo") + col("id") % 20 + 5)
    iv
      .withColumn("month", explode(sequence(
        trunc(date_add(anchor, col("lo").cast(IntegerType)), "month"),
        trunc(date_add(anchor, col("hi").cast(IntegerType)), "month"),
        expr("interval 1 month"))))
      .withColumn("overlap_days",
        least(col("hi"), datediff(last_day(col("month")), anchor)
          .cast(LongType))
          - greatest(col("lo"), datediff(col("month"), anchor)
            .cast(LongType)) + 1)
      .select(col("id").as("o_orderkey"), col("month"), col("overlap_days"),
        (col("hi") - col("lo") + 1).as("window_days"),
        expr("cents * overlap_days * 1000000 div (hi - lo + 1)")
          .as("earned_micro"))
  }
}

package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series regularization operators: per-key date-spine densification
  * and forward-fill (last-observation-carried-forward) — the resampling
  * step a feature pipeline runs before windowed training data extraction.
  * (Reference analog: the date-axis gap problem its LAG(12)-as-YoY
  * semantics silently assumes away — see SURVEY §2.5 note.)
  *
  * Scale notes: the spine explode is map-only off a tiny per-key bounds
  * aggregate; the fill is one window shuffle on the key. Nothing is
  * driver-side — per-key spans are bounded by the calendar, not by data
  * volume, and a 1000-executor run partitions cleanly on user_id.
  */
object TimeSeriesOps extends QueryModule {
  import Tables.events

  // ========================================================= forward fill
  // Densify each user's activity to a gapless daily axis between their
  // first and last active day, then carry the last observed daily total
  // forward across the gap days. Daily totals snap to the 1e6 integer
  // grid (exact, order-independent); staleness counts days since the
  // last real observation. Window frame is the default RANGE UNBOUNDED
  // PRECEDING .. CURRENT ROW in both engines.
  register("q104_forward_fill",
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    -- BIGINT sums are HUGEINT in DuckDB — cast back or the client
      |    -- materializes the column as float64 and the dtype gate fails
      |    CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT) AS day_grid
      |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
      |span AS (
      |  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id),
      |spine AS (
      |  SELECT user_id, CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM span),
      |j AS (
      |  SELECT s.user_id, s.day, d.day_grid
      |  FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day)
      |SELECT user_id, day, day_grid,
      |  last_value(day_grid IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY day) AS filled_grid,
      |  CAST(datediff('day',
      |    last_value(CASE WHEN day_grid IS NOT NULL THEN day END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY day),
      |    day) AS INTEGER) AS staleness_days
      |FROM j""".stripMargin) { (s, d) =>
    val daily = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .groupBy("user_id", "day")
      .agg(sum(floor(col("value") * 1000000).cast(LongType)).as("day_grid"))
    val spine = daily.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("day_grid"),
        last(col("day_grid"), ignoreNulls = true).over(w).as("filled_grid"),
        datediff(col("day"),
          last(when(col("day_grid").isNotNull, col("day")), ignoreNulls = true)
            .over(w)).cast(IntegerType).as("staleness_days"))
  }

  // ================================================ linear interpolation
  // The interpolating sibling of q104's LOCF: gap days between two real
  // observations get the straight-line value. The division hazard is
  // MEASURED, not assumed: DuckDB 1.0.0's `//` on BIGINT truncates
  // toward zero (-7 // 3 = -2), exactly like Spark's `div` — so plain
  // `div` is the portable choice even for negative slopes (an explicit
  // floor-division on one side is what DOESN'T match).
  // Same one-shuffle shape as q104: spine explode is map-only, all four
  // neighbor columns come from two frames of the same user-keyed window.
  register("q130_linear_interpolation",
    """WITH daily AS (
      |  SELECT user_id, CAST(ts AS DATE) AS day,
      |    CAST(SUM(CAST(FLOOR(value * 1000000) AS BIGINT)) AS BIGINT)
      |      AS day_grid
      |  FROM events GROUP BY user_id, CAST(ts AS DATE)),
      |span AS (
      |  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily
      |  GROUP BY user_id),
      |spine AS (
      |  SELECT user_id,
      |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
      |      AS day
      |  FROM span),
      |j AS (
      |  SELECT s.user_id, s.day, d.day_grid
      |  FROM spine s LEFT JOIN daily d
      |    ON s.user_id = d.user_id AND s.day = d.day),
      |nb AS (
      |  SELECT user_id, day, day_grid,
      |    last_value(day_grid IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS pv,
      |    last_value(CASE WHEN day_grid IS NOT NULL THEN day END
      |      IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      AS pd,
      |    first_value(day_grid IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |      AS nv,
      |    first_value(CASE WHEN day_grid IS NOT NULL THEN day END
      |      IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY day ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
      |      AS nd
      |  FROM j)
      |SELECT user_id, day, day_grid,
      |  CASE WHEN day_grid IS NOT NULL THEN day_grid
      |       WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
      |         pv + ((nv - pv) * datediff('day', pd, day))
      |              // datediff('day', pd, nd)
      |       ELSE NULL END AS interp_grid
      |FROM nb""".stripMargin) { (s, d) =>
    val daily = events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
      .groupBy("user_id", "day")
      .agg(sum(floor(col("value") * 1000000).cast(LongType)).as("day_grid"))
    val spine = daily.groupBy("user_id")
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("user_id"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
    val wP = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wN = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(daily, Seq("user_id", "day"), "left")
      .select(col("user_id"), col("day"), col("day_grid"),
        last(col("day_grid"), ignoreNulls = true).over(wP).as("pv"),
        last(when(col("day_grid").isNotNull, col("day")), ignoreNulls = true)
          .over(wP).as("pd"),
        first(col("day_grid"), ignoreNulls = true).over(wN).as("nv"),
        first(when(col("day_grid").isNotNull, col("day")), ignoreNulls = true)
          .over(wN).as("nd"))
      .select(col("user_id"), col("day"), col("day_grid"),
        when(col("day_grid").isNotNull, col("day_grid"))
          .when(col("pv").isNotNull && col("nv").isNotNull,
            col("pv") + expr(
              "((nv - pv) * datediff(day, pd)) div datediff(nd, pd)"))
          .as("interp_grid"))
  }

  // ================================================================ EWMA
  // Trailing exponentially-weighted moving average of each customer's
  // monthly revenue — the smoothing step behind churn/LTV features
  // (reference analog: the W2 LAG(12) trend family, SURVEY §2.5, with
  // geometric instead of one-hot lag weights). Half-life = one
  // observation: weight 2^-j for the month-of-activity j steps back,
  // truncated at [[EwmaDepth]] terms and renormalized over the terms
  // actually present (series shorter than the depth stay exact).
  //
  // Determinism: the whole computation lives on the integer grid —
  // revenue sums in cents (ROUND(x*100): half-away-from-zero for
  // positive doubles in BOTH engines), weights are powers of two,
  // numerator/denominator are exact BIGINT sums of the lag terms — and
  // the only float ops are the two final divisions (IEEE-identical on
  // identical operands). No rounding step, hash-exact cross-engine.
  //
  // Scale: the raw scan partial-aggregates map-side and shuffles only
  // (custkey, month) rollup rows; the per-customer re-partition for the
  // lag window moves that same rollup-sized frame (orders-of-magnitude
  // below the input — never the raw orders). All 2·EwmaDepth lag
  // expressions share one window spec, so CollapseWindow plans a SINGLE
  // Window operator; per-row state is EwmaDepth lags regardless of
  // corpus size.
  val EwmaDepth = 12

  register("q140_ewma", {
    val num = (0 until EwmaDepth).map { j =>
      val w = 1L << (EwmaDepth - 1 - j)
      if (j == 0) s"rev_cents * $w"
      else s"COALESCE(lag(rev_cents, $j) OVER w, 0) * $w"
    }.mkString(" + ")
    val den = (0 until EwmaDepth).map { j =>
      val w = 1L << (EwmaDepth - 1 - j)
      if (j == 0) s"$w"
      else s"CASE WHEN lag(rev_cents, $j) OVER w IS NULL THEN 0 ELSE $w END"
    }.mkString(" + ")
    s"""WITH monthly AS (
       |  SELECT o_custkey,
       |    CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
       |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS rev_cents
       |  FROM orders GROUP BY 1, 2)
       |SELECT o_custkey, month,
       |  CAST(rev_cents AS DOUBLE) / 100.0 AS revenue,
       |  CAST($num AS DOUBLE) / ($den) / 100.0 AS ewma
       |FROM monthly
       |WINDOW w AS (PARTITION BY o_custkey ORDER BY month)""".stripMargin
  }) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("month"))
    val monthly = Tables.orders(s, d)
      .groupBy(col("o_custkey"),
        date_trunc("month", col("o_orderdate")).cast(DateType).as("month"))
      .agg(sum(round(col("o_totalprice") * 100).cast(LongType))
        .as("rev_cents"))
    val num = (0 until EwmaDepth).map { j =>
      val wt = lit(1L << (EwmaDepth - 1 - j))
      if (j == 0) col("rev_cents") * wt
      else coalesce(lag(col("rev_cents"), j).over(w), lit(0L)) * wt
    }.reduce(_ + _)
    val den = (0 until EwmaDepth).map { j =>
      val wt = 1L << (EwmaDepth - 1 - j)
      if (j == 0) lit(wt)
      else when(lag(col("rev_cents"), j).over(w).isNull, lit(0L))
        .otherwise(lit(wt))
    }.reduce(_ + _)
    monthly.select(col("o_custkey"), col("month"),
      (col("rev_cents").cast(DoubleType) / 100.0).as("revenue"),
      (num.cast(DoubleType) / den / 100.0).as("ewma"))
  }

  // ============================================ rolling z-score anomaly
  // Per-customer anomaly flags: an order is anomalous when its price
  // sits more than 2σ from the mean of the customer's 5 PRECEDING
  // orders (trailing stats exclude the current row — the monitored
  // value must not contaminate its own baseline). The σ test runs
  // entirely on integer cents: |x − s/n| > 2σ with n=5 becomes
  // (5x − s)² > 4(5q − s²) over window sums s=Σc, q=Σc² — no sqrt, no
  // float variance, hash-exact by construction (max magnitude ~2.5e17,
  // well inside BIGINT).
  //
  // Scale: one shuffle keyed by o_custkey; the frame is ROWS-bounded
  // (constant state per row), and all three window sums share one spec
  // so CollapseWindow plans a single Window operator.
  register("q164_rolling_anomaly",
    """WITH base AS (
      |  SELECT o_custkey, o_orderkey, o_orderdate,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |win AS (
      |  SELECT o_custkey, o_orderkey, cents,
      |    COUNT(*) OVER w AS n,
      |    SUM(cents) OVER w AS s,
      |    SUM(cents * cents) OVER w AS q
      |  FROM base
      |  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING))
      |SELECT o_custkey, o_orderkey, cents,
      |  CAST(s AS BIGINT) AS trailing_sum,
      |  CAST((5 * cents - s) * (5 * cents - s) > 4 * (5 * q - s * s)
      |    AS INTEGER) AS is_anomaly
      |FROM win WHERE n = 5""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(-5, -1)
    // all three window sums in ONE projection under fresh names (the
    // chained-withColumn window trap — see the verify recipe)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        floor(col("o_totalprice") * 100 + 0.5).cast(LongType).as("cents"))
      .select(col("o_custkey"), col("o_orderkey"), col("cents"),
        count(lit(1)).over(w).as("n"),
        sum(col("cents")).over(w).as("s"),
        sum(col("cents") * col("cents")).over(w).as("q"))
      .filter(col("n") === 5)
      .select(col("o_custkey"), col("o_orderkey"), col("cents"),
        col("s").as("trailing_sum"),
        ((lit(5) * col("cents") - col("s")) * (lit(5) * col("cents") - col("s"))
          > lit(4) * (lit(5) * col("q") - col("s") * col("s")))
          .cast(IntegerType).as("is_anomaly"))
  }

  // ================================= classical seasonal decomposition
  // Multiplicative seasonal indices for the monthly revenue series:
  // trend = centered 12-month moving window, seasonal ratio = month /
  // trend, index = mean ratio per calendar month — the textbook
  // ratio-to-moving-average decomposition, entirely on the integer ppm
  // grid. ratio_ppm = cents·12·10⁶ div Σ₁₂(cents) avoids the float
  // trend average (both engines truncate the BIGINT division
  // identically); only full 12-month windows contribute (the window
  // COUNT gates edge months out, same in both engines).
  //
  // Scale: the raw scan partial-aggregates to ONE row per calendar
  // month before any window runs — the global window covers the
  // |months| mart frame (q12/W3 precedent), never the orders. The
  // month-of-year rollup is a 12-group aggregation of that same frame.
  //
  // Overflow headroom (r6 soak finding): cents·12·10⁶ overflows BIGINT
  // once monthly revenue passes ~$7.7e9 (hit at the 20× soak). The ppm
  // ratio is therefore computed by STAGED division — with A = cents·12000,
  //   floor(A·1000 / T) = (A div T)·1000 + ((A mod T)·1000) div T
  // an exact identity for nonnegative integers, so every value is
  // bit-identical to the single-multiply form while the largest
  // intermediate is cents·12000 (safe to ~$7.6e12/month, ~1400× the
  // 20× soak). Mirrored verbatim in both engines.
  register("q179_seasonal_decomposition",
    """WITH monthly AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
      |    CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1),
      |t AS (
      |  SELECT month, cents,
      |    CAST(SUM(cents) OVER w12 AS BIGINT) AS trend_sum,
      |    COUNT(*) OVER w12 AS wn
      |  FROM monthly
      |  WINDOW w12 AS (ORDER BY month ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING)),
      |r AS (
      |  SELECT MONTH(month) AS moy,
      |    ((cents * 12000) // trend_sum) * 1000
      |      + (((cents * 12000) % trend_sum) * 1000) // trend_sum
      |      AS ratio_ppm
      |  FROM t WHERE wn = 12)
      |SELECT CAST(moy AS BIGINT) AS moy, CAST(COUNT(*) AS BIGINT) AS n_months,
      |  CAST(SUM(ratio_ppm) AS BIGINT) // COUNT(*) AS seasonal_ppm
      |FROM r GROUP BY 1""".stripMargin) { (s, d) =>
    val monthly = Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).cast(DateType)
        .as("month"))
      .agg(sum(round(col("o_totalprice") * 100).cast(LongType)).as("cents"))
    val w12 = Window.orderBy(col("month")).rowsBetween(-6, 5)
    val r = monthly
      .select(col("month"), col("cents"),
        sum(col("cents")).over(w12).as("trend_sum"),
        count(lit(1)).over(w12).as("wn"))
      .filter(col("wn") === 12)
      .select(month(col("month")).cast(LongType).as("moy"),
        expr("((cents * 12000) div trend_sum) * 1000" +
          " + (((cents * 12000) % trend_sum) * 1000) div trend_sum")
          .as("ratio_ppm"))
    r.groupBy("moy")
      .agg(count(lit(1)).as("n_months"), sum(col("ratio_ppm")).as("sr"))
      .select(col("moy"), col("n_months"),
        expr("sr div n_months").as("seasonal_ppm"))
  }

  // ================================== time-weighted average (TWAP)
  // Interval-weighted mean of an irregular event series: each
  // observation holds until the next one, so its weight is the gap to
  // the successor (the metrics/markets standard where a plain AVG
  // over-counts bursts). Exact arithmetic end to end: values snap to
  // integer cents, gaps are exact epoch-micro differences from LEAD,
  // cents·gap products sum in DECIMAL(38,0) (the q91 contract), and
  // the single division happens once on the final doubles. The last
  // observation per key has no successor and drops out — mirrored
  // WHERE on both sides.
  //
  // Scale: one window shuffle keyed by event_type (LEAD needs only
  // 1-row lookahead state) feeding a map-side-combinable aggregation.
  register("q183_twap",
    """WITH g AS (
      |  SELECT event_type,
      |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents,
      |    LEAD(epoch_us(ts)) OVER (PARTITION BY event_type
      |      ORDER BY ts, event_id) - epoch_us(ts) AS gap_us
      |  FROM events)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_intervals,
      |  CAST(SUM(CAST(cents * gap_us AS DECIMAL(38,0))) AS DOUBLE)
      |    / CAST(SUM(CAST(gap_us AS DECIMAL(38,0))) AS DOUBLE) / 100.0
      |    AS twap
      |FROM g WHERE gap_us IS NOT NULL AND gap_us > 0
      |GROUP BY event_type""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val g = Tables.events(s, d)
      .select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast(LongType).as("cents"),
        (lead(unix_micros(col("ts")), 1).over(w) - unix_micros(col("ts")))
          .as("gap_us"))
      .filter(col("gap_us").isNotNull && col("gap_us") > 0)
    g.groupBy("event_type")
      .agg(count(lit(1)).as("n_intervals"),
        (sum((col("cents") * col("gap_us")).cast(DecimalType(38, 0)))
          .cast(DoubleType)
          / sum(col("gap_us").cast(DecimalType(38, 0))).cast(DoubleType)
          / 100.0).as("twap"))
  }

  // ====================================================== max drawdown
  // Peak-to-trough drawdown per user over the cumulative value series:
  // cum_t = Σ value (integer milli-units) through event t, peak_t =
  // running MAX(cum), drawdown_t = peak_t − cum_t; report each user's
  // worst. The risk/health metric for any monotone-hope series (account
  // balance, cumulative engagement, quota consumption).
  //
  // All-integer: values snap to the 1e3 grid before any sum, so the
  // cumulative series is exact BIGINT at any length. The (ts, event_id)
  // ordering is a total order — ROWS frames are deterministic (q31
  // contract). One user-keyed shuffle; both windows and the rollup ride
  // it.
  register("q193_max_drawdown",
    """WITH v AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(FLOOR(value * 1000 + 0.5) AS BIGINT) AS mil
      |  FROM events),
      |c AS (
      |  SELECT user_id, ts, event_id,
      |    CAST(SUM(mil) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM v),
      |p AS (
      |  SELECT user_id, cum,
      |    CAST(MAX(cum) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS peak
      |  FROM c)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  MAX(cum) AS final_cum_mil,
      |  MAX(peak - cum) AS max_drawdown_mil
      |FROM p GROUP BY user_id""".stripMargin) { (s, d) =>
    val wEv = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        floor(col("value") * 1000 + 0.5).cast(LongType).as("mil"))
      .select(col("user_id"), col("ts"), col("event_id"),
        sum(col("mil")).over(wEv).as("cum"))
      .select(col("user_id"), col("cum"), max(col("cum")).over(wEv).as("peak"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max(col("cum")).as("final_cum_mil"),
        max(col("peak") - col("cum")).as("max_drawdown_mil"))
  }
}

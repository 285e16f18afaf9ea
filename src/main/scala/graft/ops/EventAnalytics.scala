package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Product-analytics operators over the event stream: weekly cohort
  * retention (the activation/retention matrix every growth dashboard is
  * built on) and last-touch marketing attribution (purchases credited to
  * the most recent qualifying touch within a lookback window).
  *
  * Determinism: retention shares live on the integer basis-point grid
  * (floor division of positive counts — identical in both engines);
  * attribution pre-dedupes touches to one per (user, instant) with an
  * explicit preference order, so the as-of pick is unique by
  * construction, and minutes-to-touch is integer microsecond arithmetic.
  *
  * Scale: everything is keyed by user_id — first-event extraction, the
  * (user, week) distinct, and the as-of union all shuffle once on the
  * key; the cohort-size frame joined back is |weeks| rows (broadcast).
  * No interval nested loop anywhere: the 7-day lookback is a filter on
  * the as-of result, not a join predicate.
  */
object EventAnalytics extends QueryModule {
  import Tables.events

  /** Attribution lookback: touches older than this don't get credit. */
  val LookbackUs: Long = 7L * 86400L * 1000000L

  // =========================================================== cohort
  // Weekly cohort retention: users bucketed by the week of their first
  // event; each later active week becomes a (cohort, offset) cell with
  // the surviving-user count and its share of the cohort in basis
  // points. Monday-start weeks in both engines; offsets divide exactly
  // (both endpoints are week starts).
  register("q121_cohort_retention",
    """WITH weekly AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS DATE) AS week
      |  FROM events),
      |firsts AS (
      |  SELECT user_id, MIN(week) AS cohort_week FROM weekly GROUP BY user_id),
      |sizes AS (
      |  SELECT cohort_week, COUNT(*) AS cohort_size
      |  FROM firsts GROUP BY cohort_week),
      |cells AS (
      |  SELECT f.cohort_week,
      |    date_diff('day', f.cohort_week, w.week) // 7 AS week_offset,
      |    COUNT(*) AS n_active
      |  FROM weekly w JOIN firsts f ON w.user_id = f.user_id
      |  GROUP BY 1, 2)
      |SELECT c.cohort_week, c.week_offset, c.n_active, s.cohort_size,
      |  c.n_active * 10000 // s.cohort_size AS retention_bp
      |FROM cells c JOIN sizes s ON c.cohort_week = s.cohort_week""".stripMargin) {
    (s, d) =>
    val weekly = events(s, d)
      .select(col("user_id"),
        date_trunc("week", col("ts")).cast(DateType).as("week"))
      .distinct()
    val firsts = weekly.groupBy("user_id")
      .agg(min(col("week")).as("cohort_week"))
    val sizes = firsts.groupBy("cohort_week")
      .agg(count(lit(1)).as("cohort_size"))
    weekly.join(firsts, "user_id")
      .groupBy(col("cohort_week"),
        expr("datediff(week, cohort_week) div 7").as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(sizes, "cohort_week")
      .withColumn("retention_bp", expr("n_active * 10000 div cohort_size"))
  }

  // ======================================================= attribution
  // Last-touch attribution: each purchase is credited to the most recent
  // view/click by the same user at or before the purchase instant
  // (click preferred over view at the exact same instant, then the
  // higher event_id — making the as-of pick unique), and only if that
  // touch is within the 7-day lookback; otherwise the purchase is
  // organic ('none'). Rolled up per channel.
  register("q122_attribution",
    s"""WITH touches AS (
       |  SELECT user_id, ts, event_type FROM (
       |    SELECT user_id, ts, event_type,
       |      ROW_NUMBER() OVER (PARTITION BY user_id, ts
       |        ORDER BY CASE event_type WHEN 'click' THEN 0 ELSE 1 END,
       |                 event_id DESC) AS rn
       |    FROM events WHERE event_type IN ('view', 'click'))
       |  WHERE rn = 1),
       |joined AS (
       |  SELECT p.user_id, p.ts,
       |    t.ts AS touch_ts, t.event_type AS touch_type
       |  FROM (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
       |  ASOF LEFT JOIN touches t
       |    ON p.user_id = t.user_id AND p.ts >= t.ts),
       |scored AS (
       |  SELECT user_id,
       |    CASE WHEN touch_ts IS NOT NULL
       |          AND epoch_us(ts) - epoch_us(touch_ts) <= $LookbackUs
       |         THEN touch_type ELSE 'none' END AS channel,
       |    CASE WHEN touch_ts IS NOT NULL
       |          AND epoch_us(ts) - epoch_us(touch_ts) <= $LookbackUs
       |         THEN (epoch_us(ts) - epoch_us(touch_ts)) // 60000000
       |         ELSE 0 END AS mins
       |  FROM joined)
       |SELECT channel, COUNT(*) AS n_purchases,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  CAST(SUM(mins) AS BIGINT) AS sum_minutes_to_touch
       |FROM scored GROUP BY channel""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val touchW = Window.partitionBy(col("user_id"), col("ts"))
      .orderBy(when(col("event_type") === "click", 0).otherwise(1),
        col("event_id").desc)
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .withColumn("rn", row_number().over(touchW))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts"),
        col("ts").as("touch_ts"), col("event_type").as("touch_type"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"))
    val attributed = col("touch_ts").isNotNull &&
      unix_micros(col("ts")) - unix_micros(col("touch_ts")) <= LookbackUs
    TemporalJoins
      .asofJoin(purchases, touches, "user_id", "ts",
        Seq("touch_ts", "touch_type"))
      .select(col("user_id"),
        when(attributed, col("touch_type")).otherwise("none").as("channel"),
        when(attributed,
          expr("(unix_micros(ts) - unix_micros(touch_ts)) div 60000000"))
          .otherwise(0L).as("mins"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_purchases"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("mins")).as("sum_minutes_to_touch"))
  }

  // ============================================================ funnel
  // Strict-ORDER sequence funnel view → click → purchase: a user counts
  // at stage N only if the stage-N event happened strictly after their
  // stage-(N−1) entry time (q33 counts co-occurrence; this is the
  // ordered variant real funnel analysis means). Each stage is a
  // conditional MIN per user — deterministic under ties because entry
  // times are exact instants, not row picks. Conversion shares are
  // integer basis points of the previous stage.
  //
  // Scale: three user-keyed aggregate+join rounds that all reuse the
  // user_id hash partitioning (no re-exchange between stages); the
  // 3-row funnel frame is the only thing leaving the cluster.
  register("q123_sequence_funnel",
    """WITH v AS (
      |  SELECT user_id, MIN(ts) AS t1 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |c AS (
      |  SELECT e.user_id, MIN(e.ts) AS t2
      |  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      |  WHERE e.event_type = 'click' GROUP BY e.user_id),
      |p AS (
      |  SELECT e.user_id, MIN(e.ts) AS t3
      |  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      |  WHERE e.event_type = 'purchase' GROUP BY e.user_id),
      |counts AS (
      |  SELECT 1 AS stage, 'view' AS step, (SELECT COUNT(*) FROM v) AS n_users
      |  UNION ALL
      |  SELECT 2, 'click', (SELECT COUNT(*) FROM c)
      |  UNION ALL
      |  SELECT 3, 'purchase', (SELECT COUNT(*) FROM p))
      |SELECT stage, step, n_users,
      |  CASE WHEN LAG(n_users) OVER (ORDER BY stage) IS NULL THEN 10000
      |       WHEN LAG(n_users) OVER (ORDER BY stage) = 0 THEN 0
      |       ELSE n_users * 10000 // LAG(n_users) OVER (ORDER BY stage)
      |  END AS conv_bp
      |FROM counts""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    def stageMin(typ: String, after: Option[DataFrame], prevT: String,
        out: String): DataFrame = {
      val base = ev.filter(col("event_type") === typ)
        .select(col("user_id"), col("ts"))
      val scoped = after.fold(base)(prev =>
        base.join(prev, Seq("user_id")).filter(col("ts") > col(prevT))
          .select(col("user_id"), col("ts")))
      scoped.groupBy("user_id").agg(min(col("ts")).as(out))
    }
    val v = stageMin("view", None, "", "t1")
    val c = stageMin("click", Some(v), "t1", "t2")
    val p = stageMin("purchase", Some(c), "t2", "t3")
    val counts = Seq((1, "view"), (2, "click"), (3, "purchase"))
      .zip(Seq(v, c, p))
      .map { case ((stage, step), df) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(stage).as("stage"), lit(step).as("step"),
            col("n_users"))
      }.reduce(_ unionByName _)
    val w = Window.orderBy(col("stage"))
    counts
      .withColumn("__prev", lag(col("n_users"), 1).over(w))
      .withColumn("conv_bp",
        when(col("__prev").isNull, 10000L)
          .when(col("__prev") === 0, 0L)
          .otherwise(expr("n_users * 10000 div __prev")))
      .drop("__prev")
  }

  // ============================================================ journeys
  /** [[q131]]: events kept per session path (head of the journey). */
  val PathLen = 5
  /** [[q131]]: top paths reported. */
  val TopPaths = 20

  // Top session journeys: sessionize on the 30-minute gap (q31's rule),
  // take each session's first PathLen event types in (ts, event_id)
  // order, and rank the most common paths. The product-analytics "top
  // user flows" table. Deterministic on tie-heavy data: every ordering
  // carries the unique event_id tie-break, equal-instant events land in
  // the same session regardless of intra-tie order, and the final rank
  // breaks count ties on the path string.
  //
  // Scale: sessionization + path build are one (user)-keyed window
  // shuffle + one (user, session) aggregate reusing that partitioning;
  // per-session state is bounded by the PathLen prefix filter BEFORE
  // the collect. The path census partial-aggregates map-side and the
  // top-20 is a TakeOrdered, never a global sort.
  register("q131_session_paths",
    s"""WITH marked AS (
       |  SELECT user_id, ts, event_id, event_type,
       |    CASE WHEN LAG(ts) OVER w IS NULL
       |           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
       |         THEN 1 ELSE 0 END AS brk
       |  FROM events
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT *, CAST(SUM(brk) OVER (PARTITION BY user_id
       |    ORDER BY ts, event_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
       |    AS sid
       |  FROM marked),
       |ranked AS (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, sid
       |    ORDER BY ts, event_id) AS rn
       |  FROM sess),
       |paths AS (
       |  SELECT user_id, sid,
       |    string_agg(event_type, '>' ORDER BY rn) AS path
       |  FROM ranked WHERE rn <= $PathLen GROUP BY user_id, sid),
       |census AS (
       |  SELECT path, COUNT(*) AS n_sessions FROM paths GROUP BY path)
       |SELECT path, n_sessions, rank FROM (
       |  SELECT path, CAST(n_sessions AS BIGINT) AS n_sessions,
       |    ROW_NUMBER() OVER (ORDER BY n_sessions DESC, path ASC) AS rank
       |  FROM census)
       |WHERE rank <= $TopPaths""".stripMargin) { (s, d) =>
    val wU = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val marked = events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("brk",
        when(lag(col("ts"), 1).over(wU).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(wU))
            > 1800000000L, 1L).otherwise(0L))
    val sess = marked.withColumn("sid",
      sum(col("brk")).over(wU.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)))
    val ranked = sess.withColumn("rn", row_number().over(
      Window.partitionBy("user_id", "sid").orderBy(col("ts"), col("event_id"))))
    val paths = ranked.filter(col("rn") <= PathLen)
      .groupBy("user_id", "sid")
      .agg(array_join(transform(array_sort(
        collect_list(struct(col("rn"), col("event_type")))),
        e => e.getField("event_type")), ">").as("path"))
    val census = paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
    census
      .withColumn("rank", row_number().over(
        Window.orderBy(col("n_sessions").desc, col("path").asc)))
      .filter(col("rank") <= TopPaths)
      .select(col("path"), col("n_sessions"), col("rank"))
  }

  // ============================================== survival / churn curve
  // Survival analysis over time-to-next-event: each consecutive event
  // pair contributes one observed duration (the gap to the successor,
  // in whole hours), and with complete observation the survival
  // function needs no cumulative product — S(t) = |gap > t| / |gaps|
  // exactly, so every figure stays on the integer ppm grid: at_risk(t)
  // and ended(t) come from one gap histogram plus a suffix sum over the
  // |distinct gaps| frame, and hazard/survival are exact integer
  // divisions — via GridMath's staged identity (r7): ended·10⁶ would
  // overflow BIGINT past 9.2e12 observed gaps; the staged form is
  // bit-identical and holds to n_gaps ≤ 9.2e15 (SCALE.md). (With
  // right-censoring the product-limit form returns;
  // it composes over the same histogram like q149's prefix sums.)
  //
  // Scale: one user-keyed window (LEAD needs 1-row state), a
  // calendar-bounded histogram, and windows only over that tiny frame —
  // the curve never touches raw events again.
  register("q186_survival_curve",
    s"""WITH gaps AS (
      |  SELECT (LEAD(epoch_us(ts)) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) - epoch_us(ts)) // 3600000000
      |    AS gap_hours
      |  FROM events),
      |hist AS (SELECT gap_hours, CAST(COUNT(*) AS BIGINT) AS ended
      |         FROM gaps WHERE gap_hours IS NOT NULL GROUP BY gap_hours),
      |curve AS (
      |  SELECT gap_hours, ended,
      |    CAST(SUM(ended) OVER (ORDER BY gap_hours
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
      |      AS at_risk,
      |    CAST(SUM(ended) OVER () AS BIGINT) AS n_gaps
      |  FROM hist)
      |SELECT gap_hours, at_risk, ended,
      |  ${GridMath.ppmDuck("ended", "at_risk")} AS hazard_ppm,
      |  ${GridMath.ppmDuck("at_risk - ended", "n_gaps")} AS survival_ppm
      |FROM curve""".stripMargin) { (s, d) =>
    val gaps = events(s, d)
      .select(expr(
        "(lead(unix_micros(ts)) over (partition by user_id order by ts, event_id)"
          + " - unix_micros(ts)) div 3600000000").as("gap_hours"))
      .filter(col("gap_hours").isNotNull)
    val hist = gaps.groupBy("gap_hours").agg(count(lit(1)).as("ended"))
    val wSuffix = Window.orderBy(col("gap_hours"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val wAll = Window.partitionBy()
    hist
      .select(col("gap_hours"), col("ended"),
        sum(col("ended")).over(wSuffix).as("at_risk"),
        sum(col("ended")).over(wAll).as("n_gaps"))
      .select(col("gap_hours"), col("at_risk"), col("ended"),
        expr(GridMath.ppmSpark("ended", "at_risk")).as("hazard_ppm"),
        expr(GridMath.ppmSpark("at_risk - ended", "n_gaps"))
          .as("survival_ppm"))
  }
}

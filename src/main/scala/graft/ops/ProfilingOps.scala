package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data-profiling / featurization operators: the table-shape utilities a
  * pipeline runs before modeling — outlier winsorization, distribution
  * histograms, and per-column profiles. All deterministic (exact
  * rank-and-pick percentile boundaries, integer-exact bin arithmetic,
  * counts only where string formatting would diverge between engines).
  */
object ProfilingOps extends QueryModule {
  import Tables.orders
  import RelationalOps.dsum
  private def oDsum(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(18,4))) AS DOUBLE)"

  // ========================================================= winsorization
  // Clamp per-group values at the exact p05/p95 rank values (rank-and-pick
  // like q66 — one window shuffle on the group key, never a per-group
  // array), then aggregate the clipped column. The boundary frame is a
  // handful of rows and broadcasts back onto the fact scan.
  register("q97_winsorized_stats",
    s"""WITH ranked AS (
       |  SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE) AS v,
       |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
       |      ORDER BY CAST(o_totalprice AS DOUBLE), o_orderkey) AS rn,
       |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
       |  FROM orders),
       |bounds AS (
       |  SELECT o_orderpriority,
       |    MAX(CASE WHEN rn = FLOOR((n-1) * CAST(0.05 AS DOUBLE)) + 1 THEN v END) AS lo,
       |    MAX(CASE WHEN rn = FLOOR((n-1) * CAST(0.95 AS DOUBLE)) + 1 THEN v END) AS hi
       |  FROM ranked GROUP BY o_orderpriority)
       |SELECT r.o_orderpriority, b.lo AS p05, b.hi AS p95,
       |  ${oDsum("LEAST(GREATEST(r.v, b.lo), b.hi)")} AS winsorized_sum,
       |  CAST(SUM(CASE WHEN r.v < b.lo THEN 1 ELSE 0 END) AS BIGINT) AS clipped_low,
       |  CAST(SUM(CASE WHEN r.v > b.hi THEN 1 ELSE 0 END) AS BIGINT) AS clipped_high,
       |  COUNT(*) AS n
       |FROM ranked r JOIN bounds b ON r.o_orderpriority = b.o_orderpriority
       |GROUP BY r.o_orderpriority, b.lo, b.hi""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("v").asc, col("o_orderkey").asc)
    val cw = Window.partitionBy(col("o_orderpriority"))
    val ranked = orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"),
        col("o_totalprice").cast(DoubleType).as("v"))
      .select(col("o_orderpriority"), col("v"),
        row_number().over(w).as("rn"), count(lit(1)).over(cw).as("n"))
    val bounds = ranked.groupBy("o_orderpriority")
      .agg(
        max(when(col("rn") ===
          (floor((col("n") - 1) * 0.05) + 1).cast(LongType), col("v"))).as("lo"),
        max(when(col("rn") ===
          (floor((col("n") - 1) * 0.95) + 1).cast(LongType), col("v"))).as("hi"))
    ranked.join(broadcast(bounds), Seq("o_orderpriority"))
      .groupBy(col("o_orderpriority"), col("lo").as("p05"), col("hi").as("p95"))
      .agg(dsum(least(greatest(col("v"), col("lo")), col("hi"))).as("winsorized_sum"),
        sum(when(col("v") < col("lo"), 1).otherwise(0)).as("clipped_low"),
        sum(when(col("v") > col("hi"), 1).otherwise(0)).as("clipped_high"),
        count(lit(1)).as("n"))
      .select("o_orderpriority", "p05", "p95", "winsorized_sum",
        "clipped_low", "clipped_high", "n")
  }

  // ============================================================ histogram
  // Equi-width 20-bin histogram per group over a global [min, max] axis:
  // the bounds are ONE tiny aggregate broadcast onto a map-only binning
  // pass + one partial-aggregated shuffle on (group, bin). Bin arithmetic
  // is identical IEEE double ops on both sides; the top edge closes into
  // the last bin.
  val HistBins = 20
  register("q98_histogram",
    s"""WITH bounds AS (
       |  SELECT MIN(CAST(o_totalprice AS DOUBLE)) AS mn,
       |         MAX(CAST(o_totalprice AS DOUBLE)) AS mx
       |  FROM orders),
       |binned AS (
       |  SELECT o_orderpriority,
       |    CASE WHEN b.mx = b.mn THEN 0
       |         ELSE LEAST(CAST(FLOOR((CAST(o_totalprice AS DOUBLE) - b.mn)
       |           / ((b.mx - b.mn) / $HistBins)) AS BIGINT), ${HistBins - 1})
       |    END AS bin
       |  FROM orders, bounds b)
       |SELECT o_orderpriority, bin, COUNT(*) AS n
       |FROM binned GROUP BY o_orderpriority, bin""".stripMargin) { (s, d) =>
    val bounds = orders(s, d)
      .agg(min(col("o_totalprice").cast(DoubleType)).as("mn"),
        max(col("o_totalprice").cast(DoubleType)).as("mx"))
    orders(s, d)
      .select(col("o_orderpriority"), col("o_totalprice").cast(DoubleType).as("v"))
      .crossJoin(broadcast(bounds)) // 1-row bounds frame
      .select(col("o_orderpriority"),
        // zero-width guard: a constant column would divide by zero (NaN
        // bins in Spark, a cast error in DuckDB) — all rows land in bin 0
        when(col("mx") === col("mn"), lit(0L))
          .otherwise(
            least(floor((col("v") - col("mn")) / ((col("mx") - col("mn")) / HistBins))
              .cast(LongType), lit((HistBins - 1).toLong))).as("bin"))
      .groupBy("o_orderpriority", "bin")
      .agg(count(lit(1)).as("n"))
  }

  // ============================================================== profile
  // Per-column profile (rows / nulls / distinct) as one UNION of
  // per-column aggregates — counts only: min/max/mean of mixed types
  // would round-trip through engine-specific string formatting. Each leg
  // is a single exact aggregate; Catalyst folds the four scans of the
  // same file into reused exchanges where possible, and at 100 TB the
  // distinct counts are the only shuffles.
  register("q99_profile", {
    def leg(c: String) =
      s"""SELECT '$c' AS column_name, COUNT(*) AS n_rows,
         |  COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct
         |FROM orders""".stripMargin
    Seq("o_custkey", "o_orderpriority", "o_orderdate", "o_orderstatus")
      .map(leg).mkString("\nUNION ALL\n")
  }) { (s, d) =>
    val o = orders(s, d)
    Seq("o_custkey", "o_orderpriority", "o_orderdate", "o_orderstatus")
      .map { c =>
        o.agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count(col(c))).as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"))
          .select(lit(c).as("column_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"))
      }
      .reduce(_.unionAll(_))
  }

  // ============================================================ key skew
  // Partition-skew report for a join/aggregation key — the diagnostic a
  // 100 TB pipeline runs BEFORE choosing salting factors or AQE skew
  // thresholds (SCALE.md): per-key counts, the hottest keys' share of
  // all rows, and a skew coefficient (hottest key vs perfectly-uniform
  // share). All-integer arithmetic — shares on the 1e6 grid via
  // GridMath's exact staged division (r7): the naive cnt·10⁶ /
  // max_cnt·n_keys·10⁶ products overflow BIGINT past ~9.2e12; the
  // staged identity is bit-identical and moves the ceiling to
  // max_cnt·n_keys ≤ 9.2e18 with n_rows ≤ 9.2e15 (SCALE.md). One
  // partial-aggregated shuffle on the key; the totals
  // frame is 1 row, broadcast; top-10 is TakeOrdered, never a full sort.
  register("q108_key_skew",
    s"""WITH per_key AS (
      |  SELECT l_suppkey AS key, COUNT(*) AS cnt FROM lineitem GROUP BY l_suppkey),
      |tot AS (
      |  SELECT COUNT(*) AS n_keys, CAST(SUM(cnt) AS BIGINT) AS n_rows,
      |         MAX(cnt) AS max_cnt, MIN(cnt) AS min_cnt
      |  FROM per_key)
      |SELECT p.key, p.cnt,
      |  ${GridMath.ppmDuck("p.cnt", "t.n_rows")} AS share_grid,
      |  ${GridMath.ppmDuck("t.max_cnt * t.n_keys", "t.n_rows")} AS skew_grid,
      |  t.n_keys, t.n_rows, t.max_cnt, t.min_cnt
      |FROM per_key p, tot t
      |ORDER BY p.cnt DESC, p.key ASC LIMIT 10""".stripMargin) { (s, d) =>
    val perKey = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = perKey.agg(count(lit(1)).as("n_keys"), sum(col("cnt")).as("n_rows"),
      max(col("cnt")).as("max_cnt"), min(col("cnt")).as("min_cnt"))
    perKey.crossJoin(broadcast(tot))
      .select(col("key"), col("cnt"),
        expr(GridMath.ppmSpark("cnt", "n_rows")).as("share_grid"),
        expr(GridMath.ppmSpark("max_cnt * n_keys", "n_rows")).as("skew_grid"),
        col("n_keys"), col("n_rows"), col("max_cnt"), col("min_cnt"))
      .orderBy(col("cnt").desc, col("key").asc)
      .limit(10)
  }

  // ====================================== two-proportion z-test (A/B)
  // Cohort-vs-complement significance test: for each order priority,
  // is its 'F'-status share significantly different from the rest of
  // the population? Pooled two-proportion z², reported on the 1e-6
  // micro-grid with a χ²(1)@95% significance flag.
  //
  // Determinism: the inputs are exact integer counts; every float op
  // (divisions, the products in the pooled variance) is IEEE-exactly
  // rounded and written in THE SAME order in both engines, and the
  // final grid snap uses FLOOR(x + 0.5) (identical on identical
  // doubles) — the q141 micro-grid discipline without the LN step.
  // Degenerate pools (p ∈ {0,1} ⇒ se²=0) yield NULL via a mirrored
  // CASE guard (Spark ANSI throws on double division by zero).
  //
  // Scale: one aggregation over the fact table (map-side combinable),
  // then arithmetic on a |cohorts|-row frame with a broadcast 1-row
  // totals join.
  register("q165_ab_test",
    """WITH c AS (
      |  SELECT o_orderpriority AS cohort,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS k
      |  FROM orders GROUP BY 1),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS tn, CAST(SUM(k) AS BIGINT) AS tk
      |      FROM c),
      |z AS (
      |  SELECT cohort, n, k,
      |    CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p1,
      |    CAST(tk - k AS DOUBLE) / CAST(tn - n AS DOUBLE) AS p2,
      |    CAST(tk AS DOUBLE) / CAST(tn AS DOUBLE) AS pp,
      |    CAST(1 AS DOUBLE) / CAST(n AS DOUBLE)
      |      + CAST(1 AS DOUBLE) / CAST(tn - n AS DOUBLE) AS invn
      |  FROM c CROSS JOIN t),
      |z2 AS (
      |  SELECT cohort, n, k,
      |    CASE WHEN pp * (CAST(1 AS DOUBLE) - pp) * invn = 0 THEN NULL
      |      ELSE (p1 - p2) * (p1 - p2) / (pp * (CAST(1 AS DOUBLE) - pp) * invn)
      |    END AS z2
      |  FROM z)
      |SELECT cohort, n, k,
      |  CAST(FLOOR(z2 * 1000000 + 0.5) AS BIGINT) AS z2_micro,
      |  CAST(FLOOR(z2 * 1000000 + 0.5) > 3841459 AS INTEGER) AS significant
      |FROM z2""".stripMargin) { (s, d) =>
    val c = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("cohort"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("k"))
    val t = c.agg(sum(col("n")).as("tn"), sum(col("k")).as("tk"))
    val z = c.crossJoin(broadcast(t))
      .select(col("cohort"), col("n"), col("k"),
        (col("k").cast(DoubleType) / col("n").cast(DoubleType)).as("p1"),
        ((col("tk") - col("k")).cast(DoubleType)
          / (col("tn") - col("n")).cast(DoubleType)).as("p2"),
        (col("tk").cast(DoubleType) / col("tn").cast(DoubleType)).as("pp"),
        (lit(1.0) / col("n").cast(DoubleType)
          + lit(1.0) / (col("tn") - col("n")).cast(DoubleType)).as("invn"))
    val z2 = z.select(col("cohort"), col("n"), col("k"),
      when(col("pp") * (lit(1.0) - col("pp")) * col("invn") === 0.0, lit(null))
        .otherwise((col("p1") - col("p2")) * (col("p1") - col("p2"))
          / (col("pp") * (lit(1.0) - col("pp")) * col("invn"))).as("z2"))
    z2.select(col("cohort"), col("n"), col("k"),
      floor(col("z2") * 1000000 + 0.5).cast(LongType).as("z2_micro"),
      (floor(col("z2") * 1000000 + 0.5) > 3841459L)
        .cast(IntegerType).as("significant"))
  }

  // ============================== exact Kolmogorov–Smirnov drift
  // Distribution drift between two order-year cohorts as the EXACT KS
  // statistic, kept integral: at every distinct price point v,
  // D(v) = |F₁(v)·n₁·n₂ − F₂(v)·n₁·n₂| = |cum₁·n₂ − cum₂·n₁| — the
  // cross-multiplied form never divides, so the argmax row hashes
  // exactly. The global cumulative counts use the q149 two-pass shape
  // (range-partition by value, per-partition window, partition-count
  // prefix offsets) — never a single-partition window over the value
  // census. The oracle runs the plain global-window formulation, so the
  // gate also re-proves the two-pass decomposition.
  register("q172_ks_drift",
    """WITH b AS (
      |  SELECT CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
      |    CASE WHEN YEAR(CAST(o_orderdate AS DATE)) = 1995 THEN 1 ELSE 0 END AS g1,
      |    CASE WHEN YEAR(CAST(o_orderdate AS DATE)) = 1996 THEN 1 ELSE 0 END AS g2
      |  FROM orders
      |  WHERE YEAR(CAST(o_orderdate AS DATE)) IN (1995, 1996)),
      |cen AS (SELECT cents, CAST(SUM(g1) AS BIGINT) AS c1,
      |        CAST(SUM(g2) AS BIGINT) AS c2 FROM b GROUP BY 1),
      |cum AS (SELECT cents,
      |        SUM(c1) OVER (ORDER BY cents) AS cum1,
      |        SUM(c2) OVER (ORDER BY cents) AS cum2 FROM cen),
      |t AS (SELECT CAST(SUM(g1) AS BIGINT) AS n1,
      |      CAST(SUM(g2) AS BIGINT) AS n2 FROM b)
      |SELECT cents AS at_cents, CAST(cum1 AS BIGINT) AS cum1,
      |  CAST(cum2 AS BIGINT) AS cum2, n1, n2,
      |  CAST(ABS(cum1 * n2 - cum2 * n1) AS BIGINT) AS ks_num
      |FROM cum CROSS JOIN t
      |ORDER BY ABS(cum1 * n2 - cum2 * n1) DESC, cents ASC LIMIT 1""".stripMargin) {
    (s, d) =>
    val b = Tables.orders(s, d)
      .select(floor(col("o_totalprice") * 100 + 0.5).cast(LongType).as("cents"),
        (year(col("o_orderdate").cast(DateType)) === 1995).cast(LongType).as("g1"),
        (year(col("o_orderdate").cast(DateType)) === 1996).cast(LongType).as("g2"))
      .filter(col("g1") + col("g2") > 0)
    val cen = b.groupBy("cents")
      .agg(sum(col("g1")).as("c1"), sum(col("g2")).as("c2"))
    // two-pass global cumsum (q149 shape): local window per range
    // partition + broadcast per-partition offsets
    val local = cen.repartitionByRange(32, col("cents"))
      .select(col("cents"), col("c1"), col("c2"),
        spark_partition_id().as("pid"))
    val wloc = Window.partitionBy(col("pid")).orderBy(col("cents"))
    val cumLocal = local.select(col("cents"), col("pid"),
      sum(col("c1")).over(wloc).as("l1"), sum(col("c2")).over(wloc).as("l2"))
    val woff = Window.orderBy(col("pid"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = local.groupBy("pid")
      .agg(sum(col("c1")).as("p1"), sum(col("c2")).as("p2"))
      .select(col("pid"),
        coalesce(sum(col("p1")).over(woff), lit(0L)).as("o1"),
        coalesce(sum(col("p2")).over(woff), lit(0L)).as("o2"))
    val t = b.agg(sum(col("g1")).as("n1"), sum(col("g2")).as("n2"))
    cumLocal.join(broadcast(offsets), Seq("pid"))
      .crossJoin(broadcast(t))
      .select(col("cents").as("at_cents"),
        (col("o1") + col("l1")).as("cum1"),
        (col("o2") + col("l2")).as("cum2"),
        col("n1"), col("n2"))
      .select(col("at_cents"), col("cum1"), col("cum2"), col("n1"), col("n2"),
        abs(col("cum1") * col("n2") - col("cum2") * col("n1")).as("ks_num"))
      .orderBy(col("ks_num").desc, col("at_cents").asc)
      .limit(1)
  }

  // ========================================= Gini concentration index
  // Per-cohort revenue concentration: the exact rank formula
  // G = (2·Σ rank·x − (n+1)·Σ x) / (n·Σ x) over integer cents with
  // (rank, orderkey)-deterministic ties. Rank·cents products stay in
  // BIGINT per row (≤1.5e13); their sums ride DECIMAL(38,0) (the q109
  // contract), and the single float step is the DECIMAL→DOUBLE cast +
  // one division, identical in both engines, snapped to the 1e-6 grid.
  // One partitioned window + one aggregation — no global sort.
  register("q173_gini",
    """WITH b AS (
      |  SELECT o_orderpriority AS cohort,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
      |    o_orderkey
      |  FROM orders),
      |r AS (SELECT cohort, cents, ROW_NUMBER() OVER (PARTITION BY cohort
      |      ORDER BY cents ASC, o_orderkey ASC) AS rk FROM b),
      |a AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n,
      |      SUM(CAST(cents AS DECIMAL(38,0))) AS sx,
      |      SUM(CAST(rk * cents AS DECIMAL(38,0))) AS srx
      |      FROM r GROUP BY 1)
      |SELECT cohort, n, CAST(sx AS BIGINT) AS sum_cents,
      |  CAST(FLOOR((CAST(2 AS DOUBLE) * CAST(srx AS DOUBLE)
      |    - (CAST(n AS DOUBLE) + CAST(1 AS DOUBLE)) * CAST(sx AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) * 1000000 + 0.5)
      |    AS BIGINT) AS gini_micro
      |FROM a""".stripMargin) { (s, d) =>
    val w = Window.partitionBy(col("cohort"))
      .orderBy(col("cents").asc, col("o_orderkey").asc)
    val r = Tables.orders(s, d)
      .select(col("o_orderpriority").as("cohort"),
        floor(col("o_totalprice") * 100 + 0.5).cast(LongType).as("cents"),
        col("o_orderkey"))
      .select(col("cohort"), col("cents"),
        row_number().over(w).cast(LongType).as("rk"))
    val a = r.groupBy("cohort")
      .agg(count(lit(1)).as("n"),
        sum(col("cents").cast(DecimalType(38, 0))).as("sx"),
        sum((col("rk") * col("cents")).cast(DecimalType(38, 0))).as("srx"))
    a.select(col("cohort"), col("n"), col("sx").cast(LongType).as("sum_cents"),
      floor((lit(2.0) * col("srx").cast(DoubleType)
        - (col("n").cast(DoubleType) + lit(1.0)) * col("sx").cast(DoubleType))
        / (col("n").cast(DoubleType) * col("sx").cast(DoubleType))
        * 1000000 + 0.5).cast(LongType).as("gini_micro"))
  }

  // ====================================== Benford first-digit audit
  // Fraud/data-entry screening staple: the leading-digit distribution of
  // order totals vs Benford's law. Everything rides the integer ppm
  // grid — the first digit comes from the exact-cents BIGINT rendered as
  // a string (integer-to-string is engine-portable, unlike decimal
  // formatting), the observed share is cnt·10⁶ div total, and the
  // expected shares are the same nine ppm literals on both sides
  // (round(log10(1+1/d)·10⁶) — constants, so no runtime transcendentals).
  // Plan: map-only digit extraction + one 9-group aggregation + two
  // 1-row/9-row broadcasts. Nothing here grows with data size except the
  // single map pass.
  private val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66947L, 7 -> 57992L, 8 -> 51153L, 9 -> 45757L)

  register("q175_benford", {
    val values = BenfordPpm.map { case (dg, p) => s"($dg, $p)" }.mkString(", ")
    s"""WITH d AS (
       |  SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice * 100 + 0.5)
       |    AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
       |  FROM orders),
       |obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS cnt
       |        FROM d GROUP BY digit),
       |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM obs),
       |e AS (SELECT * FROM (VALUES $values) v(digit, expected_ppm))
       |SELECT o.digit, o.cnt,
       |  (o.cnt * 1000000) // t.total AS observed_ppm,
       |  CAST(e.expected_ppm AS BIGINT) AS expected_ppm,
       |  (o.cnt * 1000000) // t.total - e.expected_ppm AS deviation_ppm
       |FROM obs o JOIN e ON o.digit = e.digit CROSS JOIN t""".stripMargin
  }) { (s, d) =>
    val digits = orders(s, d)
      .select(substring(floor(col("o_totalprice") * 100 + 0.5)
        .cast(LongType).cast(StringType), 1, 1).cast(LongType).as("digit"))
    val obs = digits.groupBy("digit").agg(count(lit(1)).as("cnt"))
    val total = obs.agg(sum(col("cnt")).as("total"))
    val expected = s.createDataFrame(BenfordPpm.map { case (dg, p) =>
      (dg.toLong, p)
    }).toDF("digit", "expected_ppm")
    obs.join(broadcast(expected), Seq("digit"))
      .crossJoin(broadcast(total))
      .select(col("digit"), col("cnt"),
        expr("(cnt * 1000000) div total").as("observed_ppm"),
        col("expected_ppm"),
        expr("(cnt * 1000000) div total - expected_ppm").as("deviation_ppm"))
  }

  // ==================================================== correlation matrix
  // Pairwise Pearson correlation across the lineitem measures in ONE
  // corpus pass: every Σx, Σx², Σxy rides the q109/q91 exact-moment
  // contract (integer cents first, products exact in BIGINT, sums in
  // DECIMAL(38,0), one correctly-rounded cast to DOUBLE at the end). The
  // matrix explodes from the 1-row moment frame into |pairs| rows —
  // driver-free, no second scan. corr = cov/√(dxx·dyy) uses IEEE-754
  // correctly-rounded sqrt (identical in JVM and DuckDB) and snaps to
  // the 1e-6 grid; zero-variance pairs yield NULL (Spark ANSI would
  // throw on the raw division).
  //
  // Scale: one map-side-combinable aggregation — 15 running sums —
  // regardless of column-pair count; the pair explosion is O(k²) on a
  // 1-row frame. This is the shape a 100 TB profiler needs: never one
  // pass per pair.
  private val CorrCols = Seq(
    "qty" -> "l_quantity", "price" -> "l_extendedprice",
    "disc" -> "l_discount", "tax" -> "l_tax")
  private val CorrPairs = for {
    ((a, _), i) <- CorrCols.zipWithIndex
    (b, _) <- CorrCols.drop(i + 1)
  } yield (a, b)

  register("q182_corr_matrix", {
    def cts(src: String) = s"CAST(FLOOR($src * 100 + 0.5) AS BIGINT)"
    val moments = CorrCols.map { case (n2, src) =>
      s"CAST(SUM(CAST(${cts(src)} AS DECIMAL(38,0))) AS DOUBLE) AS s_$n2,\n" +
        s"    CAST(SUM(CAST(${cts(src)} * ${cts(src)} AS DECIMAL(38,0))) AS DOUBLE) AS ss_$n2"
    }.mkString(",\n    ")
    val crosses = CorrPairs.map { case (a, b) =>
      val sa = cts(CorrCols.toMap.apply(a).toString)
      val sb = cts(CorrCols.toMap.apply(b).toString)
      s"CAST(SUM(CAST($sa * $sb AS DECIMAL(38,0))) AS DOUBLE) AS sx_${a}_$b"
    }.mkString(",\n    ")
    val legs = CorrPairs.map { case (a, b) =>
      s"""SELECT '$a' AS col_a, '$b' AS col_b, n,
         |  CASE WHEN (n0 * ss_$a - s_$a * s_$a) * (n0 * ss_$b - s_$b * s_$b) = 0
         |    THEN NULL
         |    ELSE CAST(FLOOR((n0 * sx_${a}_$b - s_$a * s_$b)
         |      / SQRT((n0 * ss_$a - s_$a * s_$a) * (n0 * ss_$b - s_$b * s_$b))
         |      * 1000000 + 0.5) AS BIGINT)
         |  END AS corr_micro
         |FROM sums""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH sums AS (
       |  SELECT CAST(COUNT(*) AS DOUBLE) AS n0,
       |    CAST(COUNT(*) AS BIGINT) AS n,
       |    $moments,
       |    $crosses
       |  FROM lineitem)
       |$legs""".stripMargin
  }) { (s, d) =>
    import Tables.lineitem
    def cts(src: String): org.apache.spark.sql.Column =
      floor(col(src) * 100 + 0.5)
    def dsumD(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      sum(c.cast(DecimalType(38, 0))).cast(DoubleType)
    val srcOf = CorrCols.toMap
    val moments = CorrCols.flatMap { case (n2, src) =>
      Seq(dsumD(cts(src)).as(s"s_$n2"),
        dsumD(cts(src) * cts(src)).as(s"ss_$n2"))
    }
    val crosses = CorrPairs.map { case (a, b) =>
      dsumD(cts(srcOf(a)) * cts(srcOf(b))).as(s"sx_${a}_$b")
    }
    val aggs = (count(lit(1)).cast(DoubleType).as("n0") +: // parity column
      count(lit(1)).as("n") +: (moments ++ crosses))
    val sums = lineitem(s, d).agg(aggs.head, aggs.tail: _*)
    val legs = CorrPairs.map { case (a, b) =>
      val dxx = col("n0") * col(s"ss_$a") - col(s"s_$a") * col(s"s_$a")
      val dyy = col("n0") * col(s"ss_$b") - col(s"s_$b") * col(s"s_$b")
      val cov = col("n0") * col(s"sx_${a}_$b") - col(s"s_$a") * col(s"s_$b")
      sums.select(lit(a).as("col_a"), lit(b).as("col_b"), col("n"),
        when(dxx * dyy === 0, lit(null))
          .otherwise(floor(cov / sqrt(dxx * dyy) * 1000000 + 0.5)
            .cast(LongType)).as("corr_micro"))
    }
    legs.reduce(_.unionAll(_))
  }

  // ======================================== frozen-distribution PIT scoring
  // Probability-integral-transform features: score each new observation
  // by its percentile within a FROZEN reference cohort (train-time
  // distribution), the leakage-safe normalization a feature store
  // applies at serving time. The reference ECDF is compressed to 100
  // exact rank-and-pick boundary values per cohort (integer index
  // arithmetic — ((n−1)·p) div 100 + 1 truncates identically in both
  // engines); scoring counts boundaries ≤ x. The Spark side carries the
  // boundaries as a sorted 100-element array on a |cohorts|-row
  // broadcast frame and scores with a map-only array fold — no per-row
  // join blowup, no data-sized window; the oracle expands the same
  // count through a boundary join.
  //
  // Scale: the reference pass is one cohort-partitioned window; scoring
  // is map-only against a broadcast that is O(cohorts × 100) regardless
  // of data size. Exactly the shape a 100 TB serving pipeline wants.
  register("q184_pit_scoring",
    """WITH ref AS (
      |  SELECT o_orderpriority AS prio,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
      |    o_orderkey
      |  FROM orders WHERE o_orderdate < DATE '1996-01-01'),
      |ranked AS (
      |  SELECT prio, cents,
      |    ROW_NUMBER() OVER (PARTITION BY prio ORDER BY cents, o_orderkey)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY prio) AS n
      |  FROM ref),
      |ps AS (SELECT * FROM generate_series(1, 100) t(p)),
      |bnd AS (
      |  SELECT prio, p,
      |    MAX(CASE WHEN rn = ((n - 1) * p) // 100 + 1 THEN cents END) AS bv
      |  FROM ranked, ps WHERE rn = ((n - 1) * p) // 100 + 1
      |  GROUP BY prio, p),
      |score AS (
      |  SELECT o_orderkey, o_orderpriority AS prio,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderdate >= DATE '1996-01-01')
      |SELECT s.o_orderkey, s.prio AS o_orderpriority, s.cents,
      |  CAST(COUNT(CASE WHEN b.bv <= s.cents THEN 1 END) AS BIGINT)
      |    AS pit_pct
      |FROM score s JOIN bnd b ON s.prio = b.prio
      |GROUP BY 1, 2, 3""".stripMargin) { (s, d) =>
    import s.implicits._
    val split = lit(java.sql.Date.valueOf("1996-01-01"))
    val o = orders(s, d).select(col("o_orderkey"),
      col("o_orderpriority").as("prio"),
      floor(col("o_totalprice") * 100 + 0.5).cast(LongType).as("cents"),
      col("o_orderdate").cast(DateType).as("dt"))
    val wP = Window.partitionBy(col("prio"))
    val ranked = o.filter(col("dt") < split)
      .select(col("prio"), col("cents"),
        row_number().over(wP.orderBy(col("cents"), col("o_orderkey")))
          .as("rn"),
        count(lit(1)).over(wP).as("n"))
    val ps = (1 to 100).toDF("p")
    val bnd = ranked
      .join(broadcast(ps), col("rn") === expr("((n - 1) * p) div 100 + 1"))
      .groupBy("prio")
      .agg(sort_array(collect_list(col("cents"))).as("bnds"))
    o.filter(col("dt") >= split)
      .join(broadcast(bnd), Seq("prio"))
      .select(col("o_orderkey"), col("prio").as("o_orderpriority"),
        col("cents"),
        aggregate(col("bnds"), lit(0L),
          (acc, b) => acc + when(b <= col("cents"), 1L).otherwise(0L))
          .as("pit_pct"))
  }

  // ============================================ Wilson-bound ranking
  // Rank suppliers by return rate the statistically honest way: the
  // Wilson score lower bound at z = 1.96 penalizes small samples, so a
  // 2/2 supplier doesn't outrank a 180/200 one — the standard fix for
  // naive-proportion leaderboards (quality filters, reviewer scores,
  // variant ranking).
  //
  // Determinism (the q165 measured contract): counts are exact BIGINTs;
  // the bound is ONE double chain — identical literals (1.9208 = z²/2,
  // 0.9604 = z²/4, 3.8416 = z² written as literals, never recomputed,
  // so both engines parse the same double), identical operation order,
  // IEEE-correctly-rounded /,·,√ — snapped once to the ppm grid.
  //
  // Scale: one supplier-keyed aggregation (map-side combined), then a
  // TakeOrdered top-[[WilsonTopK]] over the bounded supplier frame —
  // no global sort, no window.
  val WilsonTopK = 50

  register("q191_wilson_ranking",
    s"""WITH s AS (
       |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(COUNT(CASE WHEN l_returnflag = 'R' THEN 1 END) AS BIGINT)
       |      AS x
       |  FROM lineitem GROUP BY 1),
       |w AS (
       |  SELECT l_suppkey, n, x, CAST(x AS DOUBLE) / n AS p FROM s)
       |SELECT l_suppkey AS suppkey, n AS n_lines, x AS n_returns,
       |  CAST(FLOOR((p + 1.9208 / n
       |      - 1.96 * SQRT((p * (1 - p) + 0.9604 / n) / n))
       |    / (1 + 3.8416 / n) * 1000000 + 0.5) AS BIGINT) AS wilson_lb_ppm
       |FROM w
       |ORDER BY wilson_lb_ppm DESC, suppkey ASC LIMIT $WilsonTopK"""
      .stripMargin) { (s, d) =>
    val agg = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n"),
        count(when(col("l_returnflag") === "R", 1)).as("x"))
    val p = col("x").cast(DoubleType) / col("n")
    agg.select(col("l_suppkey").as("suppkey"), col("n").as("n_lines"),
        col("x").as("n_returns"),
        floor((p + lit(1.9208) / col("n")
            - lit(1.96) * sqrt((p * (lit(1) - p) + lit(0.9604) / col("n"))
              / col("n")))
          / (lit(1) + lit(3.8416) / col("n")) * 1000000 + 0.5)
          .cast(LongType).as("wilson_lb_ppm"))
      .orderBy(col("wilson_lb_ppm").desc, col("suppkey").asc)
      .limit(WilsonTopK)
  }
}

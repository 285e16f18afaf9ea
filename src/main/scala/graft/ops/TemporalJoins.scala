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
  register("q58_asof_join",
    """SELECT p.user_id, p.event_id AS purchase_id, p.ts AS purchase_ts,
      |  v.event_id AS view_id, v.ts AS view_ts,
      |  CASE WHEN v.ts IS NULL THEN NULL
      |       ELSE epoch_us(p.ts) - epoch_us(v.ts) END AS view_to_purchase_us
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
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
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"), col("ts").as("v_ts"),
        col("event_id").as("view_id"), col("ts").as("view_ts"))
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
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND p.ts <= v.ts""".stripMargin) { (s, d) =>
    val ev = events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user_id"),
        col("event_id").as("view_id"), col("ts").as("view_ts"))
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
}

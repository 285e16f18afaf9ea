package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** Hand-computed semantics for the EWMA smoother (q140) and the
  * per-customer Pareto skyline (q144), plus the q140 plan shape pin
  * (all lag terms must collapse into ONE Window operator).
  */
class EwmaSkylineSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ewma_sky_fixtures").toString
    Seq(
      // customer 1: three active months, revenue doubling — EWMA lands on
      // exact rationals (100, 166.666..., 300.0)
      (1L, 1L, "O", 100.0, Timestamp.valueOf("2024-01-10 00:00:00"), "1-URGENT"),
      (2L, 1L, "O", 200.0, Timestamp.valueOf("2024-02-05 00:00:00"), "1-URGENT"),
      (3L, 1L, "O", 400.0, Timestamp.valueOf("2024-03-20 00:00:00"), "1-URGENT"),
      // two orders in one month aggregate before smoothing
      (4L, 2L, "O", 70.0, Timestamp.valueOf("2024-01-01 00:00:00"), "2-HIGH"),
      (5L, 2L, "O", 30.0, Timestamp.valueOf("2024-01-31 00:00:00"), "2-HIGH"),
      // skyline customer 3: dates d3/d3/d2/d1 with prices 100/100/50/200
      (31L, 3L, "O", 100.0, Timestamp.valueOf("2024-03-01 00:00:00"), "3-MEDIUM"),
      (34L, 3L, "O", 100.0, Timestamp.valueOf("2024-03-01 00:00:00"), "3-MEDIUM"),
      (32L, 3L, "O", 50.0, Timestamp.valueOf("2024-02-01 00:00:00"), "3-MEDIUM"),
      (33L, 3L, "O", 200.0, Timestamp.valueOf("2024-01-01 00:00:00"), "3-MEDIUM"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    d
  }

  test("q140: truncated half-life EWMA renormalizes over present terms") {
    val rows = graft.SparkEntry.queries("q140_ewma")(spark, dir)
      .filter("o_custkey = 1").orderBy("month")
      .select("revenue", "ewma").collect()
    assert(rows.map(_.getDouble(0)).toSeq == Seq(100.0, 200.0, 400.0))
    val ewma = rows.map(_.getDouble(1))
    assert(ewma(0) == 100.0)                    // first month: no history
    assert(math.abs(ewma(1) - 500.0 / 3) < 1e-12) // (200·2 + 100)/3
    assert(ewma(2) == 300.0)                    // (400·4 + 200·2 + 100)/7
  }

  test("q140: same-month orders aggregate before smoothing") {
    val rows = graft.SparkEntry.queries("q140_ewma")(spark, dir)
      .filter("o_custkey = 2").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Double]("revenue") == 100.0)
    assert(rows.head.getAs[Double]("ewma") == 100.0)
  }

  test("q140 plan: all lag terms collapse into one Window operator") {
    // count via the plan string — executedPlan is an AQE wrapper whose
    // children aren't visible to collect() before execution
    val plan = graft.SparkEntry.queries("q140_ewma")(spark, dir)
      .queryExecution.executedPlan.toString
    val windows = "Window \\[".r.findAllIn(plan).length
    assert(windows == 1,
      s"expected ONE collapsed Window, got $windows:\n$plan")
  }

  test("q144: frontier keeps the cheapest-at-each-recency orders only") {
    val keys = graft.SparkEntry.queries("q144_skyline")(spark, dir)
      .filter("o_custkey = 3").select("o_orderkey").collect()
      .map(_.getLong(0)).toSet
    // 31 opens the frontier; 34 ties (date, price) and loses on orderkey;
    // 32 is older but strictly cheaper; 33 is older AND pricier (dominated)
    assert(keys == Set(31L, 32L))
  }

  test("q144: single-order customers are trivially on the frontier") {
    val out = graft.SparkEntry.queries("q144_skyline")(spark, dir)
      .filter("o_custkey = 1").collect()
    // strictly-decreasing prices backwards in time: every order survives
    assert(out.map(_.getAs[Long]("o_orderkey")).toSet == Set(1L, 2L, 3L))
  }
}

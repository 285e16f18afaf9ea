package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** q127/q128 interval semantics: the binned overlap join must equal the
  * brute-force quadratic join (every pair exactly once — the bin-ownership
  * dedup neither drops nor duplicates), and the concurrency sweep's peak
  * must equal the brute-force "intervals containing the day" count.
  */
class IntervalOpsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def intervals = Tables.orders(spark, sf).select(
    col("o_orderkey").as("id"), col("o_custkey").as("cust"),
    datediff(to_date(col("o_orderdate")), to_date(lit("1990-01-01")))
      .cast(LongType).as("lo"))
    .withColumn("hi", col("lo") + col("id") % 20 + 5)

  test("binned overlap join equals the brute-force pair join") {
    val got = TemporalJoins.queries("q127_interval_overlap")(spark, sf)
      .select("cust", "id_a", "id_b", "overlap_days")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val a = intervals
    val b = intervals.select(col("id").as("id2"), col("cust").as("cust2"),
      col("lo").as("lo2"), col("hi").as("hi2"))
    val brute = a.join(b, col("cust") === col("cust2") &&
        col("id") < col("id2") &&
        col("lo") <= col("hi2") && col("lo2") <= col("hi"))
      .select(col("cust"), col("id"), col("id2"),
        (least(col("hi"), col("hi2")) - greatest(col("lo"), col("lo2")) + 1)
          .as("od"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    assert(got === brute)
    assert(got.nonEmpty)
  }

  test("proration conserves the window: per-order overlap days sum to " +
      "window_days and earned_micro never exceeds the full amount") {
    val er = TemporalJoins.queries("q135_earned_revenue")(spark, sf)
    val perOrder = er.groupBy("o_orderkey")
      .agg(sum(col("overlap_days")).as("d"),
        max(col("window_days")).as("w"),
        sum(col("earned_micro")).as("e"))
    assert(perOrder.filter(col("d") =!= col("w")).count() === 0)
    // truncating division can under-allocate by at most (months-1) micro
    // units per order, never over-allocate
    val cents = Tables.orders(spark, sf).select(col("o_orderkey"),
      floor(col("o_totalprice") * 100 + 0.5).cast(LongType)
        .as("cents"))
    val joined = perOrder.join(cents, "o_orderkey")
    assert(joined.filter(col("e") > col("cents") * 1000000L).count() === 0)
    assert(joined.filter(col("cents") * 1000000L - col("e") >= 1000000L)
      .count() === 0)
  }

  test("sweep peak equals brute-force concurrency at the peak day") {
    val peaks = TemporalJoins.queries("q128_peak_concurrency")(spark, sf)
      .withColumn("day_idx",
        datediff(col("peak_day"), to_date(lit("1990-01-01"))).cast(LongType))
      .select("cust", "peak_open", "day_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

    val iv = intervals.select("cust", "lo", "hi").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)

    peaks.foreach { case (cust, peak, day) =>
      val spans = iv(cust)
      val at = spans.count { case (_, lo, hi) => lo <= day && day <= hi }
      assert(at.toLong === peak, s"cust=$cust day=$day")
      // no earlier day beats the peak (first-peak-day semantics)
      val earlierMax = spans.flatMap { case (_, lo, _) => Seq(lo) }
        .filter(_ < day)
        .map(d0 => spans.count { case (_, lo, hi) => lo <= d0 && d0 <= hi })
      assert(earlierMax.forall(_ < peak), s"cust=$cust")
    }
  }
}

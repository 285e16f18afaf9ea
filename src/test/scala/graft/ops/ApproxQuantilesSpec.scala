package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q85: approx_percentile's rank-error guarantee (≤ n/accuracy per
  * group) checked against the exactly-ranked column.
  */
class ApproxQuantilesSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private val ps = Seq(0.25, 0.5, 0.75, 0.95)
  private val accuracy = 10000

  test("gate query reports within_bound for every (group, quantile)") {
    val rows = RelationalOps.queries("q85_approx_quantiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    val flags = graft.ops.Tables.lineitem(spark, sf)
      .select("l_returnflag").distinct().count()
    assert(rows.length == flags * ps.length)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("within_bound"),
        s"${r.getString(0)} p=${r.getDouble(1)}: rank bound breached")
    }
  }

  test("approx quantile values sit within the guaranteed rank window of exact") {
    // independent of the gate query's own rank check: recompute the raw
    // sketch values and verify against the exactly-ranked column
    val approx = graft.ops.Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(approx_percentile(col("l_extendedprice"),
        array(ps.map(lit): _*), lit(accuracy)).as("qs"))
      .collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val byFlag = graft.ops.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(approx.nonEmpty)
    approx.foreach { case (flag, qs) =>
      val sorted = byFlag(flag)
      val n = sorted.length
      qs.zip(ps).foreach { case (a, p) =>
        val tol = math.max(1, n / accuracy)
        val target = math.ceil(p * n).toInt - 1
        val lo = sorted(math.max(0, target - tol))
        val hi = sorted(math.min(n - 1, target + tol))
        assert(a >= lo && a <= hi,
          s"$flag p=$p approx=$a outside rank window [$lo, $hi] (n=$n)")
      }
    }
  }
}

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

  test("approx quantiles sit within the guaranteed rank window of exact") {
    val rows = RelationalOps.queries("q85_approx_quantiles")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byFlag = graft.ops.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(rows.length == byFlag.size * ps.length)
    rows.foreach { r =>
      val flag = r.getString(0)
      val p = r.getDouble(1)
      val a = r.getDouble(2)
      val sorted = byFlag(flag)
      val n = sorted.length
      assert(r.getLong(3) == n)
      val tol = math.max(1, n / accuracy)
      val target = math.ceil(p * n).toInt - 1
      val lo = sorted(math.max(0, target - tol))
      val hi = sorted(math.min(n - 1, target + tol))
      assert(a >= lo && a <= hi,
        s"$flag p=$p approx=$a outside rank window [$lo, $hi] (n=$n)")
    }
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins q177's Morton interleave and the layout property it exists for:
  * a Z-ordered file layout bounds EVERY interleaved dimension's per-file
  * span, where a single-column sort bounds only its own column.
  */
class ZorderSpec extends SparkSpec {

  private def refInterleave(x: Long, y: Long): Long =
    (0 until 16).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("zValue matches the reference bit-interleave on edge and random grid") {
    import spark.implicits._
    val probes = Seq[(Long, Long)](
      (0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L),
      (1L, 0L), (0L, 1L), (32768L, 1L), (21845L, 43690L)) ++
      (0 until 50).map(i => ((i * 7919L) % 65536L, (i * 104729L) % 65536L))
    val got = probes.toDF("x", "y")
      .select(col("x"), col("y"),
        LayoutOps.zValue(col("x"), col("y")).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) === refInterleave(r.getLong(0), r.getLong(1)),
        s"interleave mismatch at (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("z is monotone within a quadrant: prefix bits dominate") {
    // All points in the low half of both axes sort before any point in
    // the high half of both axes — the property file pruning relies on.
    import spark.implicits._
    val lo = refInterleave(32767L, 32767L) // max of low-low quadrant
    val hi = refInterleave(32768L, 32768L) // min of high-high quadrant
    assert(lo < hi)
  }

  test("z-layout bounds x spans where a y-sort layout does not") {
    val sf = "/root/testdata/sf0.001"
    val base = Tables.orders(spark, sf).select(
      col("o_orderkey"),
      col("o_custkey").cast(LongType).as("x"),
      datediff(col("o_orderdate").cast(DateType),
        lit(java.sql.Date.valueOf("1992-01-01"))).cast(LongType).as("y"))
    val bounds = base.agg(min(col("x")).as("xmn"), max(col("x")).as("xmx"),
      min(col("y")).as("ymn"), max(col("y")).as("ymx"))
    val qz = base.crossJoin(broadcast(bounds))
      .select(col("o_orderkey"),
        expr("((x - xmn) * 65535) div greatest(xmx - xmn, 1)").as("xq"),
        expr("((y - ymn) * 65535) div greatest(ymx - ymn, 1)").as("yq"))

    def avgFileXSpan(orderCols: Seq[org.apache.spark.sql.Column]): Double = {
      import org.apache.spark.sql.expressions.Window
      val ranked = qz.select(col("xq"), col("yq"),
        row_number().over(Window.orderBy(orderCols: _*)).as("rn"))
      val n = ranked.count()
      val spans = ranked
        .select(col("xq"), expr(s"((rn - 1) * 16) div $n").as("f"))
        .groupBy("f").agg((max(col("xq")) - min(col("xq"))).as("span"))
        .agg(avg(col("span"))).collect()(0).getDouble(0)
      spans
    }

    val zSpan = avgFileXSpan(Seq(
      LayoutOps.zValue(col("xq"), col("yq")), col("o_orderkey")))
    val ySpan = avgFileXSpan(Seq(col("yq"), col("o_orderkey")))
    assert(zSpan < ySpan / 2,
      s"z-layout avg x-span $zSpan should be well under y-sort's $ySpan")
  }
}

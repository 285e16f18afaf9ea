package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  private def parquetFiles(dir: String): Array[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("."))

  test("compacts a many-small-files dataset to the computed file count, rows preserved") {
    val base = java.nio.file.Files.createTempDirectory("compact").toString
    val src = graft.ops.Tables.lineitem(spark, "/root/testdata/sf0.001")
    src.repartition(40).write.mode("overwrite").parquet(s"$base/small")
    assert(parquetFiles(s"$base/small").length === 40)
    val inBytes = parquetFiles(s"$base/small").map(_.length()).sum
    val n = Compaction.compact(spark, s"$base/small", s"$base/big",
      targetBytes = inBytes / 4)
    assert(parquetFiles(s"$base/big").length === n)
    assert(n <= 6 && n >= 4, s"expected ~5 output files, got $n")
    assert(spark.read.parquet(s"$base/big").count() === src.count())
  }

  test("sortBy compaction range-partitions and sorts — file min/max ranges are disjoint") {
    val base = java.nio.file.Files.createTempDirectory("compact_sorted").toString
    val src = graft.ops.Tables.orders(spark, "/root/testdata/sf0.001")
    src.repartition(20).write.mode("overwrite").parquet(s"$base/small")
    val inBytes = parquetFiles(s"$base/small").map(_.length()).sum
    Compaction.compact(spark, s"$base/small", s"$base/sorted",
      targetBytes = inBytes / 3, sortBy = Seq("o_orderkey"))
    // per-file key ranges must not overlap: that's what makes parquet
    // min/max stats skip files for key-ranged scans
    val ranges = parquetFiles(s"$base/sorted").map { f =>
      val r = spark.read.parquet(f.getAbsolutePath)
        .agg(min("o_orderkey"), max("o_orderkey")).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    assert(ranges.length >= 2)
    ranges.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) =>
        assert(hi1 <= lo2, s"overlapping file ranges: $hi1 > $lo2")
      case _ =>
    }
    assert(spark.read.parquet(s"$base/sorted").count() === src.count())
  }

  test("zorder compaction bounds per-file ranges on BOTH dimensions") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("compact_zorder").toString
    // two pseudo-independent uniform dimensions over [0, 1000)
    val src = (0L until 100000L).toDF("id")
      .select(col("id"), (col("id") % 1000).as("x"),
        ((col("id") * 7919) % 1000).as("y"))
    src.repartition(20).write.mode("overwrite").parquet(s"$base/small")
    val inBytes = parquetFiles(s"$base/small").map(_.length()).sum

    // baseline: single-column sort — y is uncorrelated with x, so each
    // x-sorted file covers essentially the whole y range
    Compaction.compact(spark, s"$base/small", s"$base/xsorted",
      targetBytes = inBytes / 16, sortBy = Seq("x"))
    // z-order on (x, y)
    val n = Compaction.zorderCompact(spark, s"$base/small", s"$base/zord",
      ("x", "y"), targetBytes = inBytes / 16)
    assert(n >= 8, s"want a multi-file layout, got $n")
    assert(spark.read.parquet(s"$base/zord").count() === 100000L)

    def meanCoverage(dir: String, c: String): Double = {
      val spans = parquetFiles(dir).map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c)), max(col(c))).head()
        (r.getLong(1) - r.getLong(0)).toDouble / 1000.0
      }
      spans.sum / spans.length
    }
    val ySorted = meanCoverage(s"$base/xsorted", "y")
    val yZ = meanCoverage(s"$base/zord", "y")
    val xZ = meanCoverage(s"$base/zord", "x")
    // x-sorted files each span ~the full y range; z-ordered files must
    // bound BOTH dimensions well below it
    assert(ySorted > 0.9, s"baseline y coverage unexpectedly low: $ySorted")
    assert(yZ < 0.6, s"zorder y coverage too wide: $yZ")
    assert(xZ < 0.6, s"zorder x coverage too wide: $xZ")
  }
}

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
}

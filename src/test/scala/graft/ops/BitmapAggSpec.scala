package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

class BitmapAggSpec extends SparkSpec {
  import spark.implicits._

  private val bd = udaf(BitmapAgg.aggregator(1 << 10), Encoders.scalaLong)

  test("bitmap distinct equals COUNT(DISTINCT) and is partitioning-invariant") {
    // duplicate-heavy keys across several groups
    val df = (0L until 5000L).map(i => ((i % 3).toString, (i * 17) % 800))
      .toDF("g", "k")
    val expect = df.groupBy("g").agg(countDistinct(col("k")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (parts <- Seq(1, 7)) {
      val got = df.repartition(parts).groupBy("g").agg(bd(col("k")).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === expect, s"parts=$parts")
    }
  }

  test("empty groups and single-key groups count correctly") {
    val df = Seq(("a", 5L), ("a", 5L), ("b", 0L)).toDF("g", "k")
    val got = df.groupBy("g").agg(bd(col("k")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("a" -> 1L, "b" -> 1L))
  }

  test("keys outside the declared domain fail loudly instead of aliasing") {
    val df = Seq(("a", 1L << 11)).toDF("g", "k")
    val e = intercept[Exception] {
      df.groupBy("g").agg(bd(col("k")).as("n")).collect()
    }
    assert(e.getMessage != null)
  }

  test("domains beyond the bounded-state cap are rejected at build") {
    intercept[IllegalArgumentException] {
      BitmapAgg.aggregator(BitmapAgg.MaxDomain + 1)
    }
  }
}

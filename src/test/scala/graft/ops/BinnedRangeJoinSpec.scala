package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinnedRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned range join is row-identical to the plain inequality join") {
    val fact = (0 until 5000).map(i => (i.toLong, (i * 37 % 100000).toDouble))
      .toDF("id", "v")
    // overlapping, non-uniform intervals incl. one covering everything
    val intervals = Seq(
      (0L, 0.0, 1000.0), (1L, 500.0, 20000.0), (2L, 15000.0, 15001.0),
      (3L, 0.0, 100000.0), (4L, 99000.0, 99999.0)
    ).toDF("interval_id", "lo", "hi")
    val binned = TemporalJoins.binnedRangeJoin(fact, col("v"), intervals,
      col("lo"), col("hi"), binWidth = 1000L)
      .select("id", "interval_id")
    val plain = fact.join(intervals, col("v") >= col("lo") && col("v") < col("hi"))
      .select("id", "interval_id")
    assert(binned.count() === plain.count())
    assert(binned.exceptAll(plain).isEmpty && plain.exceptAll(binned).isEmpty)
  }

  test("binned range join plans shuffled equi-join, not a nested loop") {
    val fact = spark.range(100).select(col("id"), (col("id") * 7 % 1000)
      .cast("double").as("v"))
    val intervals = spark.range(50).select(col("id").as("iid"),
      (col("id") * 20).cast("double").as("lo"),
      (col("id") * 20 + 30).cast("double").as("hi"))
    // force the non-broadcast path to show the scale shape
    val noBroadcast = intervals.hint("shuffle_hash")
    val plan = TemporalJoins.binnedRangeJoin(fact, col("v"), noBroadcast,
      col("lo"), col("hi"), binWidth = 20L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"binned join must never nested-loop:\n$plan")
    assert(plan.contains("__bin"), "join key must be the bin column")
  }
}

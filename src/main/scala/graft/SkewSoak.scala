package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-evidence harness: a synthetic 90%-hot join key over the soak
  * lineitem (6M rows), measured four ways — skew-split disabled
  * (straggler baseline), AQE skew-join split, the explicit salted-join
  * path (`graft.ops.Salting`), and a hot-key AGGREGATION (partial
  * aggregation absorbs group-key skew with no special handling).
  *
  * Prints one line per variant: wall, task count, p50/max task time, and
  * whether the executed plan carries AQE's `skew=true` marker. Evidence
  * recorded in PLANS.md.
  *
  * Local-scale note: the 5.4M-row hot partition is ~90 MB in-shuffle —
  * under AQE's 256 MB default split threshold, so the harness lowers the
  * threshold/advisory size to 8 MB to reproduce at soak scale the split
  * decision the DEFAULTS would take at cluster scale (same 90% skew on a
  * 100× fact table is ~9 GB in one reducer: split or die).
  */
object SkewSoak {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/soak")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // DSv2 storage-partitioned joins (KeyGroupedPartitioning zip) —
      // set at session build so q161 never mutates the shared session
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // force sort-merge: broadcast would (correctly) sidestep the skew,
      // but the point is the shape where the dim does NOT fit in memory
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8m")
      .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val times = scala.collection.mutable.ArrayBuffer[Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        times.synchronized { times += t.taskInfo.duration }
    })

    // 90% of fact rows land on k=0; the rest spread over 1..999
    val fact = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(
        when(pmod(hash(col("l_orderkey"), col("l_linenumber"),
            col("l_partkey")), lit(10)) < 9, 0L)
          .otherwise(pmod(hash(col("l_orderkey")), lit(1000)).cast("long"))
          .as("k"),
        col("l_extendedprice").cast("double").as("v"))
    val dim = spark.range(0, 1000)
      .select(col("id").as("k"), (col("id") % 50).as("grp"))

    def measure(label: String, skewJoin: Boolean)(mk: => DataFrame): Unit = {
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", skewJoin.toString)
      times.synchronized(times.clear())
      val df = mk
      val t0 = System.nanoTime()
      df.collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val ts = times.synchronized(times.toVector).sorted
      val skewMark = df.queryExecution.executedPlan.toString.contains("skew=true")
      println(f"$label%-22s wall=$wall%6.2fs tasks=${ts.size}%4d " +
        f"p50=${ts(ts.size / 2) / 1000.0}%6.2fs max=${ts.last / 1000.0}%6.2fs " +
        s"skewSplit=$skewMark")
    }

    def joined: DataFrame = fact.join(dim, Seq("k")).groupBy("grp")
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))

    measure("join_skewOff", skewJoin = false)(joined)
    measure("join_aqeSkewJoin", skewJoin = true)(joined)
    measure("join_salted16", skewJoin = false)(
      graft.ops.Salting.saltedJoin(fact, dim, "k", 16)
        .groupBy("grp").agg(sum(col("v")).as("s"), count(lit(1)).as("n")))
    // aggregation skew control: map-side partial aggregation collapses the
    // hot group before the shuffle — no splitting/salting needed
    measure("agg_hotkey_partial", skewJoin = true)(
      fact.groupBy("k").agg(sum(col("v")).as("s"), count(lit(1)).as("n")))
    spark.stop()
  }
}

package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Skew-evidence harness for the BUCKETED GRAPH family (r13 verdict
  * task 3): on a power-law graph, `bucketBy(32, src)` sends a hub's
  * entire edge list to one bucket, and every per-round probe of that
  * bucket rides one task. This main runs the bucketed loops
  * (q209 k-core, q210 PageRank, q213 components) over a soak dir —
  * pair it on a Zipf-degree dataset (`make_soak.py --zipf 1.2`) against
  * its uniform organic twin — and prints:
  *
  *   - the per-bucket edge-count profile of the bucketed table
  *     (max/mean — the static skew the layout commits to);
  *   - per query: wall seconds, then the top stages by max task time
  *     with p50/max task durations — a hub bucket shows up as one task
  *     holding the stage's max several× over its p50, round after
  *     round.
  *
  * Output is one JSON line per query (plus a `bucket_profile` line) so
  * SCALE.md rows can quote it directly.
  */
object GraphSkewSoak {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/soak")
    val only: Set[String] = if (args.length > 1) args(1).split(",").toSet
      else Set("q209_bucketed_kcore", "q210_bucketed_pagerank",
        "q213_bucketed_components")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // static layout skew: bucket id replicates bucketBy's partitioning
    // (pmod of the Murmur3 hash over numBuckets)
    val be = graft.ops.GraphOps.bucketedEdgeTable(spark, dir)
    val counts = be
      .groupBy(pmod(hash(col("src")), lit(graft.ops.GraphOps.edgeBuckets))
        .as("bucket"))
      .agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1)).sorted
    val mean = counts.sum.toDouble / counts.length
    println(s"""{"metric":"bucket_profile","buckets":${counts.length},""" +
      s""""rows":${counts.sum},"max":${counts.last},""" +
      f""""mean":$mean%.0f,"max_over_mean":${counts.last / mean}%.2f}""")

    val tasks = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        tasks.synchronized { tasks += ((t.stageId, t.taskInfo.duration)) }
    })

    def measure(name: String)(body: => org.apache.spark.sql.DataFrame): Unit = {
      tasks.synchronized(tasks.clear())
      val t0 = System.nanoTime()
      body.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      val byStage = tasks.synchronized(tasks.toVector).groupBy(_._1)
        .map { case (sid, ts) =>
          val ds = ts.map(_._2).sorted
          (sid, ds.size, ds(ds.size / 2), ds.last)
        }.toSeq.sortBy(-_._4).take(8)
      val stages = byStage.map { case (sid, n, p50, mx) =>
        s"""{"stage":$sid,"tasks":$n,"p50_ms":$p50,"max_ms":$mx}"""
      }.mkString("[", ",", "]")
      println(f"""{"metric":"$name","wall_sec":$wall%.2f,""" +
        s""""top_stages_by_max_task":$stages}""")
    }

    // mode "salted"/"plain" (2nd arg): run the three bucketed loops
    // directly over the salted vs plain layout — the supernode A/B
    // (SCALE.md round-14) — instead of the SparkEntry queries
    if (args.length > 1 && (args(1) == "salted" || args(1) == "plain")) {
      import graft.ops.GraphOps
      val fac = if (args.length > 2) args(2).toInt
        else GraphOps.SaltedEdgeFactor
      val t = if (args(1) == "salted") GraphOps.saltedEdgeTable(spark, dir, fac)
        else be
      measure(s"${args(1)}_kcore")(
        GraphOps.kcoreBucketedLoop(t, GraphOps.KCoreK, GraphOps.KCoreRounds))
      measure(s"${args(1)}_pagerank")(
        GraphOps.pageRankBucketedLoop(t, GraphOps.PrIters)._1)
      measure(s"${args(1)}_components")(
        GraphOps.componentsBucketedLoop(t, GraphOps.CcRounds))
    } else only.toSeq.sorted.foreach { name =>
      measure(name)(SparkEntry.queries(name)(spark, dir))
    }
    spark.stop()
  }
}

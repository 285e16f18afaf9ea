package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Plan-inspection tool: runs one named SparkEntry query against a
  * testdata dir and prints the final (post-AQE) physical plan with its
  * accumulated per-node SQL metrics — where the rows and the time
  * actually went. Usage:
  *   runMain graft.Explain <queryName> [sfDir]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // DSv2 storage-partitioned joins (KeyGroupedPartitioning zip) —
      // set at session build so q161 never mutates the shared session
      .config("spark.sql.sources.v2.bucketing.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // the write spawns its own QueryExecution — capture it, then read the
    // metrics the run actually accumulated
    @volatile var captured: org.apache.spark.sql.execution.QueryExecution = null
    spark.listenerManager.register(
      new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            durationNs: Long): Unit = captured = qe
        override def onFailure(funcName: String,
            qe: org.apache.spark.sql.execution.QueryExecution,
            exception: Exception): Unit = ()
      })

    val df = SparkEntry.queries(name)(spark, sfDir)
    // the deliverable format: the pre-execution formatted plan (scan
    // details, PushedFilters/ReadSchema, exchange placement)
    println(s"[explain] === explain(formatted) ===")
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    val t0 = System.nanoTime()
    df.write.format("noop").mode("overwrite").save()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[explain] $name ran in $sec%.3f s")
    val deadline = System.nanoTime() + 10e9.toLong
    while (captured == null && System.nanoTime() < deadline) Thread.sleep(50)

    val executed =
      if (captured != null) captured.executedPlan else df.queryExecution.executedPlan
    println(s"[explain] === final physical plan with non-zero metrics ===")
    def walk(p: org.apache.spark.sql.execution.SparkPlan, depth: Int): Unit = {
      val m = p.metrics.filter(_._2.value != 0)
        .map { case (k, v) => s"$k=${v.value}" }.toSeq.sorted.mkString(", ")
      println(s"[explain] ${"  " * depth}${p.nodeName}: $m")
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, depth + 1)
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan, depth + 1)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          println(s"[explain] ${"  " * (depth + 1)}(reuses ${r.child.nodeName})")
        case _ => p.children.foreach(walk(_, depth + 1))
      }
    }
    walk(executed, 0)
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the two edge-storage backends (r13 verdict task 5's
  * parse-cost row): the SAME connected-components loop (hash-min +
  * delta frontier) over
  *
  *   - parquet `bucketBy(32, src)` ([[graft.ops.GraphOps.bucketedEdgeTable]]),
  *   - the engine's own GraftCatalog/ClusteredSink filePerKey table
  *     ([[graft.ops.GraphOps.graftEdgeTable]], JSON-lines payload).
  *
  * Both plans are zero-exchange on the edge side (GraftEdgeGraphSpec);
  * what differs is the ROW FORMAT's scan cost, re-paid every round the
  * loop streams the table. Prints one JSON line per backend with the
  * ETL write time and the loop time separated, so the row-format gap is
  * read off the loop column (the production question: you pay the
  * write once, you pay the parse every traversal).
  */
object EdgeBackendAb {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/soak")
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
    import graft.ops.GraphOps

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    for (backend <- Seq("parquet_bucketby", "graft_json", "graft_parquet")) {
      val (be, etl) = timed {
        backend match {
          case "parquet_bucketby" => GraphOps.bucketedEdgeTable(spark, dir)
          case "graft_json" => GraphOps.graftEdgeTable(spark, dir, "json")
          case _ => GraphOps.graftEdgeTable(spark, dir, "parquet")
        }
      }
      val rows = be.count()
      val (n, loop) = timed {
        GraphOps.componentsBucketedLoop(be, GraphOps.CcRounds)
          .write.format("noop").mode("overwrite").save()
      }
      val _ = n
      println(f"""{"metric":"$backend","etl_sec":$etl%.2f,""" +
        f""""loop_sec":$loop%.2f,"edge_rows":$rows}""")
    }
    spark.stop()
  }
}

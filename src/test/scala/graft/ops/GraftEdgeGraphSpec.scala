package graft.ops

import java.nio.file.Paths

import graft.SparkSpec
import graft.sources.v2.ClusteredSinkOverwrite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** r13 verdict task 5 — ONE storage story: the bucketed-graph family's
  * zero-edge-exchange claims, re-proven over the engine's OWN table
  * format (GraftCatalog + ClusteredSink filePerKey) instead of native
  * parquet bucketBy. The scan reports KeyGroupedPartitioning over
  * identity(bucket); with one-side-shuffle SPJ every per-round frontier
  * join shuffles only the node-sized probe frame to the key-group
  * layout and streams the edge scan in place, and the (bucket, src)
  * degree aggregates run with zero exchanges — the exact q209/q210/q213
  * plan shape. Row-equality against the parquet-backed loops closes the
  * equivalence.
  */
class GraftEdgeGraphSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def walk(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other.children.flatMap(walk)
    })

  private def isGraftEdgeScan(p: SparkPlan): Boolean = p match {
    case b: BatchScanExec => b.scan.description().contains("graft-sink") &&
      b.scan.description().contains("edges_")
    case _ => false
  }

  private def edgeSideInPlace(top: DataFrame): Unit = {
    val nodes = walk(top.queryExecution.executedPlan)
    val scans = nodes.filter(isGraftEdgeScan)
    assert(scans.nonEmpty, "expected a graft-sink edge scan")
    def edgeShaped(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => false
      case s if isGraftEdgeScan(s) => true
      case a: AdaptiveSparkPlanExec => edgeShaped(a.executedPlan)
      case q: QueryStageExec => edgeShaped(q.plan)
      case other => other.children.exists(edgeShaped)
    }
    // no exchange may sit between the edge scan and the first
    // aggregate boundary above it
    def check(p: SparkPlan, sawExchange: Boolean): Unit = p match {
      case s if isGraftEdgeScan(s) =>
        assert(!sawExchange, "the graft edge scan crossed an exchange")
      case a: AdaptiveSparkPlanExec => check(a.executedPlan, sawExchange)
      case q: QueryStageExec => check(q.plan, sawExchange)
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => ()
      case e: ShuffleExchangeExec => e.children.foreach(check(_, true))
      case other => other.children.foreach(check(_, sawExchange))
    }
    check(top.queryExecution.executedPlan, sawExchange = false)
  }

  private lazy val be: DataFrame = {
    val b = GraphOps.graftEdgeTable(spark, sf)
    // pin the claims to the storage path: a tiny-sf broadcast would
    // vacuously keep the edge side in place
    b.sparkSession.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    b
  }

  test("filePerKey layout: every manifest file is single-bucket") {
    be.count()
    val wh = be.sparkSession.conf
      .get("spark.sql.catalog.graft_cat_edges.warehouse")
    // dataset tables are edges_<hexfp>…; the GENERIC bucketEdges tables
    // (edges_g<hexfp>_b…) share the warehouse since the r15 backend flip
    val tables = new java.io.File(wh, "g").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("edges_") &&
        !f.getName.startsWith("edges_g"))
    assert(tables.length === 1, s"expected one dataset edge table, got " +
      tables.map(_.getName).mkString(", "))
    val entries = ClusteredSinkOverwrite.readManifest(
      Paths.get(wh, "g", tables.head.getName, "_manifest.jsonl"))
    assert(entries.nonEmpty)
    entries.foreach { e =>
      assert(e.minCluster != null && e.minCluster == e.maxCluster,
        s"file ${e.file} spans buckets [${e.minCluster},${e.maxCluster}]")
    }
    assert(entries.map(_.minCluster.longValue).distinct.size === GraphOps.Q201Buckets)
  }

  test("degree aggregate over the graft table runs with ZERO exchanges") {
    val deg = GraphOps.kcoreDegrees(be)
    assert(deg.count() > 0)
    val nodes = walk(deg.queryExecution.executedPlan)
    assert(nodes.exists(isGraftEdgeScan))
    assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "groupBy(bucket, src) must be satisfied by KeyGroupedPartitioning")
  }

  test("components round: edge scan in place, probe side shuffles to key groups") {
    val state = componentsInit()
    val round = GraphOps.componentsRound(be, state)
    assert(round.count() > 0)
    edgeSideInPlace(round)
  }

  test("kcore round: edge scan in place") {
    val state = GraphOps.kcoreDegrees(be).localCheckpoint(true)
    val removed = state.filter(col("deg") < GraphOps.KCoreK).select("v")
      .localCheckpoint(true)
    val next = GraphOps.kcoreRound(be, state, removed)
    assert(next.count() > 0)
    edgeSideInPlace(next)
  }

  test("pagerank round: edge scan in place") {
    val deg = GraphOps.kcoreDegrees(be)
      .select(col("v").as("src"), col("deg").as("outdeg"))
      .localCheckpoint(true)
    val state = deg.select(col("src"), lit(1000000L).as("rank"), col("outdeg"))
      .localCheckpoint(true)
    val round = GraphOps.pageRankRound(be, state)
    assert(round.count() > 0)
    edgeSideInPlace(round)
  }

  private def componentsInit(): DataFrame =
    be.select(col("bucket"), col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint(true)

  test("graft-backed loops match the parquet-backed q213/q209 results") {
    val cc = GraphOps.componentsBucketedLoop(be, GraphOps.CcRounds)
      .select(col("node").cast("long").as("node"),
        col("lbl").cast("long").as("component"))
    val ccRef = graft.SparkEntry.queries("q213_bucketed_components")(spark, sf)
    assert(cc.exceptAll(ccRef).count() === 0)
    assert(ccRef.exceptAll(cc).count() === 0)

    val kc = GraphOps.kcoreBucketedLoop(be, GraphOps.KCoreK,
        GraphOps.KCoreRounds)
      .select(col("v").cast("long").as("node"),
        col("deg").as("core_degree"))
    val kcRef = graft.SparkEntry.queries("q209_bucketed_kcore")(spark, sf)
    assert(kc.exceptAll(kcRef).count() === 0)
    assert(kcRef.exceptAll(kc).count() === 0)
  }
}

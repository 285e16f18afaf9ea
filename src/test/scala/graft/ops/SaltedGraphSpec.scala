package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** The SALTED bucket layout for supernode graphs (SCALE.md round-14
  * residual risk): src_salt = src·F + hash(dst)%F spreads a hub's edge
  * list over F buckets; probes replicate the node-sized frame per salt
  * and join on src_salt. Pins:
  *
  *   1. row-equality of all three bucketed loops (components, k-core,
  *      PageRank) over the salted layout vs the plain bucketed layout —
  *      every edge matches exactly one probe replica, so the
  *      trajectories are identical;
  *   2. the per-round probe joins still stream the salted edge scan in
  *      place (bucketed scan, no exchange between scan and join);
  *   3. the salt factor rides the frame's metadata (a probe needs
  *      nothing but the frame).
  */
class SaltedGraphSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def walk(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other.children.flatMap(walk)
    })

  private def isEdgeScan(p: SparkPlan): Boolean = p match {
    case s: FileSourceScanExec => s.relation.location.rootPaths
      .exists(_.toString.contains("graft_edges_"))
    case _ => false
  }

  test("salted loops are row-identical to the plain bucketed loops") {
    val plain = GraphOps.bucketedEdgeTable(spark, sf)
    val salted = GraphOps.saltedEdgeTable(spark, sf)
    assert(salted.count() === plain.count())

    val ccP = GraphOps.componentsBucketedLoop(plain, GraphOps.CcRounds)
    val ccS = GraphOps.componentsBucketedLoop(salted, GraphOps.CcRounds)
    assert(ccS.exceptAll(ccP).count() === 0)
    assert(ccP.exceptAll(ccS).count() === 0)

    val kcP = GraphOps.kcoreBucketedLoop(plain, GraphOps.KCoreK,
      GraphOps.KCoreRounds)
    val kcS = GraphOps.kcoreBucketedLoop(salted, GraphOps.KCoreK,
      GraphOps.KCoreRounds)
    assert(kcS.exceptAll(kcP).count() === 0)
    assert(kcP.exceptAll(kcS).count() === 0)

    val (prP, itP) = GraphOps.pageRankBucketedLoop(plain, GraphOps.PrIters)
    val (prS, itS) = GraphOps.pageRankBucketedLoop(salted, GraphOps.PrIters)
    assert(itP === itS)
    assert(prS.exceptAll(prP).count() === 0)
    assert(prP.exceptAll(prS).count() === 0)
  }

  test("per-round probe join streams the salted edge scan in place") {
    val salted = GraphOps.saltedEdgeTable(spark, sf)
    val frontier = salted.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl"))
      .localCheckpoint(true)
    val round = GraphOps.componentsRound(salted, frontier)
    assert(round.count() > 0)
    val nodes = walk(round.queryExecution.executedPlan)
    val scans = nodes.collect {
      case s: FileSourceScanExec if isEdgeScan(s) => s }
    assert(scans.nonEmpty && scans.forall(_.bucketedScan),
      "salted edge scan must execute bucketed")
    def check(p: SparkPlan, sawExchange: Boolean): Unit = p match {
      case s if isEdgeScan(s) =>
        assert(!sawExchange, "salted edge scan crossed an exchange")
      case a: AdaptiveSparkPlanExec => check(a.executedPlan, sawExchange)
      case q: QueryStageExec => check(q.plan, sawExchange)
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => ()
      case e: ShuffleExchangeExec => e.children.foreach(check(_, true))
      case other => other.children.foreach(check(_, sawExchange))
    }
    check(round.queryExecution.executedPlan, sawExchange = false)
  }

  test("the salt factor is recovered from frame metadata alone") {
    val salted = GraphOps.saltedEdgeTable(spark, sf)
    val md = salted.schema.fields.find(_.name == "src_salt").get.metadata
    assert(md.contains("saltFactor") &&
      md.getLong("saltFactor") === GraphOps.SaltedEdgeFactor.toLong)
    // and the layout really spreads each src over multiple sub-keys
    val spread = salted.groupBy("src")
      .agg(countDistinct(col("src_salt")).as("k"))
      .agg(max(col("k")).as("mx")).head.getLong(0)
    assert(spread > 1, "expected hub edges to spread over several salts")
  }
}

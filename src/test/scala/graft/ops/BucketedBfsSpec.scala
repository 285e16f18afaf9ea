package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** q201's storage-partitioning claim, mechanized: the per-round BFS
  * semi/anti joins against the BUCKETED edge table must never move the
  * edge stream — no shuffle exchange anywhere above the bucketed scan,
  * at any frontier size, with no broadcast involved (the shuffle_hash
  * hints pin the plan). This is the >64 MB graph path the conditioned
  * broadcast (q178/q190) cannot reach: there, past BcastNodeBytes the
  * keyed joins re-shuffle the full edge stream every round.
  */
class BucketedBfsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Fully expand an executed plan through AQE/query-stage wrappers. */
  private def walk(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other.children.flatMap(walk)
    })

  test("per-round join: zero exchanges above the bucketed edge scan, no broadcast") {
    val be = GraphOps.bucketedEdgeTable(spark, sf)
    val frontier = be.select(col("src").as("node"))
      .filter(col("node") % GraphOps.Q201SeedMod === 0 &&
        col("node") < GraphOps.SupplierOffset)
      .distinct().localCheckpoint(true)
    val round = GraphOps.q201Round(be, frontier, frontier)
    assert(round.collect().length > 0) // execute: assertions on the FINAL plan
    val nodes = walk(round.queryExecution.executedPlan)

    // the edge scan is there and reads bucketed
    val scans = nodes.collect {
      case s: FileSourceScanExec if s.relation.location.rootPaths
        .exists(_.toString.contains("graft_edges_")) => s
    }
    assert(scans.nonEmpty, "expected a scan of the bucketed edge table")
    scans.foreach { s =>
      assert(s.bucketedScan,
        "the edge scan must execute as a BUCKETED scan (bucket pruning " +
          "off, autoBucketedScan did not demote it)")
    }

    // The claim, precisely: the edge stream reaches its per-round join
    // WITHOUT crossing an exchange — the scan's bucket partitioning is
    // the join's distribution. (Exchanges ABOVE the join are the
    // expansion-sized dst-distinct / anti-join frames, which is fine —
    // they are frontier-shaped, not edge-shaped.)
    def isEdgeScan(p: SparkPlan): Boolean = p match {
      case s: FileSourceScanExec => s.relation.location.rootPaths
        .exists(_.toString.contains("graft_edges_"))
      case _ => false
    }
    // the IMMEDIATE join over the scan (the downstream anti join also
    // has the scan transitively below it, past the legitimately
    // shuffled dst-distinct — only the first join carries the claim)
    val edgeJoins = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
        if walk(j.left).exists(isEdgeScan) &&
          !walk(j.left).exists(p => p.ne(j) &&
            p.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec]) => j
    }
    assert(edgeJoins.nonEmpty,
      "expected the per-round semi join to stream the bucketed edge scan")
    edgeJoins.foreach { j =>
      assert(!walk(j.left).exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"edge side of the round join crossed an exchange:\n$j")
    }

    // and the property is not broadcast-smuggled: the per-round joins
    // are hash joins built on the frontier side, never broadcast
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastHashJoinExec]),
      "per-round joins must be broadcast-free (the storage partitioning, " +
        "not a broadcast, is what keeps the edge side in place)")
  }

  test("q201 levels match a q190-shaped composed-plan reference on the same seed") {
    // independent cross-check inside Spark (the DuckDB oracle is the
    // external gate): same BFS computed the q190 way — plain frames,
    // no bucketed storage — must agree row-for-row
    val pairs = Tables.orders(spark, sf)
      .join(Tables.lineitem(spark, sf), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"), (col("l_suppkey") + GraphOps.SupplierOffset).as("supp"))
      .distinct()
    val edges = pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionAll(pairs.select(col("supp").as("src"), col("cust").as("dst")))
    var frontier = pairs.select(col("cust").as("node")).distinct()
      .filter(col("node") % GraphOps.Q201SeedMod === 0)
    var visited = frontier
    var ref = frontier.select(col("node"), lit(0L).as("lvl"))
    for (i <- 1 to GraphOps.BfsMaxHops) {
      val next = edges.join(frontier.select(col("node").as("src")),
          Seq("src"), "left_semi")
        .select(col("dst").as("node")).distinct()
        .join(visited, Seq("node"), "left_anti")
        .localCheckpoint(true)
      ref = ref.unionAll(next.select(col("node"), lit(i.toLong).as("lvl")))
      visited = visited.unionAll(next).localCheckpoint(true)
      frontier = next
    }
    val got = graft.SparkEntry.queries("q201_bucketed_bfs")(spark, sf)
    assert(got.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(got).count() === 0)
  }
}

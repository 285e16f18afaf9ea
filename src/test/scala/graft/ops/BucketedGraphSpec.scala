package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BaseJoinExec, BroadcastHashJoinExec}

/** q209/q210's storage-partitioning claims, mechanized (the round-12
  * verdict's task 1 — extending the q201 bucketed-edge pattern to k-core
  * and PageRank): every per-round probe of the bucketed edge table must
  * leave the edge stream in place — no exchange between the bucketed
  * scan and its consuming join/aggregate, no broadcast anywhere — so the
  * loops stay shuffle-bounded by NODE-sized frames at any survivor/rank
  * frame size. Plus row-equality of each bucketed variant against its
  * composed-plan twin (q178 / q147), which share seeds and constants.
  */
class BucketedGraphSpec extends SparkSpec {
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

  /** The edge scan executes bucketed and reaches node `top` without
    * crossing a shuffle exchange. */
  private def assertEdgeSideInPlace(nodes: Seq[SparkPlan]): Unit = {
    val scans = nodes.collect {
      case s: FileSourceScanExec if isEdgeScan(s) => s
    }
    assert(scans.nonEmpty, "expected a scan of the bucketed edge table")
    scans.foreach(s => assert(s.bucketedScan,
      "the edge scan must execute as a BUCKETED scan"))
    // the EDGE stream must never be consumed through a broadcast join.
    // An aggregate is a size boundary: past it the stream is node-sized
    // (e.g. k-core's decrement counts), and whether THAT frame
    // broadcasts downstream is AQE's runtime call, outside the claim.
    def edgeShaped(p: SparkPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => false
      case s if isEdgeScan(s) => true
      case a: AdaptiveSparkPlanExec => edgeShaped(a.executedPlan)
      case q: QueryStageExec => edgeShaped(q.plan)
      case other => other.children.exists(edgeShaped)
    }
    assert(!nodes.exists {
      case j: BroadcastHashJoinExec => edgeShaped(j.left) || edgeShaped(j.right)
      case _ => false
    }, "joins consuming the bucketed edge scan (below any aggregate " +
      "boundary) must be broadcast-free — storage partitioning, not a " +
      "broadcast, keeps the edge side in place")
  }

  test("q209 k-core: initial degree aggregate runs with ZERO exchanges") {
    val be = GraphOps.bucketedEdgeTable(spark, sf)
    val deg = GraphOps.kcoreDegrees(be)
    assert(deg.collect().length > 0)
    val nodes = walk(deg.queryExecution.executedPlan)
    assertEdgeSideInPlace(nodes)
    assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "groupBy(src) over the bucketed scan must be satisfied by the " +
        "storage partitioning — no exchange anywhere in the degree plan")
  }

  test("q209 k-core: per-round decrement never moves the edge stream") {
    val be = GraphOps.bucketedEdgeTable(spark, sf)
    val state = GraphOps.kcoreDegrees(be).localCheckpoint(true)
    val removed = state.filter(col("deg") < GraphOps.KCoreK).select("v")
      .localCheckpoint(true)
    val next = GraphOps.kcoreRound(be, state, removed)
    assert(next.collect().length > 0)
    val nodes = walk(next.queryExecution.executedPlan)
    assertEdgeSideInPlace(nodes)
    // the semi join immediately above the scan streams it exchange-free
    val edgeJoins = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
        if walk(j.left).exists(isEdgeScan) &&
          !walk(j.left).exists(p => p.ne(j) && p.isInstanceOf[BaseJoinExec]) => j
    }
    assert(edgeJoins.nonEmpty,
      "expected the decrement semi join to stream the bucketed edge scan")
    edgeJoins.foreach { j =>
      assert(!walk(j.left).exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"edge side of the decrement join crossed an exchange:\n$j")
    }
  }

  test("q210 pagerank: per-round contribution join leaves edges in place") {
    val be = GraphOps.bucketedEdgeTable(spark, sf)
    val deg = be.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .localCheckpoint(true)
    val nn = deg.agg(count(lit(1)).as("n"))
    val state = deg.crossJoin(broadcast(nn))
      .select(col("src"), expr("1000000000000 div n").as("rank"), col("outdeg"))
      .localCheckpoint(true)
    val round = GraphOps.pageRankRound(be, state)
    assert(round.collect().length > 0)
    val nodes = walk(round.queryExecution.executedPlan)
    assertEdgeSideInPlace(nodes)
    val edgeJoins = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
        if walk(j.left).exists(isEdgeScan) ||
           walk(j.right).exists(isEdgeScan) => j
    }
    assert(edgeJoins.nonEmpty,
      "expected the contribution join to stream the bucketed edge scan")
    edgeJoins.foreach { j =>
      val edgeSide = if (walk(j.left).exists(isEdgeScan)) j.left else j.right
      assert(!walk(edgeSide).exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"edge side of the contribution join crossed an exchange:\n$j")
    }
  }

  test("q213 components: per-round propagation leaves edges in place") {
    val be = GraphOps.bucketedEdgeTable(spark, sf)
    val state = be.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")).localCheckpoint(true)
    val next = GraphOps.componentsRound(be, state)
    assert(next.collect().length > 0)
    val nodes = walk(next.queryExecution.executedPlan)
    assertEdgeSideInPlace(nodes)
    val edgeJoins = nodes.collect {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
        if walk(j.left).exists(isEdgeScan) &&
          !walk(j.left).exists(p => p.ne(j) && p.isInstanceOf[BaseJoinExec]) => j
    }
    assert(edgeJoins.nonEmpty,
      "expected the propagation join to stream the bucketed edge scan")
    edgeJoins.foreach { j =>
      assert(!walk(j.left).exists(_.isInstanceOf[ShuffleExchangeExec]),
        s"edge side of the propagation join crossed an exchange:\n$j")
    }
  }

  test("q213 matches the composed connectedComponents on the same graph") {
    val pairs = graft.ops.Tables.orders(spark, sf)
      .join(graft.ops.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("a"),
        (col("l_suppkey") + GraphOps.SupplierOffset).as("b"))
      .distinct()
    val ref = GraphOps.connectedComponents(pairs)
      .select(col("id").cast("long").as("node"),
        col("component").cast("long").as("component"))
    val got = graft.SparkEntry.queries("q213_bucketed_components")(spark, sf)
    assert(got.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(got).count() === 0)
  }

  test("q209 matches q178 row-for-row (same graph, k, round cap)") {
    val got = graft.SparkEntry.queries("q209_bucketed_kcore")(spark, sf)
    val ref = graft.SparkEntry.queries("q178_kcore")(spark, sf)
    assert(got.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(got).count() === 0)
  }

  test("q210 matches q147 row-for-row (same graph, grid, iteration cap)") {
    val got = graft.SparkEntry.queries("q210_bucketed_pagerank")(spark, sf)
    val ref = graft.SparkEntry.queries("q147_pagerank")(spark, sf)
    assert(got.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(got).count() === 0)
  }

  // ---- r13 verdict task 2: the PUBLIC helpers route to bucketed
  // storage above the threshold. bucketBytes = 0 forces the bucketed
  // path on the tiny sf so each helper's two physical shapes can be
  // compared row-for-row; Long.MaxValue pins the broadcast path.

  private def tradeEdges = {
    val pairs = graft.ops.Tables.orders(spark, sf)
      .join(graft.ops.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + GraphOps.SupplierOffset).as("supp"))
      .distinct()
    pairs.select(col("cust").as("src"), col("supp").as("dst"))
      .unionAll(pairs.select(col("supp").as("src"), col("cust").as("dst")))
  }

  test("pageRank helper: bucketed dispatch is trajectory-identical") {
    val (bc, itB) = GraphOps.pageRank(tradeEdges, GraphOps.PrIters,
      bucketBytes = Long.MaxValue)
    val (bk, itK) = GraphOps.pageRank(tradeEdges, GraphOps.PrIters,
      bucketBytes = 0L)
    assert(itB === itK, "the two paths must run the same round count")
    assert(bk.exceptAll(bc).count() === 0)
    assert(bc.exceptAll(bk).count() === 0)
  }

  test("kCore helper: bucketed dispatch is trajectory-identical") {
    val bc = GraphOps.kCore(tradeEdges, GraphOps.KCoreK,
      GraphOps.KCoreRounds, bucketBytes = Long.MaxValue)
    val bk = GraphOps.kCore(tradeEdges, GraphOps.KCoreK,
      GraphOps.KCoreRounds, bucketBytes = 0L)
    assert(bk.exceptAll(bc).count() === 0)
    assert(bc.exceptAll(bk).count() === 0)
    // and the bucketed path matches the q178 oracle-gated query
    val ref = graft.SparkEntry.queries("q178_kcore")(spark, sf)
      .select(col("node").cast("long"), col("core_degree"))
    val got = bk.select(col("node").cast("long"), col("core_degree"))
    assert(got.exceptAll(ref).count() === 0)
    assert(ref.exceptAll(got).count() === 0)
  }

  test("bfs helper: bucketed dispatch is trajectory-identical") {
    val seeds = tradeEdges.select(col("src").as("node"))
      .filter(col("node") % GraphOps.BfsSeedMod === 0 &&
        col("node") < GraphOps.SupplierOffset)
      .distinct()
    val bc = GraphOps.bfs(tradeEdges, seeds, GraphOps.BfsMaxHops,
      bucketBytes = Long.MaxValue)
    val bk = GraphOps.bfs(tradeEdges, seeds, GraphOps.BfsMaxHops,
      bucketBytes = 0L)
    assert(bk.exceptAll(bc).count() === 0)
    assert(bc.exceptAll(bk).count() === 0)
  }

  test("connectedComponents helper: bucketed dispatch is identical") {
    val pairs = tradeEdges.select(col("src").as("a"), col("dst").as("b"))
    val bc = GraphOps.connectedComponents(pairs,
      bucketBytes = Long.MaxValue)
    val bk = GraphOps.connectedComponents(pairs, bucketBytes = 0L)
    assert(bk.exceptAll(bc).count() === 0)
    assert(bc.exceptAll(bk).count() === 0)
  }

  test("helpers: forced SALTED dispatch (bucketBytes = -1) is identical too") {
    // the supernode path of the public API (chooseEdgeStorage):
    // salted layout + probe replication must be invisible in results
    val (bc, itB) = GraphOps.pageRank(tradeEdges, GraphOps.PrIters,
      bucketBytes = Long.MaxValue)
    val (sl, itS) = GraphOps.pageRank(tradeEdges, GraphOps.PrIters,
      bucketBytes = -1L)
    assert(itB === itS)
    assert(sl.exceptAll(bc).count() === 0)
    assert(bc.exceptAll(sl).count() === 0)

    val kB = GraphOps.kCore(tradeEdges, GraphOps.KCoreK,
      GraphOps.KCoreRounds, bucketBytes = Long.MaxValue)
    val kS = GraphOps.kCore(tradeEdges, GraphOps.KCoreK,
      GraphOps.KCoreRounds, bucketBytes = -1L)
    assert(kS.exceptAll(kB).count() === 0)
    assert(kB.exceptAll(kS).count() === 0)

    val seeds = tradeEdges.select(col("src").as("node"))
      .filter(col("node") % GraphOps.BfsSeedMod === 0 &&
        col("node") < GraphOps.SupplierOffset).distinct()
    val bB = GraphOps.bfs(tradeEdges, seeds, GraphOps.BfsMaxHops,
      bucketBytes = Long.MaxValue)
    val bS = GraphOps.bfs(tradeEdges, seeds, GraphOps.BfsMaxHops,
      bucketBytes = -1L)
    assert(bS.exceptAll(bB).count() === 0)
    assert(bB.exceptAll(bS).count() === 0)

    val pairs = tradeEdges.select(col("src").as("a"), col("dst").as("b"))
    val cB = GraphOps.connectedComponents(pairs, bucketBytes = Long.MaxValue)
    val cS = GraphOps.connectedComponents(pairs, bucketBytes = -1L)
    assert(cS.exceptAll(cB).count() === 0)
    assert(cB.exceptAll(cS).count() === 0)
  }

  test("bucketEdges: DEFAULT backend is the engine's own graft table; " +
      "key-grouped degree aggregate is exchange-free; write-once per plan") {
    // r15 verdict task 1: the generic helper dogfoods GraftCatalog +
    // ClusteredSink parquet (filePerKey) — the scan is a DSv2 BatchScan
    // reporting KeyGroupedPartitioning(identity(bucket))
    val be = GraphOps.bucketEdges(tradeEdges)
    assert(be.columns.contains("bucket"),
      "graft-backed edge frame must carry the bucket column")
    val deg = GraphOps.kcoreDegrees(be)
    assert(deg.count() > 0)
    val nodes = walk(deg.queryExecution.executedPlan)
    val scans = nodes.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
        if b.scan.description().contains("graft-sink") => b }
    assert(scans.nonEmpty, "expected a graft-sink DSv2 scan")
    assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "groupBy(bucket, src) over the graft edge table must be exchange-free")
    // content-addressed skip (r13 verdict task 1): a second call with
    // the SAME logical edges must not rewrite — file mtimes unchanged
    val wh = GraphOps.graftEdgeSession(spark).conf
      .get("spark.sql.catalog.graft_cat_edges.warehouse")
    val dirs = new java.io.File(wh, "g").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("edges_g"))
    assert(dirs.nonEmpty)
    def sig(): Seq[(String, Long)] = dirs.flatMap(d =>
      new java.io.File(d, "data").listFiles().toSeq
        .map(f => (d.getName + "/" + f.getName, f.lastModified)))
      .toSeq.sortBy(_._1)
    val before = sig()
    val be2 = GraphOps.bucketEdges(tradeEdges)
    assert(be2.count() === be.count())
    assert(sig() === before,
      "second bucketEdges call for the same plan must skip the write")
  }

  test("bucketEdgesNative (A/B twin): table scans bucketed, groupBy(src) " +
      "exchange-free, row-identical to the graft-backed default") {
    val be = GraphOps.bucketEdgesNative(tradeEdges)
    val deg = be.groupBy("src").agg(count(lit(1)).as("deg"))
    assert(deg.count() > 0)
    val nodes = walk(deg.queryExecution.executedPlan)
    val scans = nodes.collect {
      case s: FileSourceScanExec if isEdgeScan(s) => s }
    assert(scans.nonEmpty && scans.forall(_.bucketedScan),
      "native bucketEdges table must execute as a bucketed scan")
    assert(!nodes.exists(_.isInstanceOf[ShuffleExchangeExec]),
      "groupBy(src) over the native bucketed table must be exchange-free")
    val graft = GraphOps.bucketEdges(tradeEdges).select("src", "dst")
    assert(be.select("src", "dst").exceptAll(graft).count() === 0)
    assert(graft.exceptAll(be.select("src", "dst")).count() === 0)
  }

  test("bucketedEdgeTable: write-once per (dataset, JVM)") {
    val be = GraphOps.bucketedEdgeTable(spark, sf)
    val nodes = walk(be.queryExecution.executedPlan)
    val dir = new java.io.File(nodes.collect {
      case s: FileSourceScanExec if isEdgeScan(s) => s
    }.head.relation.location.rootPaths.head.toUri.getPath)
    def sig(): Seq[(String, Long)] = dir.listFiles().toSeq
      .map(f => (f.getName, f.lastModified)).sortBy(_._1)
    val before = sig()
    GraphOps.bucketedEdgeTable(spark, sf).count()
    assert(sig() === before,
      "second bucketedEdgeTable call for the same dataset must skip")
  }
}

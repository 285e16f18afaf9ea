package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** Structural semantics for integer-grid PageRank (q147): symmetry,
  * centrality ordering, and exact integer determinism across runs.
  */
class PageRankSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("pagerank_fixtures").toString
    // star: customer 1 trades with suppliers 11/12/13; customers 2 and 3
    // each trade with supplier 11 only → cust 1 and supp 11 are hubs
    Seq((101L, 1L), (102L, 1L), (103L, 1L), (104L, 2L), (105L, 3L))
      .map { case (ok, ck) => (ok, ck, "O", 1.0,
        Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((101L, 11L), (102L, 12L), (103L, 13L), (104L, 11L), (105L, 11L))
      .map { case (ok, sk) => (ok, 1, sk) }
      .toDF("l_orderkey", "l_linenumber", "l_suppkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("q147: hubs outrank leaves; symmetric leaves tie exactly") {
    val rows = graft.SparkEntry.queries("q147_pagerank")(spark, dir)
      .collect().map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank"))
    val rank = rows.toMap
    // 6 nodes: cust 1,2,3 and supp 11,12,13 (shifted by 3,000,000)
    assert(rank.size == 6)
    val (c1, c2, c3) = (rank(1L), rank(2L), rank(3L))
    val (s11, s12, s13) = (rank(3000011L), rank(3000012L), rank(3000013L))
    assert(s11 > c2 && s11 > c3 && s11 > s12, "supp 11 is the top hub")
    assert(c1 > s12 && c1 > c2, "cust 1 is the second hub")
    assert(c2 == c3 && s12 == s13, "symmetric leaves tie exactly")
    // integer grid: total mass stays within teleport+truncation slack
    assert(rows.map(_._2).sum <= 1000000000000L)
    assert(rows.map(_._2).min > 0)
  }

  test("q147: bit-identical across runs (exact integer lineage)") {
    val a = graft.SparkEntry.queries("q147_pagerank")(spark, dir).collect()
    val b = graft.SparkEntry.queries("q147_pagerank")(spark, dir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("converged-or-capped: early stop fires on a regular graph and " +
    "matches the fixed-round fixpoint") {
    import spark.implicits._
    // symmetrized 10-cycle: 2-regular, so the uniform vector is an EXACT
    // integer fixpoint after one round (1e11 is divisible by outdeg 2 and
    // 85*1e11 by 100) — rounds 2..4 of the fixed-K oracle are no-ops
    val n = 10L
    val fwd = (0L until n).map(i => (i, (i + 1) % n))
    val edges = (fwd ++ fwd.map(_.swap)).toDF("src", "dst")
    val (r1, rounds1) = GraphOps.pageRank(edges, maxIters = 4)
    assert(rounds1 < 4, "fixpoint must stop the loop before the cap")
    val got = r1.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 10)
    // uniform fixpoint: teleport 1.5e10 + damped 8.5e10 = 1e11 for all
    assert(got.values.forall(_ == 100000000000L))
    // capped run at exactly 1 round produces the same vector (fixpoint)
    val (r2, _) = GraphOps.pageRank(edges, maxIters = 1)
    val gotCapped = r2.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotCapped == got)
  }
}

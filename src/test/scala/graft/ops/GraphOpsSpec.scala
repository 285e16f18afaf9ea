package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connected components labels a chain, a triangle, and an isolate edge") {
    // chain 1-2-3-4-5, triangle 10-11-12 (+ redundant edge), pair 20-21
    val edges = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L) // reversed direction — symmetrization must handle it
    ).toDF("a", "b")
    val comp = GraphOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comp == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L), s"got $comp")
  }

  test("maxIter bounds the rounds on a path longer than the budget") {
    // path 0-1-2-...-9: diameter 9; with maxIter=2 labels are NOT fully
    // converged (node 9 cannot have learned 0 yet) — the cap is a
    // backstop, not silent correctness
    val edges = (0L until 9L).map(i => (i, i + 1)).toDF("a", "b")
    val capped = GraphOps.connectedComponents(edges, maxIter = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped(9L) != 0L)
    val full = GraphOps.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(full.values.toSet == Set(0L))
  }
}

package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components — the dedup-pipeline step that turns
  * near-duplicate PAIRS into duplicate CLUSTERS with a canonical
  * representative (min doc_id) per cluster, so "keep one per cluster"
  * becomes a single filter.
  *
  * Algorithm: hash-min label propagation. Every node starts as its own
  * component; each round, every node adopts the minimum label among
  * itself and its neighbors; converged when no label changes. Rounds ≈
  * the graph diameter (log-ish for near-dup clusters, which are small by
  * construction once exact dedup ran first). Each round is one shuffle
  * of (node, label) pairs — edges never rehash, labels do. The driver
  * only checks the per-round convergence COUNT (a scalar), it never
  * collects the graph: this is the standard iterative-algorithm control
  * loop, not a driver-side computation.
  */
object GraphOps extends QueryModule {
  import Tables.documents

  /** Components of an undirected edge list (columns `a`, `b`).
    * Returns (id, component) for every node appearing in an edge, where
    * component = min node id reachable. maxIter bounds runaway graphs
    * (diameter > maxIter leaves labels one round from convergence —
    * callers on unbounded graphs should raise it).
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    // symmetrize once; labels propagate along both directions
    val sym = edges.select(col("a"), col("b"))
      .unionAll(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
    var comp = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("component"))
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      val neighborMin = sym
        .join(comp, sym("a") === comp("id"))
        .groupBy(col("b").as("nid"))
        .agg(min(col("component")).as("nmin"))
      val next = comp.join(neighborMin, comp("id") === col("nid"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nmin"), col("component")))
            .as("component"),
          // carry the changed flag out of the same pass instead of
          // re-joining old vs new for the convergence check
          (coalesce(col("nmin"), col("component")) < col("component"))
            .as("__chg"))
      // one action per round: the convergence count (a scalar). localCheckpoint
      // truncates the lineage so the plan doesn't deepen each round.
      val materialized = next.localCheckpoint(true)
      changed = materialized.filter(col("__chg")).count()
      comp = materialized.select("id", "component")
      iter += 1
    }
    comp
  }

  // Gate query: duplicate-cluster canonicalization over a DETERMINISTIC
  // seeded edge list (chains of (i, i+1) per 5th doc and (i, i+2) per
  // 11th doc — components stay small, as they do in real corpora once
  // exact dedup runs first; the data-driven LSH pair set q53 produces is
  // oracle-intractable for transitive closure at soak scale). The oracle
  // computes the same components via a recursive CTE.
  register("q90_dup_clusters",
    """WITH RECURSIVE
      |e1 AS (SELECT d.doc_id AS a, d.doc_id + 1 AS b FROM documents d
      |       JOIN documents x ON x.doc_id = d.doc_id + 1
      |       WHERE d.doc_id % 5 = 0),
      |e2 AS (SELECT d.doc_id AS a, d.doc_id + 2 AS b FROM documents d
      |       JOIN documents x ON x.doc_id = d.doc_id + 2
      |       WHERE d.doc_id % 11 = 0),
      |edges AS (
      |  SELECT a, b FROM e1 UNION SELECT a, b FROM e2
      |  UNION SELECT b, a FROM e1 UNION SELECT b, a FROM e2),
      |reach(id, r) AS (
      |  SELECT a, a FROM edges
      |  UNION
      |  SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a)
      |SELECT id AS doc_id, MIN(r) AS component,
      |  CAST(MIN(r) = id AS INTEGER) AS is_representative
      |FROM reach GROUP BY id""".stripMargin) { (s, d) =>
    val ids = documents(s, d).select(col("doc_id"))
    def chain(step: Int, mod: Int): DataFrame = ids
      .filter(col("doc_id") % mod === 0)
      .select(col("doc_id").as("a"), (col("doc_id") + step).as("b"))
      .join(ids.select(col("doc_id").as("b")), Seq("b"))
    val edges = chain(1, 5).select("a", "b")
      .unionAll(chain(2, 11).select("a", "b"))
    connectedComponents(edges)
      .select(col("id").as("doc_id"), col("component"),
        (col("component") === col("id")).cast("int").as("is_representative"))
  }
}

package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.Row

/** Regressions for the round-14 ADVICE findings (GraphOps family).
  *
  *   1. chooseEdgeStorage NPE'd on an empty edge frame (max/sum
  *      aggregate to NULL, getLong threw) — the public helpers must
  *      return empty results on empty input.
  *   2. the salted layout computes src_salt with integer arithmetic;
  *      a non-numeric src yielded null salts and SILENTLY wrong
  *      results — now a loud require on the forced path and a
  *      bucketed fallback in the auto dispatch.
  *   3. bucketEdges/saltEdges keyed their write-once cache on the
  *      32-bit plan semanticHash alone — data regenerated in place
  *      under an identical plan served stale edges; the key now mixes
  *      the scanned files' sizes/mtimes ([[GraphOps.edgeFrameFingerprint]]).
  *
  * Plus the r15 adaptive salt factor (verdict task 2): F sized from
  * the measured skew instead of the fixed SaltedEdgeFactor.
  */
class R14AdviceSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------- 1: empty input
  test("connectedComponents/pageRank return empty on empty edges " +
      "(stats-pass path)") {
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    // bucketBytes=1 forces the stats pass (any non-sentinel threshold)
    assert(GraphOps.connectedComponents(empty, bucketBytes = 1L).count() === 0)
    val emptySd = empty.select(col("a").as("src"), col("b").as("dst"))
    val (ranks, _) = GraphOps.pageRank(emptySd, maxIters = 3, bucketBytes = 1L)
    assert(ranks.count() === 0)
  }

  // ------------------------------- 2: non-integral src never salted
  test("saltEdges refuses a string src loudly") {
    val stringEdges = Seq(("a", "b"), ("a", "c")).toDF("src", "dst")
    val e = intercept[IllegalArgumentException] {
      GraphOps.saltEdges(stringEdges)
    }
    assert(e.getMessage.contains("integral src"))
  }

  test("edgeLayoutFor: auto dispatch falls back to bucketed for " +
      "non-integral src even past the supernode threshold") {
    // skew well past maxdeg·cores > 4·m
    val salted = GraphOps.edgeLayoutFor(n = 100000L, mx = Some(50000L),
      m = 100000L, cores = 32L, bucketBytes = 1L, integralSrc = true)
    assert(salted.isInstanceOf[GraphOps.SaltedLayout])
    val fallback = GraphOps.edgeLayoutFor(n = 100000L, mx = Some(50000L),
      m = 100000L, cores = 32L, bucketBytes = 1L, integralSrc = false)
    assert(fallback === GraphOps.BucketedLayout)
  }

  test("edgeLayoutFor decision table: empty, sentinels, threshold") {
    import GraphOps._
    // empty input (mx aggregated to NULL) routes to broadcast
    assert(edgeLayoutFor(0L, None, 0L, 32L, 1L, integralSrc = true) ===
      BroadcastLayout)
    // sentinels pin their paths without a stats pass
    assert(edgeLayoutFor(0L, None, 0L, 32L, Long.MaxValue, true) ===
      BroadcastLayout)
    assert(edgeLayoutFor(0L, None, 0L, 32L, 0L, true) === BucketedLayout)
    assert(edgeLayoutFor(0L, None, 0L, 32L, -1L, true) ===
      SaltedLayout(SaltedEdgeFactor))
    // small graph broadcasts; big uniform graph buckets
    assert(edgeLayoutFor(10L, Some(3L), 30L, 32L, 1000000L, true) ===
      BroadcastLayout)
    assert(edgeLayoutFor(1000000L, Some(5L), 5000000L, 32L, 1L, true) ===
      BucketedLayout)
  }

  // --------------------------- r15 verdict task 2: adaptive factor
  test("adaptiveSaltFactor sizes F to the measured skew") {
    import GraphOps._
    // Zipf-1.5 soak shape: maxdeg·cores/m ≈ 7.4 → the measured-parity F=4
    assert(adaptiveSaltFactor(mx = 74L, m = 320L, cores = 32L) === 4)
    // Zipf-1.2 shape (hub = 11% of edges): barely past threshold → F=2
    assert(adaptiveSaltFactor(mx = 35L, m = 320L, cores = 32L) === 2)
    // a 4x hotter hub scales F proportionally, not fixed at 4
    assert(adaptiveSaltFactor(mx = 296L, m = 320L, cores = 32L) === 15)
    // clamped to [2, cores]
    assert(adaptiveSaltFactor(mx = 1L, m = 1000000L, cores = 32L) === 2)
    assert(adaptiveSaltFactor(mx = 1000L, m = 1000L, cores = 8L) === 4)
    assert(adaptiveSaltFactor(mx = 1000000L, m = 1000L, cores = 8L) === 8)
  }

  test("auto-dispatched salted components match plain bucketed on a " +
      "skewed integral graph") {
    // hub 0 touches half the nodes; sentinel -1 forces salted, 0 plain
    val edges = ((1L to 200L).map(i => (0L, i)) ++
      (201L to 260L).map(i => (i, i + 1))).toDF("a", "b")
    val plain = GraphOps.connectedComponents(edges, bucketBytes = 0L)
    val salted = GraphOps.connectedComponents(edges, bucketBytes = -1L)
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  // ------------------------------- 3: content-addressed cache keys
  test("bucketEdges serves FRESH edges after in-place data regeneration " +
      "under an identical plan") {
    val dir = Files.createTempDirectory("graft_fp_spec").toString
    def writeGraph(n: Long): Unit =
      (1L to n).map(i => (i, i + 1)).toDF("a", "b")
        .coalesce(1).write.mode("overwrite").parquet(dir)
    def components(): Long = {
      // identical logical plan both times: read dir, rename, CC
      val pairs = spark.read.parquet(dir)
      GraphOps.connectedComponents(pairs, bucketBytes = 0L).count()
    }
    writeGraph(50L)
    assert(components() === 51L)
    writeGraph(80L) // regenerate IN PLACE: plan identical, content not
    assert(components() === 81L,
      "stale edge cache served after in-place regeneration")
  }
}

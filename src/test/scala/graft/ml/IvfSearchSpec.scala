package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q79 IVF probe search: exactness of the reported scores, probe
  * semantics, and the map-only-corpus plan shape that makes it the ANN
  * scale path (assignment folds against the broadcast literal codebook;
  * the only shuffle is the per-query top-k window).
  */
class IvfSearchSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("IVF-reported cosines are bit-identical to direct recomputation") {
    val res = SimilarityOps.queries("q79_ivf_search")(spark, sf)
    val emb = graft.ops.Tables.embeddings(spark, sf)
    val recomputed = res
      .join(emb.select(col("vec_id").as("query_id"), col("embedding").as("qv")),
        Seq("query_id"))
      .join(emb.select(col("vec_id"), col("embedding").as("cv")), Seq("vec_id"))
      .select(col("cosine"),
        graft.catalyst.GraftFunctions.cosineSimilarity(col("qv"), col("cv"))
          .as("direct"))
      .collect()
    assert(recomputed.nonEmpty)
    recomputed.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1),
        s"IVF cosine ${r.getDouble(0)} != direct ${r.getDouble(1)}")
    }
  }

  test("IVF returns at most top-k per query, queries only from the query set") {
    val res = SimilarityOps.queries("q79_ivf_search")(spark, sf).collect()
    val perQuery = res.groupBy(_.getAs[Long]("query_id"))
    perQuery.foreach { case (qid, rows) =>
      assert(qid < SimilarityOps.NumQueries)
      assert(rows.length <= SimilarityOps.TopK)
      val ranks = rows.map(_.getAs[Int]("rank")).sorted
      assert(ranks.toSeq == (1 to rows.length), s"ranks not dense: $qid")
    }
  }

  test("codebook guard fires when label cardinality exceeds the cap") {
    import spark.implicits._
    val emb = (0 until 5)
      .map(i => (i.toLong, i, Array.fill(4)(0.5f)))
      .toDF("vec_id", "label", "embedding")
    val e = intercept[IllegalArgumentException] {
      SimilarityOps.trainCodebook(emb, maxK = 3)
    }
    assert(e.getMessage.contains("5 centroids"))
    // at-or-under the cap trains fine
    assert(SimilarityOps.trainCodebook(emb, maxK = 5).size === 5)
  }

  test("broadcast assignment path is result-identical to the literal path at k > MaxCodebook") {
    import spark.implicits._
    // a codebook past the literal cap: k = MaxCodebook + 176 deterministic
    // 4-dim centroids, plus a small corpus of vectors scattered near them
    val k = SimilarityOps.MaxCodebook + 176
    val codebook: Seq[(Int, Seq[Double])] = (0 until k).map { i =>
      (i, Seq(i % 13 / 13.0, i % 7 / 7.0, i % 29 / 29.0, i / k.toDouble))
    }
    val corpus = (0 until 400).map { j =>
      (j.toLong, Array(
        (j % 13 / 13.0 + j % 3 * 0.01).toFloat, (j % 7 / 7.0).toFloat,
        (j % 29 / 29.0 - j % 2 * 0.01).toFloat, (j % k / k.toDouble).toFloat))
    }.toDF("vec_id", "embedding")

    // k > MaxCodebook auto-selects the broadcast+UDF path; force the
    // literal path as the ground truth (plan-size-heavy but exact)
    def run(force: Option[Boolean]) = corpus.select(col("vec_id"),
        SimilarityOps.nearestCentroid(spark, codebook, force)(col("embedding"))
          .as("bucket"),
        SimilarityOps.probeCentroids(spark, codebook, 3, force)(col("embedding"))
          .as("probes"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getSeq[Int](2).toList))
      .sortBy(_._1).toList
    val broadcastPath = run(None)
    val literalPath = run(Some(true))
    assert(broadcastPath === literalPath)
    // and the nearest bucket is the head of the probe list on both paths
    broadcastPath.foreach { case (_, bucket, probes) =>
      assert(probes.head === bucket)
      assert(probes.length === 3)
    }
  }

  test("IVF corpus side is map-only: broadcast probe join, one shuffle total") {
    val plan = SimilarityOps.queries("q79_ivf_search")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"probe join must broadcast the probe set:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1,
      s"expected exactly one shuffle (the top-k window), got $shuffles:\n$plan")
  }
}

package graft.ml

import graft.SparkSpec

/** q106/q107 semantics on constructed 64-dim embeddings: k-means must
  * re-home a mislabeled vector to its geometric cluster within the
  * fixed Lloyd rounds, and the Gramian must be exact int64 arithmetic.
  */
class KmeansGramianSpec extends SparkSpec {

  /** 64-dim vector: value `v` at dim `at` (1-based), zero elsewhere. */
  private def vec(at: Int, v: Float): Seq[Float] =
    Seq.tabulate(64)(i => if (i == at - 1) v else 0.0f)

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("kmeans_fixtures").toString
    Seq(
      // cluster A: mass on dim 1 — two members labeled 0, one MISLABELED 1
      (0L, vec(1, 1.0f), 0),
      (1L, vec(1, 1.2f), 0),
      (2L, vec(1, 0.8f), 1), // geometrically A, initially labeled B
      // cluster B: mass on dim 2
      (3L, vec(2, 1.0f), 1),
      (4L, vec(2, 1.1f), 1))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    d
  }

  test("q106: Lloyd rounds re-home the mislabeled vector; means are grid-exact") {
    val rows = SimilarityOps.queries("q106_kmeans")(spark, dir)
      .collect().map(r => (r.getAs[Int]("cid"), r.getAs[Int]("dim")) -> r).toMap
    // cluster 0 captures vectors 0,1,2 → n=3, dim-1 mean = (1.0+1.2+0.8)/3
    assert(rows((0, 1)).getAs[Long]("n") === 3L)
    assert(rows((0, 1)).getAs[Double]("cv") === 1.0)
    assert(rows((0, 2)).getAs[Double]("cv") === 0.0)
    // cluster 1 keeps vectors 3,4 → n=2, dim-2 mean = (1.0+1.1)/2
    assert(rows((1, 2)).getAs[Long]("n") === 2L)
    // grid-exact: floor(1.0*1e6) + floor(1.1f→1.10000002…*1e6) = 2100000
    assert(rows((1, 2)).getAs[Double]("cv") === 2100000.0 / 1000000 / 2)
  }

  test("q107: gramian cells are exact integer products of grid components") {
    val rows = SimilarityOps.queries("q107_gramian")(spark, dir)
      .collect().map(r => (r.getAs[Int]("dim_i"), r.getAs[Int]("dim_j")) ->
        r.getAs[Long]("gram_grid")).toMap
    // dim(1,1): Σ over vecs 0,1,2 of grid² — 1e6², 1.2f→1200000², 0.8f→800000²
    val g1 = math.floor(1.0f * 1e6).toLong
    val g12 = math.floor(1.2f.toDouble * 1e6).toLong
    val g08 = math.floor(0.8f.toDouble * 1e6).toLong
    assert(rows((1, 1)) === g1 * g1 + g12 * g12 + g08 * g08)
    // dims 1 and 2 never co-occur in one vector → zero cross-moment
    assert(rows((1, 2)) === 0L)
    // upper triangle only
    assert(rows.keys.forall { case (i, j) => j >= i })
    assert(rows.size === 64 * 65 / 2)
  }

  test("q113: power iteration finds the dominant variance direction") {
    // fixture mass: dim 1 carries Σx² = 1+1.44+0.64 = 3.08, dim 2 = 2.21
    // → the top eigenvector must concentrate on dim 1
    val rows = SimilarityOps.queries("q113_power_iteration")(spark, dir)
      .collect().map(r => r.getAs[Int]("dim") ->
        (r.getAs[Double]("component"), r.getAs[Double]("lambda"))).toMap
    assert(rows.size === 64)
    assert(math.abs(rows(1)._1) > 0.99) // unit vector, dim-1 dominant
    assert(math.abs(rows(2)._1) < 0.1)
    assert(rows(1)._2 > 0) // eigenvalue estimate positive
    // diagonal matrix here → e1 is exact; lambda ≈ Σ grid²/1e12 on dim 1
    assert(math.abs(rows(1)._2 - 3.08) < 0.01)
  }
}

package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Recall bound for the ANN path under the MUTATED-VECTOR regime (r9
  * verdict task 5): replicate-soak embeddings repeat vectors verbatim,
  * so every copy trivially lands in its anchor's LSH bucket — this spec
  * instead builds the perturbed corpus `tools/make_soak.py --mutate-vec`
  * models (K=10 copies, per-coordinate deterministic relative noise in
  * [-M%, +M%], copy 0 verbatim) and pins that q156's recall@k of the
  * LSH retrieval against exact brute force stays above a floor when
  * near-duplicates (cosine ≈ 0.9996 at M=5%) crowd the signature
  * buckets.
  *
  * The floor (mean recall ≥ 0.60, and ≥ 8/10 queries individually above
  * 0.2) is calibrated against the measured mutated-10× soak point
  * (SCALE.md round-10: duckdb-hash noise, same K/M, mean recall 1.00)
  * with wide margin for the different (JVM-hash) noise stream used
  * here — the spec exists to catch a retrieval REGRESSION (lost
  * buckets, capped-away anchors, signature drift), not to certify a
  * precise recall value.
  *
  * Self-contained: the corpus is built in-memory from sf0.1 embeddings
  * and written to a temp dir shaped like a testdata sfDir, then the
  * REAL q156 query (both retrieval plans + the overlap join) runs on it
  * unchanged.
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  private val K = 10
  private val MutPct = 5

  test(s"LSH recall@k on a mutated ${K}x corpus (M=$MutPct%) stays above " +
    "the regression floor") {
    val base = graft.ops.Tables.embeddings(spark, "/root/testdata/sf0.1")
      .select("vec_id", "embedding", "label")
      .as[(Long, Array[Float], Int)].collect()
    val n = base.length
    // deterministic per-(vec, copy, coordinate) relative noise in
    // [-M%, +M%] — structurally the make_soak --mutate-vec model (the
    // hash stream differs; the REGIME is what matters)
    def noise(vecId: Long, copy: Int, coord: Int): Float = {
      var h = vecId * 1000003L + copy * 7919L + coord * 104729L
      h ^= (h >>> 33); h *= 0xff51afd7ed558ccdL; h ^= (h >>> 33)
      val u = (Math.floorMod(h, 2001L) - 1000L) / 1000.0
      (u * MutPct / 100.0).toFloat
    }
    val rows = for {
      copy <- 0 until K
      (vecId, emb, label) <- base
    } yield Row(
      vecId + copy.toLong * n,
      if (copy == 0) emb.toSeq
      else emb.toSeq.zipWithIndex.map { case (x, i) =>
        x * (1 + noise(vecId, copy, i)) },
      label)
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val dir = java.nio.file.Files.createTempDirectory("ann_recall_mv").toString
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 8), schema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val recalls = graft.SparkEntry.queries("q156_ann_recall")(spark, dir)
      .select("query_id", "n_exact", "n_hit", "recall")
      .as[(Long, Long, Long, Double)].collect()
    assert(recalls.length === graft.ml.SimilarityOps.NumQueries,
      "every query vector must produce a recall row")
    recalls.foreach { case (q, nExact, nHit, r) =>
      assert(nExact === graft.ml.SimilarityOps.TopK.toLong)
      assert(nHit <= nExact, s"query $q hit more than exact top-k")
      assert(r >= 0.0 && r <= 1.0)
    }
    val mean = recalls.map(_._4).sum / recalls.length
    assert(mean >= 0.60,
      s"mean LSH recall regressed under near-dup crowding: $mean " +
        s"(${recalls.map(_._4).mkString(", ")})")
    assert(recalls.count(_._4 >= 0.2) >= 8,
      s"too many starved queries: ${recalls.map(_._4).mkString(", ")}")
  }
}

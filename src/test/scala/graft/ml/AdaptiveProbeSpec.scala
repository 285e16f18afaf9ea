package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q241's adaptive probe budget, beyond the oracle gate (which proves
  * tuned == full-NProbeMax top-k): the TUNING must be non-vacuous on
  * the gate corpus — early termination actually fires, and the budget
  * actually varies — and the tuned result's exact-L2 recall must not
  * fall below the fixed-NProbe reference's (it probes a superset of
  * cells whenever the bound cannot prove safety, so losing recall
  * would mean the bound is wrong). */
class AdaptiveProbeSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  test("adaptive budgets terminate early for some query, and tuned " +
      "recall >= the fixed-NProbe reference's recall") {
    val tuned = SimilarityOps.adaptiveProbeRunner(spark, sf)
      .localCheckpoint(true)
    val budgets = tuned.select("query_id", "n_probed").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(budgets.nonEmpty)
    assert(budgets.values.min < SimilarityOps.AnnNProbeMax,
      s"vacuous: no query terminated early (budgets=$budgets)")
    assert(budgets.values.toSet.size > 1,
      s"budgets never vary (budgets=$budgets)")

    // exact-L2 top-k (10 queries — small by construction)
    val emb = graft.ops.Tables.embeddings(spark, sf)
    val qv = emb.filter(col("vec_id") < SimilarityOps.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val exact = broadcast(qv)
      .join(emb.alias("e"), col("query_id") =!= col("e.vec_id"))
      .select(col("query_id"), col("e.vec_id").as("vec_id"),
        graft.catalyst.GraftFunctions
          .l2sqDistance(col("qv"), col("e.embedding")).as("d"))
    val we = Window.partitionBy("query_id")
      .orderBy(col("d").asc, col("vec_id").asc)
    val exactTopK = exact
      .withColumn("erank", row_number().over(we))
      .filter(col("erank") <= SimilarityOps.TopK)
      .select("query_id", "vec_id").localCheckpoint(true)

    def recallOf(res: org.apache.spark.sql.DataFrame): Double = {
      val hits = res.select("query_id", "vec_id")
        .join(exactTopK, Seq("query_id", "vec_id"), "left_semi").count()
      hits.toDouble / (SimilarityOps.NumQueries * SimilarityOps.TopK)
    }
    val tunedRecall = recallOf(tuned)
    // the tuner's recall knob (AnnCandidateTarget) makes every budget
    // >= the fixed NProbe here, so tuned recall must not fall below
    // the fixed-budget reference's. (ADC recall on this corpus is low
    // in ABSOLUTE terms for both — the embeddings are near-random, the
    // PQ grid coarse — which is exactly why the comparison, not an
    // absolute number, is the stable gate.)
    val fixed = graft.SparkEntry.queries("q212_ivfpq_search")(spark, sf)
    val fixedRecall = recallOf(fixed)
    assert(tunedRecall >= fixedRecall,
      s"tuned recall $tunedRecall < fixed-budget recall $fixedRecall")
  }
}

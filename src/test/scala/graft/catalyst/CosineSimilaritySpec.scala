package graft.catalyst

import graft.SparkSpec
import graft.ml.SimilarityOps
import graft.ops.Tables
import org.apache.spark.sql.functions._

/** The native cosine_similarity expression against the composed
  * higher-order-function formulation: the determinism contract says the
  * two must agree BIT-FOR-BIT (same fold order, same widening), not just
  * approximately — the DuckDB oracles hash exact doubles.
  */
class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("native expression is bit-identical to the composed fold on real vectors") {
    val e = Tables.embeddings(spark, sf).limit(200)
      .select(col("vec_id"), col("embedding"))
    val pairs = e.alias("a").crossJoin(e.alias("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(2000)
    val both = pairs.select(
      GraftFunctions.cosineSimilarity(col("a.embedding"), col("b.embedding"))
        .as("native"),
      (SimilarityOps.dot(col("a.embedding"), col("b.embedding"))
        / (SimilarityOps.norm(col("a.embedding"))
          * SimilarityOps.norm(col("b.embedding")))).as("composed"))
    val diff = both.filter(
      // bit-level comparison: NaN-safe <=> over the raw doubles
      !(col("native") <=> col("composed"))).count()
    assert(diff === 0L, s"$diff pairs differ at the bit level")
  }

  test("cosine_similarity is callable from SQL via the function registry") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf).limit(10)
      .createOrReplaceTempView("cs_probe")
    val n = spark.sql(
      """SELECT cosine_similarity(a.embedding, b.embedding) AS c
        |FROM cs_probe a JOIN cs_probe b ON a.vec_id < b.vec_id""".stripMargin)
      .filter(col("c").between(-1.0000001, 1.0000001)).count()
    assert(n === 45)
  }

  test("self-similarity is 1 within one ulp-scale rounding") {
    // sqrt(d)*sqrt(d) != d exactly in IEEE arithmetic, so self-cosine is
    // 1.0 ± a few ulps, not bit-exact 1.0
    val n = Tables.embeddings(spark, sf)
      .select(GraftFunctions.cosineSimilarity(col("embedding"), col("embedding"))
        .as("c"))
      .filter(abs(col("c") - 1.0) > 1e-12).count()
    assert(n === 0L)
  }

  test("native lsh signature is bit-identical to the composed per-plane folds") {
    val n = Tables.embeddings(spark, sf)
      .select(SimilarityOps.lshSignature(col("embedding")).as("native"),
        SimilarityOps.lshSignatureComposed(col("embedding")).as("composed"))
      .filter(col("native") =!= col("composed")).count()
    assert(n === 0L)
  }

  test("mixed float/double inputs and length mismatch behave as specified") {
    val df = Seq((Seq(1.0f, 2.0f), Seq(1.0, 2.0))).toDF("f", "d")
    val c = df.select(GraftFunctions.cosineSimilarity(col("f"), col("d")).as("c"))
      .head().getDouble(0)
    assert(math.abs(c - 1.0) < 1e-15)
    val bad = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
    intercept[Exception] {
      bad.select(GraftFunctions.cosineSimilarity(col("a"), col("b"))).collect()
    }
  }
}

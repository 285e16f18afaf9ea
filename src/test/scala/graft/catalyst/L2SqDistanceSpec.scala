package graft.catalyst

import graft.SparkSpec
import graft.ops.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** The native l2sq_distance expression against the composed
  * higher-order-function formulation: the determinism contract says the
  * two must agree BIT-FOR-BIT (same index-order fold, same float→double
  * widening) — q208's ADC tables and exact reference ranks hash exact
  * doubles cross-engine.
  */
class L2SqDistanceSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** The composed zip_with + left-fold spelling the kernel replaces. */
  private def composed(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    aggregate(zip_with(a, b, (x, y) =>
        (x.cast(DoubleType) - y.cast(DoubleType))
          * (x.cast(DoubleType) - y.cast(DoubleType))),
      lit(0.0), (acc, v) => acc + v)

  test("native expression is bit-identical to the composed fold on real vectors") {
    val e = Tables.embeddings(spark, sf).limit(200)
      .select(col("vec_id"), col("embedding"))
    val pairs = e.alias("a").crossJoin(e.alias("b"))
      .filter(col("a.vec_id") < col("b.vec_id")).limit(2000)
    val diff = pairs.select(
        GraftFunctions.l2sqDistance(col("a.embedding"), col("b.embedding"))
          .as("native"),
        composed(col("a.embedding"), col("b.embedding")).as("composed"))
      .filter(!(col("native") <=> col("composed"))).count()
    assert(diff === 0L, s"$diff pairs differ at the bit level")
  }

  test("agrees with IvfProbe's per-centroid distance on slices (PQ contract)") {
    // q208 encodes with IvfProbe on 8-dim slices and builds ADC tables
    // with l2sq_distance on the same slices — the two loops must produce
    // the same double for the same (slice, codeword) or codes and table
    // entries would disagree. Probe with a one-centroid codebook: the
    // kernel always returns that label, and the table value must rank it
    // at distance == l2sq_distance.
    val e = Tables.embeddings(spark, sf).limit(64)
    val cw: Array[Double] = Array.tabulate(8)(i => 0.01 * (i + 1))
    import org.apache.spark.sql.GraftColumnBridge
    val viaKernel = GraftColumnBridge.column(IvfProbe(
      GraftColumnBridge.expression(slice(col("embedding"), 9, 8)),
      Array(0), Array(cw), 1))
    val viaDist = GraftFunctions.l2sqDistance(
      slice(col("embedding"), 9, 8), array(cw.map(lit): _*))
    // IvfProbe returns labels, not distances — assert the distances via
    // a 2-centroid tie-free codebook instead: nearest label must be the
    // one whose l2sq_distance is smaller.
    val cw2: Array[Double] = Array.tabulate(8)(i => -0.02 * (i + 1))
    val viaKernel2 = GraftColumnBridge.column(IvfProbe(
      GraftColumnBridge.expression(slice(col("embedding"), 9, 8)),
      Array(0, 1), Array(cw, cw2), 1))
    val d2 = GraftFunctions.l2sqDistance(
      slice(col("embedding"), 9, 8), array(cw2.map(lit): _*))
    val bad = e.select(element_at(viaKernel, 1).as("always0"),
        element_at(viaKernel2, 1).as("argmin"),
        viaDist.as("d0"), d2.as("d1"))
      .filter(col("always0") =!= 0 ||
        col("argmin") =!= when(col("d0") <= col("d1"), 0).otherwise(1))
      .count()
    assert(bad === 0L)
  }

  test("l2sq_distance is callable from SQL via the function registry") {
    GraftFunctions.register(spark)
    Tables.embeddings(spark, sf).limit(10)
      .createOrReplaceTempView("l2_probe")
    val n = spark.sql(
      """SELECT l2sq_distance(a.embedding, b.embedding) AS d
        |FROM l2_probe a JOIN l2_probe b ON a.vec_id < b.vec_id""".stripMargin)
      .filter(col("d") >= 0.0).count()
    assert(n === 45)
  }

  test("q208 PQ retrieval keeps a sane overlap with the exact top-k") {
    // PQ with 10 label-mean codewords per subspace on RANDOM vectors is
    // a genuinely coarse quantizer (random data has no cluster structure
    // for the means to capture) — the audit exists to catch a WIRING bug
    // (codes indexing the wrong table column, slices misaligned), which
    // manifests as chance-level overlap: 5 exact slots out of 499
    // candidates ≈ 1% per returned row, E[hits] ≈ 0.5/50. Measured on
    // this corpus: 8/50 (16%). Floor at 5/50 — an order of magnitude
    // above chance, half the measured value.
    val out = graft.SparkEntry.queries("q208_product_quantization")(
      spark, "/root/testdata/sf0.01")
    val rows = out.collect()
    assert(rows.length === 50)
    val hits = rows.count(_.getAs[Boolean]("in_exact_topk"))
    assert(hits >= 5, s"only $hits/50 PQ results in the exact top-5 — " +
      "chance level is ~0.5/50; check code/table alignment")
  }

  test("null vector elements throw instead of silently reading 0.0") {
    // r13 ADVICE: ArrayData.getFloat on a null slot yields 0.0 — a
    // wrong distance. The kernel must refuse sparse vectors loudly.
    import spark.implicits._
    val df = Seq((Seq[Option[Double]](Some(1.0), None, Some(3.0)),
        Seq[Option[Double]](Some(1.0), Some(2.0), Some(3.0))))
      .toDF("a", "b")
    val e = intercept[Exception] {
      df.select(GraftFunctions.l2sqDistance(col("a"), col("b")).as("d"))
        .collect()
    }
    def chain(t: Throwable): Iterator[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
    assert(chain(e).exists(c =>
        c.getMessage != null && c.getMessage.contains("null element")),
      s"expected a loud null-element failure, got: ${e.getMessage}")
  }
}

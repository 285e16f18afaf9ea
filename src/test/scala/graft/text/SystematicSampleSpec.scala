package graft.text

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** q126 weighted systematic sampling: the distributed two-pass prefix sum
  * must equal a single global cumulative sum, and the tick selection must
  * implement the PPS/systematic design exactly.
  */
class SystematicSampleSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("distributed prefix-sum selection equals the global-window reference") {
    val got = SamplingOps.queries("q126_weighted_systematic")(spark, sf)
      .orderBy("doc_id").collect()

    // reference: one global cumulative-sum window over the same docs
    val w = Window.orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = graft.ops.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars").as("weight"))
      .withColumn("cum", sum(col("weight")).over(w))
    val total = cum.agg(max("cum")).head.getLong(0)
    val step = math.max(total / SamplingOps.SystematicK, 1L)
    val expect = cum
      .filter(expr(s"(cum - weight) div ${step}L < cum div ${step}L"))
      .withColumn("tick", expr(s"cum div ${step}L"))
      .orderBy("doc_id").collect()

    assert(got.map(_.getLong(0)).toSeq === expect.map(_.getLong(0)).toSeq)
    assert(got.map(_.getLong(3)).toSeq === expect.map(_.getLong(3)).toSeq)
  }

  test("distributed prefix sum equals global cumsum on random weights") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    (1 to 6).foreach { seed =>
      val weights = Gen.listOfN(300, Gen.choose(1L, 5000L))
        .apply(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(fail("gen failed"))
      val df = weights.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("doc_id", "weight")
        .repartition(7)
      // the operator's two-pass shape, on arbitrary weights
      val docs = df.withColumn("pbkt", expr("doc_id div 64"))
      val bt = docs.groupBy("pbkt").agg(sum("weight").as("bt"))
      val wOff = Window.orderBy("pbkt")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = bt.select(col("pbkt"),
        coalesce(sum(col("bt")).over(wOff), lit(0L)).as("off"))
      val wIn = Window.partitionBy("pbkt").orderBy("doc_id")
      val got = docs.join(broadcast(offsets), Seq("pbkt"))
        .select(col("doc_id"),
          (col("off") + sum(col("weight")).over(wIn)).as("cum"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // reference: plain global cumulative sum
      var acc = 0L
      weights.zipWithIndex.foreach { case (w, i) =>
        acc += w
        assert(got(i.toLong) === acc, s"seed=$seed doc=$i")
      }
    }
  }

  test("each crossed tick is picked by exactly one row") {
    val rows = SamplingOps.queries("q126_weighted_systematic")(spark, sf)
      .select("tick").collect().map(_.getLong(0))
    assert(rows.length === rows.distinct.length)
    // systematic design yields about K picks (skipped ticks only when one
    // doc spans several steps; extra pick at the total boundary)
    assert(rows.length >= 1 && rows.length <= SamplingOps.SystematicK + 1)
  }
}

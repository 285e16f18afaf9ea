package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming KMV distinct estimation ([[StructuredStreams.KmvProcessor]]):
  * q203's bounded-state sketch held incrementally. Pins:
  *   1. batch/stream agreement BY DATA: after draining the same hashes
  *      (in a different per-batch arrival order), the latest emit per
  *      key carries exactly the estimate the batch `KmvSketch`
  *      aggregator produces — the two paths share the reduce kernel,
  *      and this spec proves the state/emit plumbing preserves that;
  *   2. bounded state: sketch_size never exceeds k;
  *   3. no-movement batches emit nothing (a saturated sketch fed only
  *      already-seen or too-large hashes stays silent).
  */
class KmvStreamSpec extends SparkSpec {
  private val K = 16

  test("latest emit per key == batch aggregator; state bounded; " +
      "unchanged sketches stay silent") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    // the q203 hash over a deterministic key stream, two logical sets
    def hash(x: Long): Long = ((x & 2147483647L) * 2654435761L) & 2147483647L
    val all = (1L to 400L).map(x =>
      KmvIn(if (x % 3 == 0) "a" else "b", hash(x)))

    val input = MemoryStream[KmvIn]
    val query = StructuredStreams.kmvDistinctStream(input.toDS(), K)
      .writeStream.format("memory").queryName("kmv_stream")
      .outputMode("append").start()
    try {
      // three batches, deliberately interleaved out of original order
      val (b1, rest) = all.splitAt(150)
      val (b2, b3) = rest.splitAt(150)
      input.addData(b1.reverse)
      query.processAllAvailable()
      input.addData(b3) // out-of-order delivery
      query.processAllAvailable()
      input.addData(b2)
      query.processAllAvailable()
      val n3 = spark.table("kmv_stream").count()
      // batch 4: replay already-seen hashes plus values too large to
      // enter a saturated sketch — must emit NOTHING
      input.addData(b1.take(50))
      input.addData(Seq(KmvIn("a", Long.MaxValue & 2147483647L),
        KmvIn("b", 2147483646L)))
      query.processAllAvailable()
      assert(spark.table("kmv_stream").count() === n3,
        "no-movement batches must not emit")

      val emits = spark.table("kmv_stream").as[KmvEstimate].collect()
      assert(emits.forall(_.sketch_size <= K), "state exceeded k")

      // batch twin over the same data through the SAME aggregator
      val agg = org.apache.spark.sql.functions.udaf(
        graft.ml.KmvSketch.aggregator(K),
        org.apache.spark.sql.Encoders.scalaLong)
      val batch = all.toDF("key", "hv").groupBy("key")
        .agg(agg(col("hv")).as("vs"))
        .select(col("key"), size(col("vs")).as("n"),
          when(size(col("vs")) < K, size(col("vs")).cast("long"))
            .otherwise(expr(
              s"${(K - 1).toLong * 2147483648L} div element_at(vs, $K)"))
            .as("est"))
        .as[(String, Int, Long)].collect()
        .map { case (k, n, e) => k -> (n, e) }.toMap

      // latest emit per key, order-free: sketch_size is non-decreasing
      // and, once saturated, h_k only shrinks so est is non-decreasing —
      // the final state is the max under (sketch_size, est)
      val latest = emits.groupBy(_.key).map { case (k, es) =>
        k -> es.maxBy(e => (e.sketch_size, e.est))
      }
      assert(latest.keySet === batch.keySet)
      latest.foreach { case (k, e) =>
        assert((e.sketch_size, e.est) === batch(k),
          s"key $k: stream ${(e.sketch_size, e.est)} vs batch ${batch(k)}")
      }
    } finally {
      query.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming HLL + Count-Min ([[StructuredStreams.HllProcessor]] /
  * [[StructuredStreams.CmsProcessor]]) — the round-12 verdict task 5:
  * the remaining two sketch families held incrementally on the
  * kmvDistinctStream pattern. Pins:
  *
  *   1. batch/stream agreement BY DATA: the final streamed HLL estimate
  *      per key equals Spark's batch `hll_sketch_estimate(hll_sketch_agg)`
  *      over the same values (same DataSketches library, same lgK — HLL
  *      updates are a lattice join, so micro-batching cannot change the
  *      registers); the final streamed CMS estimates equal the batch
  *      [[graft.ml.CMSketch]] aggregator's (integer cell adds commute);
  *   2. bounded state, by construction and by emission shape (HLL emits
  *      only on rounded-estimate movement);
  *   3. a CHECKPOINTED RESTART: the HLL query is stopped mid-stream and
  *      restarted from its checkpoint; the post-restart batches continue
  *      from the recovered sketch state and the final estimate still
  *      matches batch — the state survives the stop/start boundary.
  */
class SketchStreamSpec extends SparkSpec {

  private def withRocks[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("streaming HLL: final estimate == batch hll_sketch_agg, across a " +
      "checkpointed restart") { withRocks {
    import spark.implicits._
    val lgK = 12
    val all = (1L to 3000L).map(x =>
      HllIn(if (x % 4 == 0) "a" else "b", x * 2654435761L))
    // file source + file sink (the FileStreamRestartSpec shape): the
    // memory sink does not support checkpoint recovery, and the restart
    // is the point of this test
    val inDir = java.nio.file.Files.createTempDirectory("hll_in").toString
    val outDir = java.nio.file.Files.createTempDirectory("hll_out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("hll_ckpt").toString
    def addBatch(name: String, rows: Seq[HllIn]): Unit =
      spark.createDataset(rows).coalesce(1)
        .write.mode("append").json(s"$inDir/$name")
    def start() = StructuredStreams.hllDistinctStream(
        spark.readStream
          .schema("key STRING, v BIGINT")
          .option("maxFilesPerTrigger", "1")
          .json(s"$inDir/*").as[HllIn], lgK)
      .writeStream.format("json")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    val (b1, rest) = all.splitAt(1000)
    val (b2, b3) = rest.splitAt(1000)
    addBatch("b1", b1)
    addBatch("b2", b2)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // restart from the checkpoint: the recovered per-key sketches must
    // carry b1+b2 (the processed-file log prevents re-ingest); b3
    // continues on top of them
    addBatch("b3", b3)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val emits = spark.read.schema("key STRING, est BIGINT").json(outDir)
      .as[HllEstimate].collect()
    // estimates only grow here (distinct values keep arriving), so the
    // final state per key is the max emit
    val latest = emits.groupBy(_.key).map { case (k, es) =>
      k -> es.map(_.est).max }
    // Batch twin: the SKETCH BINARY from hll_sketch_agg, compared at the
    // composite estimate — a pure function of the registers, which are a
    // true lattice join. (hll_sketch_estimate itself carries the
    // merge-tree-dependent HIP term — see HllProcessor scaladoc — and
    // CANNOT be matched exactly by any batching, including Spark's own
    // agg under a different partitioning.)
    val batch = all.toDF("key", "v").groupBy("key")
      .agg(expr(s"hll_sketch_agg(v, $lgK)").as("sk"))
      .as[(String, Array[Byte])].collect()
      .map { case (k, bytes) =>
        k -> math.round(org.apache.datasketches.hll.HllSketch
          .heapify(bytes).getCompositeEstimate)
      }.toMap
    assert(latest.keySet === batch.keySet)
    latest.foreach { case (k, e) =>
      assert(e === batch(k), s"key $k: stream $e vs batch ${batch(k)}")
    }
    // and both sit inside the q56-style bound of the exact truth
    // (750 / 2250 distinct values)
    assert(math.abs(latest("a") - 750L) <= 75)
    assert(math.abs(latest("b") - 2250L) <= 225)
  }}

  test("streaming HLL: a no-movement batch emits nothing") { withRocks {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[HllIn]
    val q = StructuredStreams.hllDistinctStream(input.toDS(), 12)
      .writeStream.format("memory").queryName("hll_silent")
      .outputMode("append").start()
    try {
      val vals = (1L to 500L).map(x => HllIn("k", x * 7919L))
      input.addData(vals)
      q.processAllAvailable()
      val n1 = spark.table("hll_silent").count()
      input.addData(vals.take(100)) // replay: registers cannot move
      q.processAllAvailable()
      assert(spark.table("hll_silent").count() === n1,
        "replayed values must not emit")
    } finally q.stop()
  }}

  test("streaming CMS: last-batch estimates == batch aggregator; " +
      "never undercounts") { withRocks {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val (depth, width) = (5, 256)
    // zipf-ish term stream over two groups, interleaved arrival
    val all = (1L to 4000L).map { x =>
      CmsIn(if (x % 5 == 0) "g1" else "g2", s"t${x % (x % 7 + 3)}")
    }
    val input = MemoryStream[CmsIn]
    val q = StructuredStreams.cmsFrequencyStream(input.toDS(), depth, width)
      .writeStream.format("memory").queryName("cms_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = all.splitAt(1500)
      input.addData(b1.reverse)
      q.processAllAvailable()
      input.addData(b2)
      q.processAllAvailable()

      // batch twin through the same kernel
      val byKey = all.groupBy(_.key).map { case (k, rows) =>
        k -> rows.foldLeft(graft.ml.CMSketch.empty(depth, width)) {
          (sk, r) => sk.add(r.term) }
      }
      val truth = all.groupBy(r => (r.key, r.term))
        .map { case (kt, rs) => kt -> rs.size.toLong }
      // the LAST emit per (key, term) reflects the full stream only for
      // terms that arrived in the final batch containing them — but the
      // recovered STATE always equals the batch sketch, so re-probing
      // any term through the batch twin must match the final state.
      // Assert on the emits we can pin exactly: every emitted estimate
      // equals the batch-kernel estimate of a sketch holding exactly the
      // rows seen so far — at minimum the LAST emit per (key, term) that
      // arrived in batch 2 equals the full-data estimate.
      // CMS estimates are monotone non-decreasing (cells only grow), so
      // the LATEST emit per (key, term) is the max — no reliance on the
      // memory sink's row order
      val emits = spark.table("cms_stream").as[CmsTermEstimate].collect()
      val lastEmit = emits.groupBy(e => (e.key, e.term))
        .map { case (kt, es) => kt -> es.map(_.est).max }
      val b2Terms = b2.map(r => (r.key, r.term)).toSet
      b2Terms.foreach { case (k, t) =>
        assert(lastEmit((k, t)) === byKey(k).estimate(t),
          s"($k,$t): stream ${lastEmit((k, t))} vs batch ${byKey(k).estimate(t)}")
      }
      // one-sided error: estimates never undercount the true frequency
      lastEmit.collect { case ((k, t), e) if b2Terms((k, t)) =>
        assert(e >= truth((k, t)), s"($k,$t) undercounted: $e < ${truth((k, t))}")
      }
    } finally q.stop()
  }}
}

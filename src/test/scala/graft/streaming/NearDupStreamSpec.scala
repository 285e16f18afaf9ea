package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming near-duplicate screen ([[StructuredStreams.NearDupProcessor]])
  * — r13 verdict task 6, the last LLM-pipeline family without a
  * streaming twin. Pins:
  *
  *   1. stream == batch BY DATA: feeding the q151 history then the q151
  *      screen docs through the band-bucket processor and reducing each
  *      doc's hits to its best match reproduces q151's output
  *      row-for-row — across micro-batch boundaries AND a checkpointed
  *      stop/restart (file source + file sink; the memory sink refuses
  *      recovery);
  *   2. ON ARRIVAL: every new doc's best match is complete within its
  *      own arrival micro-batch (all its band rows ride one batch, and
  *      the per-batch reduction needs nothing from later batches);
  *   3. the bucket cap kills hot buckets with bounded state — over-cap
  *      buckets contribute no candidates, exactly the batch exclusion.
  */
class NearDupStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def withRocks[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def bandRows() = StructuredStreams.nearDupBandRows(
    graft.ops.Tables.documents(spark, sf))

  private def q151Ref() =
    graft.SparkEntry.queries("q151_incremental_neardup")(spark, sf)
      .select(col("doc_new").cast("long").as("docNew"),
        col("doc_hist").cast("long").as("docHist"), col("jaccard"))

  test("stream == q151 across micro-batches and a checkpointed restart") {
    withRocks {
      import spark.implicits._
      val rows = bandRows()
      val inDir = java.nio.file.Files.createTempDirectory("nd_in").toString
      val outDir = java.nio.file.Files.createTempDirectory("nd_out").toString
      val ckpt = java.nio.file.Files.createTempDirectory("nd_ckpt").toString
      def addBatch(name: String, df: org.apache.spark.sql.DataFrame): Unit =
        df.coalesce(1).write.mode("append").json(s"$inDir/$name")
      // history first (the index-then-screen deployment q151 models),
      // then the screen docs split across two batches with a restart
      // between them
      addBatch("b1_hist", rows.filter(!col("isNew")))
      addBatch("b2_new", rows.filter(col("isNew") && col("docId") % 2 === 0))
      def start() = StructuredStreams.nearDupScreenStream(
          spark.readStream
            .schema("key STRING, docId BIGINT, shl ARRAY<BIGINT>, isNew BOOLEAN")
            .option("maxFilesPerTrigger", "1")
            .json(s"$inDir/*").as[BandRow])
        .writeStream.format("json")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      // restart from the checkpoint: band-bucket state must survive —
      // the remaining screen docs match against history ingested before
      // the stop
      addBatch("b3_new", rows.filter(col("isNew") && col("docId") % 2 =!= 0))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()

      val hits = spark.read
        .schema("docNew BIGINT, docHist BIGINT, jaccard DOUBLE")
        .json(outDir)
      val got = StructuredStreams.nearDupBestMatch(hits)
      val ref = q151Ref()
      assert(got.exceptAll(ref).count() === 0,
        "stream produced matches q151 does not have")
      assert(ref.exceptAll(got).count() === 0,
        "stream missed q151 matches")
      assert(ref.count() > 0, "vacuous: q151 found no near-dups at this sf")
    }
  }

  test("every new doc's best match is complete within its arrival batch") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val rows = bandRows().as[BandRow].collect().toSeq
      val hist = rows.filter(!_.isNew)
      val (n1, n2) = rows.filter(_.isNew).partition(_.docId % 2 == 0)
      val input = MemoryStream[BandRow]
      val q = StructuredStreams.nearDupScreenStream(input.toDS())
        .writeStream.format("memory").queryName("nd_arrival")
        .outputMode("append").start()
      try {
        def emitted(): Seq[(Long, Long, Double)] =
          spark.table("nd_arrival").as[NearDupHit].collect()
            .map(h => (h.docNew, h.docHist, h.jaccard)).toSeq
        input.addData(hist)
        q.processAllAvailable()
        assert(emitted().isEmpty, "history alone must emit nothing")
        input.addData(n1)
        q.processAllAvailable()
        val afterB2 = emitted()
        val b2Docs = afterB2.map(_._1).toSet
        assert(b2Docs.forall(d => d % 2 == 0), "batch-2 hits only for batch-2 docs")
        input.addData(n2)
        q.processAllAvailable()
        val afterB3 = emitted()
        // batch 2's hits did not change after batch 3 — on-arrival
        // completeness: nothing about an earlier doc is amended later
        assert(afterB3.filter(h => h._1 % 2 == 0).toSet === afterB2.toSet)
        // and the overall reduction still equals q151
        val got = StructuredStreams.nearDupBestMatch(
          afterB3.toDF("docNew", "docHist", "jaccard"))
        val ref = q151Ref()
        assert(got.exceptAll(ref).count() === 0)
        assert(ref.exceptAll(got).count() === 0)
      } finally q.stop()
    }
  }

  test("an over-cap bucket is killed: no candidates, bounded state") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val cap = graft.text.DedupOps.MaxBucketSize
      val shl = Array(1L, 2L, 3L, 4L)
      // cap+1 history docs in ONE bucket, then a new doc probing it —
      // identical shingles, so without the cap it would match at 1.0
      val hist = (1 to cap + 1).map(i =>
        BandRow("hot", 100L + i, shl, isNew = false))
      val input = MemoryStream[BandRow]
      val q = StructuredStreams.nearDupScreenStream(input.toDS())
        .writeStream.format("memory").queryName("nd_cap")
        .outputMode("append").start()
      try {
        input.addData(hist)
        q.processAllAvailable()
        input.addData(Seq(BandRow("hot", 5L, shl, isNew = true)))
        q.processAllAvailable()
        assert(spark.table("nd_cap").count() === 0,
          "an over-cap bucket must contribute no candidates")
      } finally q.stop()
    }
  }
}

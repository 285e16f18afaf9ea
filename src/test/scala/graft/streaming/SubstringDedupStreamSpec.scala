package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact substring-dedup screen
  * ([[StructuredStreams.SubstringDedupProcessor]]) — q233's
  * ingest-time pass as a stream. Pins:
  *
  *   1. stream == q233 BY DATA: feeding the history spans, then the
  *      screen-side spans, through the per-hash processor and rolling
  *      the emitted hits up per doc reproduces q233's gated output
  *      row-for-row (which the DuckDB oracle hash-verifies against
  *      the exact-string semantics);
  *   2. ON ARRIVAL: every screen doc's hits are complete within its
  *      own arrival micro-batch;
  *   3. exactness: a hash-colliding probe (same key, different text)
  *      emits nothing — state carries the texts, not just hashes.
  */
class SubstringDedupStreamSpec extends SparkSpec {
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

  test("stream == q233 across micro-batches (history first, then the " +
      "screen side)") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val all = StructuredStreams.substringSpanRows(
        graft.ops.Tables.documents(spark, sf))
        .as[SpanRow].collect()
      val (news, hist) = all.partition(_.isNew)
      assert(hist.nonEmpty && news.nonEmpty)

      val input = MemoryStream[SpanRow]
      val q = StructuredStreams.substringScreenStream(input.toDS())
        .toDF().writeStream.format("memory").queryName("ss_dedup")
        .outputMode("append").start()
      try {
        // history in two micro-batches, then the screen side in one
        val (h1, h2) = hist.splitAt(hist.length / 2)
        input.addData(h1.toSeq); q.processAllAvailable()
        input.addData(h2.toSeq); q.processAllAvailable()
        assert(spark.table("ss_dedup").count() === 0,
          "history rows must emit nothing")
        input.addData(news.toSeq); q.processAllAvailable()

        val got = StructuredStreams.substringDedupRollup(
            spark.table("ss_dedup"))
          .select(col("docId").as("doc_id"), col("n_dup_positions"),
            col("n_dup_spans"), col("dup_chars_removed"))
        val ref = graft.SparkEntry
          .queries("q233_incremental_substring_dedup")(spark, sf)
        assert(got.count() === ref.count())
        assert(got.exceptAll(ref).count() === 0 &&
          ref.exceptAll(got).count() === 0,
          "streamed rollup diverged from the q233 gate")
      } finally q.stop()
    }
  }

  test("exactness under hash collision: same key, different text " +
      "emits nothing; same text emits exactly once per position") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val input = MemoryStream[SpanRow]
      val q = StructuredStreams.substringScreenStream(input.toDS())
        .toDF().writeStream.format("memory").queryName("ss_exact")
        .outputMode("append").start()
      try {
        input.addData(Seq(SpanRow(42L, 1L, 3L, "the real span", isNew = false)))
        q.processAllAvailable()
        input.addData(Seq(
          // same hash key, DIFFERENT text — a collision must not match
          SpanRow(42L, 9L, 1L, "a colliding span", isNew = true),
          // exact text under the same key — matches
          SpanRow(42L, 9L, 2L, "the real span", isNew = true)))
        q.processAllAvailable()
        val hits = spark.table("ss_exact").collect()
          .map(r => (r.getAs[Long]("docId"), r.getAs[Long]("pos")))
        assert(hits.toSeq === Seq((9L, 2L)))
      } finally q.stop()
    }
  }
}

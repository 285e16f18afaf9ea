package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** r16 ADVICE follow-up for the as-of stream: `numRowsTotal` counts
  * STATE KEYS, not ListState elements, so the r15 right-only-key leak
  * fix was pinned only indirectly. This spec drives a 10× VIEW-HEAVY
  * feed (400 right-only keys × 50 views ≫ 4 probe keys) and reads the
  * actual state variables back through the state data source
  * (`format("statestore")`, flattenCollectionTypes) for an explicit
  * ELEMENTS-PER-KEY bound:
  *
  *   - mid-stream: every key's pendR list holds at most the in-flight
  *     watermark window (views spaced 12 min, 1 h delay → ≤ 6 + chunk
  *     slack), never its full history;
  *   - after a flush past everything: pendR and pendL are EMPTY and
  *     each key holds exactly one collapsed lastR row.
  */
class AsOfStateProbeSpec extends SparkSpec {

  private def withRocks[A](body: => A): A = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  private def stateVar(ckpt: String, name: String) =
    spark.read.format("statestore")
      .option("path", ckpt)
      .option("stateVarName", name)
      .option("flattenCollectionTypes", "true")
      .load()

  test("10x view-heavy feed: ListState ELEMENTS per key stay bounded " +
      "by the watermark window, and a flush collapses every key to " +
      "one lastR row with empty lists") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val base = 1700000000000L
      def t(min: Long) = new java.sql.Timestamp(base + min * 60000)
      val rightKeys = (100L until 500L) // 400 view-only keys
      val probeKeys = Seq(1L, 2L, 3L, 4L)
      // 50 views per key, 12 minutes apart → 10 h of history; the 1 h
      // watermark window holds ≤ 6 of them at any instant
      def viewsAt(m: Int) =
        rightKeys.map(k => AsOfIn(k, t(m * 12L), 0, k * 1000 + m)).toSeq
      val ckpt = java.nio.file.Files.createTempDirectory("asof_probe").toString
      val input = MemoryStream[AsOfIn]
      def start() = StructuredStreams.asofJoinStream(input.toDS(), "1 hour")
        .toDF().writeStream.format("memory").queryName("asof_probe")
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q = start()
      try {
        // 5 chunks of 10 view-instants each (4,000 rows per chunk,
        // 20,000 total), time strictly advancing so the watermark moves
        (0 until 50).grouped(10).foreach { ms =>
          input.addData(ms.flatMap(viewsAt))
          q.processAllAvailable()
        }
        // probes land ABOVE the watermark (t(528) after the last
        // chunk) — a below-watermark probe is correctly dropped
        input.addData(probeKeys.map(k => AsOfIn(k, t(600), 1, 9000 + k)))
        q.processAllAvailable()

        // ---- mid-stream: per-key ELEMENT bound (the leak the advice
        // flagged would hold ~44 finalized views per key here). The
        // state source reads the last COMMITTED version — safe while
        // the query idles between triggers.
        val midR = stateVar(ckpt, "pendR")
          .groupBy(col("key.value").as("k")).count().collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(midR.nonEmpty, "expected in-flight pendR state mid-stream")
        val worst = midR.values.max
        assert(worst <= 8,
          s"pendR held $worst elements for one key mid-stream — " +
            "finalized views are not collapsing (watermark window is ~6)")

        // ---- flush: watermark passes everything; every key collapses
        input.addData(Seq(AsOfIn(0L, t(1000000), -1, 0L)))
        q.processAllAvailable()
      } finally q.stop()

      assert(stateVar(ckpt, "pendR").count() === 0,
        "pendR must be EMPTY after the watermark passes all views")
      assert(stateVar(ckpt, "pendL").count() === 0,
        "pendL must be EMPTY after all probes emit")
      val lastR = stateVar(ckpt, "lastR")
        .groupBy(col("key.value").as("k")).count().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(rightKeys.forall(k => lastR.get(k).contains(1L)),
        "every view key must collapse to exactly ONE lastR row")
      assert(lastR.values.forall(_ == 1L))

      // probe keys never received a view: all four must emit as
      // left-outer misses (and none may be dropped or mismatched)
      val out = spark.table("asof_probe")
        .filter(col("purchase_id") >= 9000).collect()
      assert(out.length === probeKeys.size)
      assert(out.forall(_.isNullAt(out.head.fieldIndex("view_id"))),
        "probe keys never saw views — must emit left-outer misses")
    }
  }
}

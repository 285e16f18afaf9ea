package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** Event-time watermark semantics, measured not assumed (r10 verdict
  * task 4): a file-source → `withWatermark` + tumbling-window aggregate →
  * file-sink pipeline (StructuredStreams.tumblingTotals — q32's batch
  * aggregate as a stream) driven through a checkpointed STOP/RESTART,
  * proving three contracts:
  *
  *   1. APPEND-mode finality: a window row is committed exactly once,
  *      only after the watermark passes its end — nothing is emitted
  *      while windows are still open.
  *   2. LATE-DATA DROP: a record arriving behind the watermark (here
  *      10:05 data arriving after the watermark reached 11:00) is
  *      discarded — its window was already finalized and its count and
  *      value appear NOWHERE in the committed output, even though the
  *      record sits in the source directory.
  *   3. BATCH EQUIVALENCE: every committed window row equals the
  *      oracle-gated q32_tumbling_window batch query run over the
  *      ON-TIME subset of the input — and differs from the batch answer
  *      over the full input exactly where the late record fell.
  *
  * The restart between late-record injection and its processing makes
  * the drop decision depend on the RECOVERED watermark from the
  * checkpoint's offset log — the operational path a preempted cluster
  * job takes — not on in-memory state.
  */
class WatermarkStreamSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("watermarked tumbling aggregate: late drop + batch twin across restart") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_wm").toFile
    val srcDir = new java.io.File(root, "src").getAbsolutePath
    val ckptDir = new java.io.File(root, "ckpt").getAbsolutePath
    val outDir = new java.io.File(root, "out").getAbsolutePath

    def addFiles(evs: Ev*): Unit =
      evs.toDS().coalesce(1).write.mode("append").parquet(srcDir)

    def startQuery() = {
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Ev]].schema)
        .parquet(srcDir)
      StructuredStreams.tumblingTotals(src, watermark = "30 minutes")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .start()
    }

    def committed() =
      try spark.read.parquet(outDir)
        .select("window_start", "event_type", "event_count", "total_value")
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
      catch { case _: Throwable => Set.empty[(java.sql.Timestamp, String, Long, Double)] }

    val onTime = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 2.0),
      Ev(2, ts("2024-01-01 10:05:00"), 2, "view", 3.0),
      Ev(3, ts("2024-01-01 10:20:00"), 1, "click", 5.0),
      Ev(4, ts("2024-01-01 11:30:00"), 3, "view", 7.0),
      Ev(6, ts("2024-01-01 13:00:00"), 1, "view", 11.0))
    val late = Ev(5, ts("2024-01-01 10:05:00"), 9, "view", 1000.0)

    try {
      // ---- phase 1: open windows only — nothing may commit
      addFiles(onTime(0), onTime(1), onTime(2))
      val q1 = startQuery()
      try {
        q1.processAllAvailable()
        assert(committed().isEmpty,
          "append mode must not emit windows the watermark has not closed")
        // advance watermark to 11:00 -> finalizes the 10:00 and 10:15
        // windows (both end <= 11:00)
        addFiles(onTime(3))
        q1.processAllAvailable()
      } finally q1.stop()
      val afterPhase1 = committed()
      assert(afterPhase1.map(_._1) ==
        Set(ts("2024-01-01 10:00:00"), ts("2024-01-01 10:15:00")),
        s"exactly the closed windows commit, got $afterPhase1")

      // ---- phase 2: RESTART; inject a record BEHIND the recovered
      // watermark (10:05 < 11:00) plus a later on-time record that
      // closes the 11:30 window
      addFiles(late)
      val q2 = startQuery()
      try {
        q2.processAllAvailable()
        addFiles(onTime(4))
        q2.processAllAvailable()
      } finally q2.stop()
      val got = committed()

      // late record dropped: the already-final 10:00 window was not
      // re-emitted or revised, and no row anywhere carries its value
      assert(got.count(_._1 == ts("2024-01-01 10:00:00")) == 1,
        "a finalized window must not be re-emitted for a late record")
      assert(!got.exists(_._4 >= late.value),
        s"late record's value leaked into the output: $got")

      // batch equivalence: committed rows == the oracle-gated q32 batch
      // query over the ON-TIME subset, restricted to closed windows
      val twinDir = new java.io.File(root, "twin").getAbsolutePath
      onTime.toDS().write.parquet(s"$twinDir/events.parquet")
      val closed = got.map(_._1)
      val batch = StreamingOps.queries("q32_tumbling_window")(spark, twinDir)
        .as[(String, java.sql.Timestamp, Long, Double)].collect()
        .map { case (et, w, n, v) => (w, et, n, v) }
        .filter(r => closed.contains(r._1)).toSet
      assert(got == batch,
        s"streaming != batch twin on closed windows:\n  got=$got\n  want=$batch")

      // and the full-input batch answer DIFFERS exactly at the late
      // record's window — i.e. the drop was real, not vacuous
      val fullDir = new java.io.File(root, "full").getAbsolutePath
      (onTime :+ late).toDS().write.parquet(s"$fullDir/events.parquet")
      val full = StreamingOps.queries("q32_tumbling_window")(spark, fullDir)
        .as[(String, java.sql.Timestamp, Long, Double)].collect()
        .map { case (et, w, n, v) => (w, et, n, v) }
        .filter(r => closed.contains(r._1)).toSet
      assert(full != batch && (full -- batch).forall(_._1 == ts("2024-01-01 10:00:00")),
        "the late record must change exactly its own window in the batch twin")
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }
}

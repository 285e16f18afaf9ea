package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** End-to-end file-source Structured Streaming spec (r8 verdict task 7b):
  * the MemoryStream suite proves operator semantics; this proves the
  * DEPLOYMENT shape — a file-source → transformWithState sessionizer →
  * file-sink pipeline that is STOPPED and RESTARTED from its checkpoint
  * mid-session. The open session (ValueState) and its close timer live in
  * the RocksDB state store; the restart only replays the checkpoint, so
  * the closed session emitted after the restart is proof that
  *
  *   - the file source's processed-file log survived the restart (no
  *     double-ingest of batch-1 files),
  *   - the sessionizer's ValueState + registered event-time timer were
  *     recovered from the state store snapshot, and
  *   - the file sink's _spark_metadata transactional log exposes exactly
  *     the committed output to a batch reader.
  *
  * This is the 100 TB operational contract: on a real cluster a
  * streaming job WILL be preempted/upgraded mid-session and must resume
  * from HDFS/S3 checkpoints without losing open state or re-emitting
  * output. The file protocol (dir listing + metadata log) is identical in
  * local mode; only the FileSystem differs.
  */
class FileStreamRestartSpec extends SparkSpec {

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("file source -> transformWithState sessionizer -> file sink " +
    "survives a checkpointed restart with an open session") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_fs_restart").toFile
    val srcDir = new java.io.File(root, "src").getAbsolutePath
    val ckptDir = new java.io.File(root, "ckpt").getAbsolutePath
    val outDir = new java.io.File(root, "out").getAbsolutePath

    // transformWithState requires the RocksDB provider; scope to the test
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")

    def addFiles(evs: Ev*): Unit =
      evs.toDS().coalesce(1).write.mode("append").parquet(srcDir)

    def startQuery() = {
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[Ev]].schema)
        .parquet(srcDir).as[Ev]
      StructuredStreams.sessionizeTws(src)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckptDir)
        .outputMode("append")
        .start()
    }

    try {
      // ---- phase 1: open a session for user 1, then STOP the query
      addFiles(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 2.0),
        Ev(2, ts("2024-01-01 10:10:00"), 1, "click", 3.0))
      val q1 = startQuery()
      try q1.processAllAvailable() finally q1.stop()
      // session still open (watermark 09:40 < close horizon 10:40):
      // nothing committed yet
      val committed1 =
        try spark.read.parquet(outDir).count() catch { case _: Throwable => 0L }
      assert(committed1 === 0L,
        "no session may close before the watermark passes last+gap")

      // ---- phase 2: RESTART from the checkpoint; new files advance the
      // watermark past the recovered session's close timer
      val q2 = startQuery()
      try {
        addFiles(Ev(3, ts("2024-01-01 12:00:00"), 2, "view", 1.0))
        q2.processAllAvailable() // watermark -> 11:30 after this batch
        addFiles(Ev(4, ts("2024-01-01 12:30:00"), 2, "view", 1.0))
        q2.processAllAvailable() // timer 10:40 < 11:30 fires: session closes
      } finally q2.stop()

      val out = spark.read.parquet(outDir)
        .as[StructuredStreams.SessionOut].collect()
      assert(out.exists(s => s.user_id == 1L && s.n_events == 2L &&
          s.session_value == 5.0 &&
          s.session_start == ts("2024-01-01 10:00:00") &&
          s.session_end == ts("2024-01-01 10:10:00")),
        s"recovered session missing/wrong: ${out.toSeq}")
      // exactly-once at the sink: the one closed session appears once
      assert(out.count(_.user_id == 1L) === 1,
        s"user-1 session emitted ${out.count(_.user_id == 1L)} times")
    } finally {
      prev match {
        case Some(p) =>
          spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None =>
          spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(root)
    }
  }
}

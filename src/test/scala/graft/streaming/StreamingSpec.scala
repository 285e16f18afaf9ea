package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Exercises the Structured Streaming wrappers with a real streaming
  * source (MemoryStream) — watermark + event-time window semantics, not
  * just the batch shapes.
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("tumblingCounts aggregates a stream by 15-minute event-time windows") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = StructuredStreams.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("complete").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:01:00"), 1, "view", 1.0),
        Ev(2, ts("2024-01-01 10:05:00"), 1, "view", 1.0),
        Ev(3, ts("2024-01-01 10:20:00"), 2, "click", 2.0),
        Ev(4, ts("2024-01-01 10:31:00"), 2, "view", 1.0))
      query.processAllAvailable()
      val out = spark.table("tumbling").collect()
        .map(r => (r.getAs[Timestamp]("window_start").toString,
          r.getAs[String]("event_type"), r.getAs[Long]("event_count"))).toSet
      assert(out === Set(
        ("2024-01-01 10:00:00.0", "view", 2L),
        ("2024-01-01 10:15:00.0", "click", 1L),
        ("2024-01-01 10:30:00.0", "view", 1L)))
    } finally query.stop()
  }

  test("session_window merges gap-bounded windows per user (built-in sessionization)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = StructuredStreams.sessionWindowCounts(input.toDF())
      .writeStream.format("memory").queryName("swc")
      .outputMode("complete").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 2.0),
        Ev(2, ts("2024-01-01 10:10:00"), 1, "click", 3.0), // same session (10m gap)
        Ev(3, ts("2024-01-01 11:30:00"), 1, "view", 1.0),  // new session (>30m gap)
        Ev(4, ts("2024-01-01 10:05:00"), 2, "view", 4.0))
      query.processAllAvailable()
      val out = spark.table("swc").collect()
        .map(r => (r.getAs[Long]("user_id"),
          r.getAs[Timestamp]("session_start").toString,
          r.getAs[Long]("n_events"), r.getAs[Double]("session_value"))).toSet
      assert(out === Set(
        (1L, "2024-01-01 10:00:00.0", 2L, 5.0),
        (1L, "2024-01-01 11:30:00.0", 1L, 1.0),
        (2L, "2024-01-01 10:05:00.0", 1L, 4.0)), s"got $out")
    } finally query.stop()
  }

  test("userRollup keeps running per-user state across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = StructuredStreams.userRollup(input.toDF())
      .writeStream.format("memory").queryName("rollup")
      .outputMode("complete").start()
    try {
      input.addData(Ev(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0))
      query.processAllAvailable()
      input.addData(Ev(2, ts("2024-01-01 11:00:00"), 7, "click", 1.0))
      query.processAllAvailable()
      val row = spark.table("rollup").filter(col("user_id") === 7).head()
      assert(row.getAs[Long]("total_events") === 2L)
      assert(row.getAs[Timestamp]("last_seen") === ts("2024-01-01 11:00:00"))
    } finally query.stop()
  }

  test("flatMapGroupsWithState sessionizer closes sessions on event-time timeout") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = StructuredStreams.sessionizeStream(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 2.0),
        Ev(2, ts("2024-01-01 10:10:00"), 1, "click", 3.0))
      query.processAllAvailable()
      // next batch advances the watermark far past 10:10 + 30min
      input.addData(Ev(3, ts("2024-01-01 12:00:00"), 2, "view", 1.0))
      query.processAllAvailable()
      // one more empty-ish batch so the timeout fires after watermark move
      input.addData(Ev(4, ts("2024-01-01 12:30:00"), 2, "view", 1.0))
      query.processAllAvailable()
      val out = spark.table("sessions").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Double]("session_value")))
      assert(out.contains((1L, 2L, 5.0)), s"got ${out.toSeq}")
    } finally query.stop()
  }

  test("streaming dedup drops duplicate event_ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[Ev]
    val query = StructuredStreams.dedupedStream(input.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        Ev(1, ts("2024-01-01 10:00:30"), 1, "view", 1.0), // dup id
        Ev(2, ts("2024-01-01 10:01:00"), 1, "click", 2.0))
      query.processAllAvailable()
      input.addData(Ev(2, ts("2024-01-01 10:02:00"), 1, "click", 2.0)) // dup
      query.processAllAvailable()
      assert(spark.table("dedup").select("event_id").collect()
        .map(_.getLong(0)).sorted.toSeq === Seq(1L, 2L))
    } finally query.stop()
  }

  test("transformWithState sessionizer matches flatMapGroupsWithState " +
    "semantics (RocksDB state store)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // the transformWithState operator only supports the RocksDB provider;
    // scope the conf to this query's lifetime
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    val query = StructuredStreams.sessionizeTws(input.toDS())
      .writeStream.format("memory").queryName("sessions_tws")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 2.0),
        Ev(2, ts("2024-01-01 10:10:00"), 1, "click", 3.0))
      query.processAllAvailable()
      // advance the watermark far past 10:10 + 30min so the timer fires
      input.addData(Ev(3, ts("2024-01-01 12:00:00"), 2, "view", 1.0))
      query.processAllAvailable()
      input.addData(Ev(4, ts("2024-01-01 12:30:00"), 2, "view", 1.0))
      query.processAllAvailable()
      val out = spark.table("sessions_tws").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Double]("session_value")))
      assert(out.contains((1L, 2L, 5.0)), s"got ${out.toSeq}")
    } finally {
      query.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("MapState running top-k tracks exact counts across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[Ev]
    val query = StructuredStreams.topUsersStream(input.toDS(), k = 2)
      .writeStream.format("memory").queryName("top_users")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0),
        Ev(2, ts("2024-01-01 10:01:00"), 7, "view", 1.0),
        Ev(3, ts("2024-01-01 10:02:00"), 9, "view", 1.0))
      query.processAllAvailable()
      // second batch flips the leader: user 9 gains 3 more views
      input.addData(
        Ev(4, ts("2024-01-01 10:03:00"), 9, "view", 1.0),
        Ev(5, ts("2024-01-01 10:04:00"), 9, "view", 1.0),
        Ev(6, ts("2024-01-01 10:05:00"), 9, "view", 1.0))
      query.processAllAvailable()
      val out = spark.table("top_users").collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("n_events"),
          r.getAs[Int]("rank"))).toSet
      // batch 1 emission: 7 leads with 2; batch 2 emission: 9 leads with 4
      assert(out.contains((7L, 2L, 1)), s"got $out")
      assert(out.contains((9L, 4L, 1)), s"got $out")
      assert(out.contains((7L, 2L, 2)), s"got $out") // 7 demoted to rank 2
    } finally {
      query.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("stream-static join enriches events with a dimension table") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val dim = Seq((7L, "gold"), (9L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[Ev]
    // static side of a stream join needs no watermark; it broadcasts
    val query = input.toDS().toDF().join(dim, Seq("user_id"), "left")
      .select("event_id", "user_id", "tier")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData(
        Ev(1, ts("2024-01-01 10:00:00"), 7, "view", 1.0),
        Ev(2, ts("2024-01-01 10:01:00"), 8, "view", 1.0))
      query.processAllAvailable()
      val got = spark.table("enriched").collect()
        .map(r => (r.getAs[Long]("event_id"), Option(r.getAs[String]("tier"))))
        .toSet
      assert(got == Set((1L, Some("gold")), (2L, None)), s"got $got")
    } finally query.stop()
  }

  test("AvailableNow trigger with foreachBatch drains the backlog and stops") {
    import java.nio.file.Files
    import org.apache.spark.sql.streaming.Trigger
    val inDir = Files.createTempDirectory("graft_avnow_in")
    val ckpt = Files.createTempDirectory("graft_avnow_ckpt")
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, " +
      "event_type STRING, value DOUBLE"
    Files.writeString(inDir.resolve("a.json"),
      """{"event_id":1,"ts":"2024-01-01 10:00:00","user_id":1,"event_type":"view","value":1.0}
        |{"event_id":2,"ts":"2024-01-01 10:01:00","user_id":1,"event_type":"view","value":2.0}""".stripMargin)
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val query = spark.readStream.schema(schema).json(inDir.toString)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, id: Long) =>
        seen.add((id, batch.count()))
        () // foreachBatch sink: arbitrary batch logic (merge, multi-sink)
      }
      .option("checkpointLocation", ckpt.toString)
      .trigger(Trigger.AvailableNow())
      .start()
    // AvailableNow processes the existing backlog then TERMINATES itself
    // (the batch-like run mode for incremental jobs on a schedule)
    query.awaitTermination(60000)
    assert(!query.isActive, "AvailableNow query must self-terminate")
    val total = seen.toArray(Array.empty[(Long, Long)]).map(_._2).sum
    assert(total == 2, s"backlog must be fully drained once, got $seen")
  }

  test("stream-stream join attributes clicks to impressions within the window") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val imps = MemoryStream[Ev]
    val clicks = MemoryStream[Ev]
    val query = StructuredStreams.clickAttribution(
        imps.toDS().toDF(), clicks.toDS().toDF())
      .writeStream.format("memory").queryName("attribution")
      .outputMode("append").start()
    try {
      imps.addData(
        Ev(100, ts("2024-01-01 10:00:00"), 7, "imp", 0),
        Ev(101, ts("2024-01-01 10:00:00"), 8, "imp", 0))
      clicks.addData(
        Ev(200, ts("2024-01-01 10:10:00"), 7, "click", 0), // within 30 min
        Ev(201, ts("2024-01-01 11:00:00"), 7, "click", 0), // outside window
        Ev(202, ts("2024-01-01 10:05:00"), 9, "click", 0)) // no impression
      query.processAllAvailable()
      val got = spark.table("attribution").collect()
        .map(r => (r.getAs[Long]("impression_id"), r.getAs[Long]("click_id")))
        .toSet
      assert(got == Set((100L, 200L)), s"got $got")
    } finally query.stop()
  }

  test("file-source e2e: checkpointed dedup state survives a query restart") {
    import java.nio.file.Files
    val inDir = Files.createTempDirectory("graft_stream_in")
    val outDir = Files.createTempDirectory("graft_stream_out")
    val ckpt = Files.createTempDirectory("graft_stream_ckpt")
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, " +
      "event_type STRING, value DOUBLE"

    def ev(id: Long, t: String): String =
      s"""{"event_id":$id,"ts":"$t","user_id":1,"event_type":"view","value":1.0}"""
    def startQuery() = {
      val in = spark.readStream.schema(schema).json(inDir.toString)
      StructuredStreams.dedupedStream(in)
        .writeStream.format("parquet")
        .option("path", outDir.toString)
        .option("checkpointLocation", ckpt.toString)
        .outputMode("append").start()
    }

    // batch 1: one duplicate within the same file
    Files.writeString(inDir.resolve("b1.json"),
      Seq(ev(1, "2024-01-01 10:00:00"), ev(2, "2024-01-01 10:01:00"),
        ev(2, "2024-01-01 10:01:00")).mkString("\n"))
    val q1 = startQuery()
    q1.processAllAvailable(); q1.stop()

    // batch 2 AFTER a restart: event 2 again (dup across the restart —
    // only checkpointed state can catch it), plus a new event 3
    Files.writeString(inDir.resolve("b2.json"),
      Seq(ev(2, "2024-01-01 10:01:00"), ev(3, "2024-01-01 10:02:00"))
        .mkString("\n"))
    val q2 = startQuery()
    q2.processAllAvailable(); q2.stop()

    val ids = spark.read.parquet(outDir.toString)
      .select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == Seq(1L, 2L, 3L),
      s"dedup across restart must yield 1,2,3 exactly once; got ${ids.toSeq}")
  }

  test("ValueState TTL expires state across runs (ProcessingTime mode, " +
      "Trigger.Once harness)") {
    // ProcessingTime TimeMode makes EVERY micro-batch demand a successor
    // (timers/TTL advance on batch timestamps), so drain-style waits
    // never return: processAllAvailable and Trigger.AvailableNow both
    // spin through empty micro-batches forever (measured: the offsets
    // log grows one batch at a time with the purger holding it at
    // minBatchesToRetain; the round-3 NOTES.md "batch-0 stall" was this
    // loop, not a hang). Trigger.Once runs EXACTLY one batch and
    // self-terminates, which is also what makes processing time
    // DRIVEABLE: each restart stamps a new batch timestamp, so
    // wall-clock between runs is the virtual clock the TTL sees.
    import java.nio.file.Files
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val schema = "event_id LONG, ts TIMESTAMP, user_id LONG, " +
      "event_type STRING, value DOUBLE"
    def ev(id: Long): String =
      s"""{"event_id":$id,"ts":"2024-01-01 10:00:00","user_id":1,"event_type":"view","value":1.0}"""

    def harness(ttlMs: Long) = {
      val inDir = Files.createTempDirectory("ttl_in")
      val outDir = Files.createTempDirectory("ttl_out")
      val ckpt = Files.createTempDirectory("ttl_ckpt")
      (inDir, outDir,
        () => {
          import spark.implicits._
          val in = spark.readStream.schema(schema).json(inDir.toString).as[Ev]
          val q = StructuredStreams.ttlCounts(in, ttlMs)
            .writeStream.format("parquet")
            .option("path", outDir.toString)
            .option("checkpointLocation", ckpt.toString)
            .trigger(org.apache.spark.sql.streaming.Trigger.Once())
            .outputMode("append").start()
          assert(q.awaitTermination(120000), "Trigger.Once batch must finish")
        })
    }

    try {
      // short TTL + sleep past it: the second run's batch timestamp is
      // beyond the expiry, so the count RESTARTS instead of resuming
      val (in1, out1, run1) = harness(ttlMs = 500L)
      Files.writeString(in1.resolve("b1.json"), Seq(ev(1), ev(2)).mkString("\n"))
      run1()
      Thread.sleep(2000)
      Files.writeString(in1.resolve("b2.json"), ev(3))
      run1()
      val expired = spark.read.parquet(out1.toString)
        .orderBy("batch_count").collect().map(_.getAs[Long]("batch_count"))
      assert(expired.toSeq === Seq(1L, 2L),
        "state must expire: counts 2 (run 1) then 1 (run 2 after TTL)")

      // long TTL, no sleep: state survives the restart and the count resumes
      val (in2, out2, run2) = harness(ttlMs = 3600000L)
      Files.writeString(in2.resolve("b1.json"), Seq(ev(1), ev(2)).mkString("\n"))
      run2()
      Files.writeString(in2.resolve("b2.json"), ev(3))
      run2()
      val survived = spark.read.parquet(out2.toString)
        .orderBy("batch_count").collect().map(_.getAs[Long]("batch_count"))
      assert(survived.toSeq === Seq(2L, 3L),
        "state must survive: counts 2 (run 1) then 3 (run 2 within TTL)")
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("batch sessionization splits on the 30-minute gap") {
    import spark.implicits._
    val events = Seq(
      Ev(1, ts("2024-01-01 10:00:00"), 1, "view", 1.0),
      Ev(2, ts("2024-01-01 10:10:00"), 1, "click", 1.0),
      // 40-minute gap -> new session
      Ev(3, ts("2024-01-01 10:50:00"), 1, "view", 1.0),
      Ev(4, ts("2024-01-01 09:00:00"), 2, "view", 1.0)).toDF()
    events.createOrReplaceTempView("___tmp")
    // run the same logic as q31 by pointing the query at a temp dir is
    // overkill here; reuse the Window program inline via the public query
    // on a written parquet copy
    val dir = java.nio.file.Files.createTempDirectory("sess").toString
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val sess = StreamingOps.queries("q31_sessionize")(spark, dir)
      .orderBy("user_id", "session_idx").collect()
    assert(sess.map(r => (r.getAs[Long]("user_id"),
      r.getAs[Long]("session_idx"), r.getAs[Long]("n_events"))).toSeq ===
      Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }
}

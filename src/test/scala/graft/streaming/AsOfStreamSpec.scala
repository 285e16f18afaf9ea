package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermarked stream-stream as-of join
  * ([[StructuredStreams.asofJoinStream]]) — r14 verdict task 5, the
  * point-in-time feature join as a stream. Pins:
  *
  *   1. stream == q62 batch ROW-FOR-ROW on the real events table,
  *      across micro-batch boundaries AND a checkpointed stop/restart
  *      (file source + file sink, parquet so micro-precision
  *      timestamps survive the round trip);
  *   2. bounded state: a long view history per key collapses to ONE
  *      dominating finalized view + the in-flight watermark window —
  *      state rows track the delay, not history length — while a late
  *      probe still matches the collapsed latest view exactly;
  *   3. left-outer semantics: a purchase before any view emits with
  *      null view columns.
  */
class AsOfStreamSpec extends SparkSpec {
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

  /** events → tagged as-of input (purchases side 1, views side 0). */
  private def tagged(): DataFrame =
    graft.ops.Tables.events(spark, sf)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("user_id"), col("ts"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("side"),
        col("event_id").as("id"))

  private def q62Ref(): DataFrame =
    graft.SparkEntry.queries("q62_asof_native")(spark, sf)

  test("stream == q62 across micro-batches and a checkpointed restart") {
    withRocks {
      import spark.implicits._
      val rows = tagged().orderBy(col("ts")).collect()
      val n = rows.length
      assert(n > 100)
      val maxTs = rows.map(_.getTimestamp(1).getTime).max
      // ts-ordered quartile files → 4 micro-batches; nothing is ever
      // late vs the 1 h watermark because batch k+1's rows are all at
      // or above batch k's max. The flush row advances the watermark
      // past every real event so every purchase becomes emittable.
      val inDir = java.nio.file.Files.createTempDirectory("asof_in").toString
      val outDir = java.nio.file.Files.createTempDirectory("asof_out").toString
      val ckpt = java.nio.file.Files.createTempDirectory("asof_ckpt").toString
      def write(name: String, slice: Seq[org.apache.spark.sql.Row]): Unit =
        spark.createDataFrame(
            spark.sparkContext.parallelize(slice, 1), tagged().schema)
          .coalesce(1).write.mode("append").parquet(s"$inDir/$name")
      val q = n / 4
      write("b1", rows.slice(0, q).toSeq)
      write("b2", rows.slice(q, 2 * q).toSeq)
      def start() = StructuredStreams.asofJoinStream(
          spark.readStream
            .schema("user_id BIGINT, ts TIMESTAMP, side INT, id BIGINT")
            .option("maxFilesPerTrigger", "1")
            .parquet(s"$inDir/*").as[AsOfIn])
        .toDF()
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").start()
      val q1 = start()
      try q1.processAllAvailable() finally q1.stop()
      // restart from the checkpoint: pending purchases, buffered views,
      // the collapsed latest view, and the emission timers must all
      // survive recovery
      write("b3", rows.slice(2 * q, 3 * q).toSeq)
      write("b4", rows.slice(3 * q, n).toSeq)
      write("b5_flush", Seq(org.apache.spark.sql.Row(
        0L, new java.sql.Timestamp(maxTs + 30L * 86400 * 1000), -1, 0L)))
      val q2 = start()
      try q2.processAllAvailable() finally q2.stop()

      val got = spark.read.parquet(outDir)
        .select(col("user_id"), col("purchase_id"), col("purchase_ts"),
          col("view_id"), col("view_ts"), col("view_to_purchase_us"))
      val ref = q62Ref()
      assert(got.count() === ref.count(),
        s"stream emitted ${got.count()} rows, batch has ${ref.count()}")
      assert(got.exceptAll(ref).count() === 0,
        "stream produced matches q62 does not have")
      assert(ref.exceptAll(got).count() === 0, "stream missed q62 matches")
      assert(ref.filter(col("view_id").isNotNull).count() > 0,
        "vacuous: no as-of matches at this sf")
      assert(ref.filter(col("view_id").isNull).count() > 0,
        "vacuous: no left-outer misses at this sf")
    }
  }

  test("state stays bounded by the watermark, not by history length") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val base = 1700000000000L
      def t(min: Long) = new java.sql.Timestamp(base + min * 60000)
      // 2000 views a minute apart on ONE key; watermark delay 1 h, so
      // at any instant only ~60 views are in flight — the rest must
      // collapse into the single dominating finalized view
      val views = (0 until 2000).map(i => AsOfIn(7L, t(i.toLong), 0, 1000L + i))
      val input = MemoryStream[AsOfIn]
      val q = StructuredStreams.asofJoinStream(input.toDS(), "1 hour")
        .toDF().writeStream.format("memory").queryName("asof_bounded")
        .outputMode("append").start()
      try {
        views.grouped(500).foreach { g =>
          input.addData(g)
          q.processAllAvailable()
        }
        // a probe AFTER the history (plus a flush to emit it): must
        // match the very latest view even though that view's siblings
        // were all evicted
        input.addData(Seq(AsOfIn(7L, t(2100), 1, 9999L)))
        q.processAllAvailable()
        input.addData(Seq(AsOfIn(0L, t(100000), -1, 0L)))
        q.processAllAvailable()
        val out = spark.table("asof_bounded")
          .filter(col("purchase_id") === 9999L).collect()
        assert(out.length === 1)
        assert(out.head.getAs[Long]("view_id") === 1000L + 1999,
          "probe must match the dominating collapsed view")
        val stateRows = q.recentProgress.flatMap(_.stateOperators)
          .map(_.numRowsTotal).max
        assert(stateRows < 300,
          s"state held $stateRows rows for a 2000-view history — " +
            "eviction is not collapsing finalized views")
      } finally q.stop()
    }
  }

  test("a left row below the watermark is dropped, never mismatched") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val base = 1700000000000L
      def t(min: Long) = new java.sql.Timestamp(base + min * 60000)
      val input = MemoryStream[AsOfIn]
      val q = StructuredStreams.asofJoinStream(input.toDS(), "1 hour")
        .toDF().writeStream.format("memory").queryName("asof_late")
        .outputMode("append").start()
      try {
        // two views, then a flush far ahead: the watermark passes both
        // and the collapse keeps only the dominating view (id 200)
        input.addData(Seq(AsOfIn(3L, t(0), 0, 100L), AsOfIn(3L, t(50), 0, 200L)))
        q.processAllAvailable()
        input.addData(Seq(AsOfIn(0L, t(100000), -1, 0L)))
        q.processAllAvailable()
        // a LATE purchase at t(10): its true match is view 100, which
        // was collapsed away — the processor must DROP it rather than
        // return view 200 (a view from its future)
        input.addData(Seq(AsOfIn(3L, t(10), 1, 9L)))
        q.processAllAvailable()
        input.addData(Seq(AsOfIn(0L, t(200000), -1, 0L)))
        q.processAllAvailable()
        assert(spark.table("asof_late")
          .filter(col("purchase_id") === 9L).count() === 0,
          "late left row must be dropped, not matched against collapsed state")
      } finally q.stop()
    }
  }

  test("purchase before any view emits a left-outer miss") {
    withRocks {
      implicit val sqlCtx = spark.sqlContext
      import spark.implicits._
      val base = 1700000000000L
      val input = MemoryStream[AsOfIn]
      val q = StructuredStreams.asofJoinStream(input.toDS(), "1 hour")
        .toDF().writeStream.format("memory").queryName("asof_miss")
        .outputMode("append").start()
      try {
        input.addData(Seq(
          AsOfIn(1L, new java.sql.Timestamp(base), 1, 11L),
          AsOfIn(1L, new java.sql.Timestamp(base + 1000), 0, 22L),
          AsOfIn(1L, new java.sql.Timestamp(base + 2000), 1, 33L)))
        q.processAllAvailable()
        input.addData(Seq(AsOfIn(0L, new java.sql.Timestamp(base + 10L * 86400 * 1000), -1, 0L)))
        q.processAllAvailable()
        val rows = spark.table("asof_miss").orderBy("purchase_id").collect()
        assert(rows.length === 2)
        assert(rows(0).getAs[Long]("purchase_id") === 11L)
        assert(rows(0).isNullAt(rows(0).fieldIndex("view_id")),
          "purchase before any view must emit null view columns")
        assert(rows(1).getAs[Long]("purchase_id") === 33L)
        assert(rows(1).getAs[Long]("view_id") === 22L)
        assert(rows(1).getAs[Long]("view_to_purchase_us") === 1000000L)
      } finally q.stop()
    }
  }
}

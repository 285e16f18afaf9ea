package graft.ops

import graft.SparkSpec

/** q121/q122 semantics on crafted fixtures: cohort offsets and shares,
  * attribution tie preference and lookback cutoff.
  */
class EventAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("q121: cohorts bucket by first week; shares are exact basis points") {
    val d = java.nio.file.Files.createTempDirectory("cohort_fixtures").toString
    // weeks: 2024-01-01, 01-08, 01-15, 01-22 are Mondays
    Seq(
      (1L, 1L, "view", ts("2024-01-02 10:00:00")), // u1 cohort w0
      (1L, 2L, "view", ts("2024-01-09 10:00:00")), // u1 offset 1
      (1L, 3L, "view", ts("2024-01-23 10:00:00")), // u1 offset 3
      (2L, 4L, "view", ts("2024-01-03 10:00:00")), // u2 cohort w0 only
      (3L, 5L, "view", ts("2024-01-10 10:00:00")), // u3 cohort w1
      (3L, 6L, "view", ts("2024-01-16 10:00:00")) // u3 offset 1
    ).toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val cells = EventAnalytics.queries("q121_cohort_retention")(spark, d)
      .collect().map(r => (r.getAs[java.sql.Date]("cohort_week").toString,
        r.getAs[Long]("week_offset")) ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("cohort_size"),
          r.getAs[Long]("retention_bp"))).toMap
    assert(cells === Map(
      ("2024-01-01", 0L) -> ((2L, 2L, 10000L)),
      ("2024-01-01", 1L) -> ((1L, 2L, 5000L)),
      ("2024-01-01", 3L) -> ((1L, 2L, 5000L)),
      ("2024-01-08", 0L) -> ((1L, 1L, 10000L)),
      ("2024-01-08", 1L) -> ((1L, 1L, 10000L))))
  }

  test("q122: click beats view at the same instant; stale touches go organic") {
    val d = java.nio.file.Files.createTempDirectory("attr_fixtures").toString
    Seq(
      // u1: click and view at the SAME instant, purchase 60 min later
      (1L, 10L, "click", ts("2024-01-01 10:00:00")),
      (1L, 11L, "view", ts("2024-01-01 10:00:00")),
      (1L, 12L, "purchase", ts("2024-01-01 11:00:00")),
      // u2: view 10 days before purchase -> outside the 7-day lookback
      (2L, 20L, "view", ts("2024-01-01 00:00:00")),
      (2L, 21L, "purchase", ts("2024-01-11 00:00:00")),
      // u3: purchase with no touch at all
      (3L, 30L, "purchase", ts("2024-01-05 00:00:00")),
      // u4: view 30 min before purchase
      (4L, 40L, "view", ts("2024-01-02 09:00:00")),
      (4L, 41L, "purchase", ts("2024-01-02 09:30:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = EventAnalytics.queries("q122_attribution")(spark, d)
      .collect().map(r => r.getAs[String]("channel") ->
        (r.getAs[Long]("n_purchases"), r.getAs[Long]("n_users"),
          r.getAs[Long]("sum_minutes_to_touch"))).toMap
    assert(rows === Map(
      "click" -> ((1L, 1L, 60L)),
      "view" -> ((1L, 1L, 30L)),
      "none" -> ((2L, 2L, 0L))))
  }

  test("q123: funnel stages require strict ordering; same-instant does not advance") {
    val d = java.nio.file.Files.createTempDirectory("funnel_fixtures").toString
    Seq(
      // u1: full ordered funnel
      (1L, 10L, "view", ts("2024-01-01 10:00:00")),
      (1L, 11L, "click", ts("2024-01-01 10:30:00")),
      (1L, 12L, "purchase", ts("2024-01-01 11:00:00")),
      // u2: click BEFORE first view -> stops at view stage
      (2L, 20L, "click", ts("2024-01-01 10:00:00")),
      (2L, 21L, "view", ts("2024-01-01 10:30:00")),
      // u3: view then purchase, no click -> stops at view stage
      (3L, 30L, "view", ts("2024-01-01 10:00:00")),
      (3L, 31L, "purchase", ts("2024-01-01 10:30:00")),
      // u4: click at the SAME instant as view -> not strictly after
      (4L, 40L, "view", ts("2024-01-01 10:00:00")),
      (4L, 41L, "click", ts("2024-01-01 10:00:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = EventAnalytics.queries("q123_sequence_funnel")(spark, d)
      .collect().map(r => r.getAs[Int]("stage") ->
        (r.getAs[String]("step"), r.getAs[Long]("n_users"),
          r.getAs[Long]("conv_bp"))).toMap
    assert(rows === Map(
      1 -> (("view", 4L, 10000L)),
      2 -> (("click", 1L, 2500L)),
      3 -> (("purchase", 1L, 10000L))))
  }
}

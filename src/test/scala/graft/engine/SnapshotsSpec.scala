package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2 builds contiguous validity intervals with one open version per key") {
    val versions = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00"), "a"),
      (1L, 11L, ts("2024-02-01 00:00:00"), "b"),
      (1L, 12L, ts("2024-03-01 00:00:00"), "c"),
      (2L, 20L, ts("2024-01-15 00:00:00"), "x")
    ).toDF("k", "vid", "ts", "payload")
    val snap = Snapshots.scd2(versions, "k", "ts", col("vid"))
      .orderBy("k", "valid_from").collect()
    // key 1: a->b->c chained, only c open
    val k1 = snap.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getAs[String]("payload")).toSeq === Seq("a", "b", "c"))
    assert(k1.map(r => Option(r.getAs[java.sql.Timestamp]("valid_to"))).toSeq ===
      Seq(Some(ts("2024-02-01 00:00:00")), Some(ts("2024-03-01 00:00:00")), None))
    assert(k1.map(_.getAs[Int]("is_current")).toSeq === Seq(0, 0, 1))
    // key 2: single version, open
    val k2 = snap.filter(_.getLong(0) == 2L)
    assert(k2.length === 1 && k2.head.getAs[Int]("is_current") === 1)
  }

  test("scd2 same-timestamp versions order by the tie column deterministically") {
    val t0 = ts("2024-01-01 00:00:00")
    val versions = Seq((1L, 2L, t0, "later-id"), (1L, 1L, t0, "earlier-id"))
      .toDF("k", "vid", "ts", "payload")
    val snap = Snapshots.scd2(versions, "k", "ts", col("vid"))
      .orderBy("vid").collect()
    assert(snap.head.getAs[Int]("is_current") === 0) // vid 1 closed by vid 2
    assert(snap.last.getAs[Int]("is_current") === 1)
  }

  test("incrementalMerge: newer batch rows replace, ties keep the existing row") {
    val existing = Seq(
      (1L, ts("2024-01-01 00:00:00"), "old-1"),
      (2L, ts("2024-01-01 00:00:00"), "old-2")
    ).toDF("k", "v", "payload")
    val batch = Seq(
      (1L, ts("2024-02-01 00:00:00"), "new-1"), // newer -> replaces
      (2L, ts("2024-01-01 00:00:00"), "same-ts-2"), // tie -> existing wins
      (3L, ts("2024-01-05 00:00:00"), "new-3") // new key -> appended
    ).toDF("k", "v", "payload")
    val merged = Snapshots.incrementalMerge(existing, batch, "k", "v", col("payload"))
      .orderBy("k").collect().map(_.getAs[String]("payload")).toSeq
    assert(merged === Seq("new-1", "old-2", "new-3"))
  }

  test("q120: point-in-time probe picks the version valid at probe instant") {
    val d = java.nio.file.Files.createTempDirectory("pit_fixtures").toString
    // user 1 transitions A(day0) -> B(day5) -> C(day10); probe is
    // min(day)+7 = day7, so the as-was state must be B with a covering
    // interval [day5, day10). user 2 has one open version.
    Seq(
      (1L, 101L, "A", ts("2024-01-01 00:00:00")),
      (1L, 102L, "B", ts("2024-01-06 00:00:00")),
      (1L, 103L, "C", ts("2024-01-11 00:00:00")),
      (2L, 201L, "X", ts("2024-01-01 00:00:00"))
    ).toDF("user_id", "event_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = Snapshots.queries("q120_point_in_time")(spark, d)
      .orderBy("user_id").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("state_event_id") === 102L)
    assert(rows(0).getAs[String]("state_at_probe") === "B")
    assert(rows(0).getAs[Int]("interval_covers") === 1)
    assert(rows(1).getAs[Long]("state_event_id") === 201L)
    assert(rows(1).getAs[String]("state_at_probe") === "X")
    assert(rows(1).getAs[Int]("interval_covers") === 1)
  }
}

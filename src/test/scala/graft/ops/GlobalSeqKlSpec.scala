package graft.ops

import graft.SparkSpec
import java.sql.Timestamp

/** Semantics for the scalable global row-number (q149) and the
  * mixture-drift KL monitor (q150).
  */
class GlobalSeqKlSpec extends SparkSpec {

  test("q149: offsets + local ranks equal the single-window ROW_NUMBER") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("seq_fixtures").toString
    // ids deliberately unsorted and sparse across the range
    val ids = Seq(907L, 3L, 501L, 44L, 8000L, 2L, 77L, 600L, 9L, 1234L)
    ids.zipWithIndex.map { case (id, i) =>
      (id, Timestamp.valueOf("2024-01-01 00:00:00"), i.toLong,
        if (i % 2 == 0) "purchase" else "view", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = graft.SparkEntry.queries("q149_global_rownumber")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val purchases = ids.zipWithIndex.filter(_._2 % 2 == 0).map(_._1).sorted
    val expected = purchases.zipWithIndex
      .map { case (id, i) => id -> (i + 1).toLong }.toMap
    assert(got == expected)
  }

  test("q155: split boundaries are half-open and leakage counts cross-split users") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("split_fixtures").toString
    def ev(id: Long, ts: String, user: Long) =
      (id, Timestamp.valueOf(ts), user, "view", 1.0, "{}")
    Seq(
      ev(1, "2024-01-05 00:00:00", 1),  // train
      ev(2, "2024-01-22 00:00:00", 1),  // val → user 1 leaks train∩val
      ev(3, "2024-01-19 23:59:59", 2),  // train only (boundary-exclusive)
      ev(4, "2024-01-20 00:00:00", 3),  // exactly t1 → val (half-open)
      ev(5, "2024-01-28 00:00:00", 4))  // test only
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val got = graft.SparkEntry.queries("q155_temporal_split")(spark, d)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("events_train") == 2 && got("events_val") == 2 &&
      got("events_test") == 1)
    assert(got("users_train") == 2 && got("users_val") == 2 &&
      got("users_test") == 1)
    assert(got("leak_train_val") == 1 && got("leak_val_test") == 0 &&
      got("leak_train_test") == 0)
  }

  test("q150: uniform sources have zero KL; a skewed source drifts") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("kl_fixtures").toString
    // s0 matches the corpus mix exactly once s1 mirrors it; s1 is all-"de"
    val rows =
      (1 to 8).map(i => (i.toLong, s"text $i", if (i <= 4) "en" else "de", "s0")) ++
      (9 to 16).map(i => (i.toLong, s"text $i", "de", "s1"))
    rows.map { case (id, t, lang, src) => (id, t, lang, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val got = graft.SparkEntry.queries("q150_mixture_drift")(spark, d)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Double]("kl_nats"),
          r.getAs[Boolean]("drifted"))).toMap
    // corpus: en 4/16, de 12/16. s0: en 1/2 de 1/2; s1: de 1.
    // KL(s1‖corpus) = ln(16/12) ≈ 0.2877 > 0.2 → drifted
    assert(got("s1")._1 == 8)
    assert(math.abs(got("s1")._2 - math.log(16.0 / 12)) < 1e-5)
    assert(got("s1")._3, "all-de source must drift against a 25/75 corpus")
    // KL(s0‖corpus) = ½ln(8/4·... ) — positive but under the 0.2 floor
    assert(got("s0")._2 > 0 && !got("s0")._3)
  }
}

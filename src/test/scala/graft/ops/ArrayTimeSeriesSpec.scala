package graft.ops

import graft.SparkSpec
import java.sql.{Date, Timestamp}

/** Edge semantics for the array/time-series families (q101–q105, q108)
  * on adversarial fixtures: multi-space text, empty tokens, gap days,
  * shared passages, sub-window documents, and skewed keys.
  */
class ArrayTimeSeriesSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("array_ts_fixtures").toString
    Seq(
      // doc 10: 9 tokens with messy whitespace (leading, double space)
      (10L, "  a b  c d e f g h x", "en", "s0", 20L),
      // doc 20: tokens 2..9 equal doc 10's tokens 1..8 → one shared span
      (20L, "z a b c d e f g h", "en", "s0", 17L),
      // doc 30: shorter than the span window → exactly one truncated span
      (30L, "s t u", "fr", "s1", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    Seq(
      // user 1: active Jan 1 and Jan 4 → spine must densify Jan 2–3
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", 2.5, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 11:00:00"), 1L, "view", 1.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-04 09:00:00"), 1L, "buy", 1.25, "{}"),
      // user 2: single day → one spine row, staleness 0
      (4L, Timestamp.valueOf("2024-01-02 08:00:00"), 2L, "view", -0.5, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    // skew fixture: key 7 is 80% hot (8 rows), keys 1..2 get one each
    (Seq.fill(8)(7L) ++ Seq(1L, 2L)).zipWithIndex
      .map { case (k, i) => (i.toLong, k) }
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("q101: whitespace runs collapse, positions are 1-based, empties dropped") {
    val rows = ArrayOps.queries("q101_token_explode")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("pos")) ->
        r.getAs[String]("token")).toMap
    assert(rows((10L, 1)) === "a") // leading spaces trimmed
    assert(rows((10L, 3)) === "c") // double space is one separator
    assert(rows((10L, 9)) === "x")
    assert(!rows.keys.exists { case (d, p) => d == 10L && p > 9 })
    assert(rows((30L, 3)) === "u")
  }

  test("q103: doc ids aggregate in numeric order regardless of collect order") {
    val rows = ArrayOps.queries("q103_listagg")(spark, dir)
      .collect().map(r => (r.getAs[String]("lang"), r.getAs[String]("source")) ->
        r.getAs[String]("doc_ids")).toMap
    assert(rows(("en", "s0")) === "10,20")
    assert(rows(("fr", "s1")) === "30")
  }

  test("q104: gap days densified, value carried forward, staleness counted") {
    val rows = TimeSeriesOps.queries("q104_forward_fill")(spark, dir)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[Date]("day").toString) -> r).toMap
    assert(rows.size === 5) // user 1: Jan 1–4 (4 rows); user 2: 1 row
    val jan2 = rows((1L, "2024-01-02"))
    assert(jan2.isNullAt(jan2.fieldIndex("day_grid"))) // no real observation
    assert(jan2.getAs[Long]("filled_grid") === 3500000L) // 2.5 + 1.0 carried
    assert(jan2.getAs[Int]("staleness_days") === 1)
    assert(rows((1L, "2024-01-03")).getAs[Int]("staleness_days") === 2)
    val jan4 = rows((1L, "2024-01-04"))
    assert(jan4.getAs[Long]("filled_grid") === 1250000L) // fresh observation
    assert(jan4.getAs[Int]("staleness_days") === 0)
    // negative values floor on the grid: -0.5 → -500000
    assert(rows((2L, "2024-01-02")).getAs[Long]("filled_grid") === -500000L)
  }

  test("q105: cross-doc shared span flags the later doc; short doc gets one span") {
    val rows = graft.text.DedupOps.queries("q105_repeated_spans")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 10: 9 tokens → 2 spans, both first occurrences
    assert(rows(10L).getAs[Long]("n_spans") === 2L)
    assert(rows(10L).getAs[Long]("n_dup_spans") === 0L)
    // doc 20: spans [z..g] fresh, [a..h] already seen in doc 10 → 1 dup
    assert(rows(20L).getAs[Long]("n_spans") === 2L)
    assert(rows(20L).getAs[Long]("n_dup_spans") === 1L)
    assert(rows(20L).getAs[Long]("dup_ratio_grid") === 500000L)
    // doc 30: 3 tokens < window → exactly one truncated span, no dup
    assert(rows(30L).getAs[Long]("n_spans") === 1L)
    assert(rows(30L).getAs[Long]("n_dup_spans") === 0L)
  }

  test("q108: hottest key leads with exact grid share and skew coefficient") {
    val rows = ProfilingOps.queries("q108_key_skew")(spark, dir).collect()
    assert(rows.head.getAs[Long]("key") === 7L)
    assert(rows.head.getAs[Long]("cnt") === 8L)
    // share = 8 * 1e6 div 10 rows = 800000; skew = 8 * 3 keys * 1e6 div 10
    assert(rows.head.getAs[Long]("share_grid") === 800000L)
    assert(rows.head.getAs[Long]("skew_grid") === 2400000L)
    // deterministic tie-break between the two 1-count keys
    assert(rows.map(_.getAs[Long]("key")).toSeq === Seq(7L, 1L, 2L))
  }
}

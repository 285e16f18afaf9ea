package graft.text

import graft.SparkSpec

/** q226 exact cross-document substring dedup: character-level 40-char
  * windows, cross-doc-only semantics, interval-union removal coverage,
  * and the rolling-hash kernel's agreement with substr.
  */
class SubstringDedupSpec extends SparkSpec {

  // 50 DISTINCT characters → every 40-char window inside is unique
  private val shared =
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmn"

  test("q226: a 50-char run shared by two docs yields 11 duplicated " +
      "windows per doc and exactly 50 chars of removal coverage; " +
      "within-doc repetition and short docs are excluded") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ssdedup_fix").toString
    Seq(
      // shared run at offset 0 + a unique tail
      (1L, shared + "#u1#u1#u1#u1", "en", "s", 62L),
      // same run at offset 6 (different position — positions don't
      // matter, text equality does)
      (2L, "%%p2%%" + shared + "@v2", "en", "s", 59L),
      // WITHIN-doc repeated 40-char spans, but only one doc → excluded
      (3L, "qrst" * 20, "en", "s", 80L),
      // shorter than the span length → no windows at all
      (4L, "short", "en", "s", 5L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")

    val rows = DedupOps.queries("q226_substring_dedup")(spark, d)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_dup_positions"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("dup_chars_removed")))).toMap
    // 50-char run → 11 window starts; coverage = 40 + 10×1 = 50
    assert(rows === Map(
      1L -> ((11L, 11L, 50L)),
      2L -> ((11L, 11L, 50L))))
  }

  test("q233: only BATCH positions matching HISTORY count — " +
      "history-internal and batch-internal duplication is excluded") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("ssinc_fix").toString
    val shared2 = shared.reverse // a second 50-distinct-char run
    val batchRun = "zyxwvutsrqponZYXWVUTSRQPONMLKJIHGFEDCBA_-+=~<>[]{}".take(50)
    Seq(
      // batch doc 1 matches history doc 4's run → 11 positions, 50 chars
      (1L, "%%p1%%" + shared + "@v1", "en", "s", 59L),
      (4L, shared + "#h4#h4#h4#h4", "en", "s", 62L),
      // history-internal duplication (docs 2 and 3): excluded
      (2L, shared2 + "#h2#h2#h2#h2", "en", "s", 62L),
      (3L, "%%p3%%" + shared2 + "@v3", "en", "s", 59L),
      // batch-internal duplication (docs 5 and 9, run absent from
      // history): excluded — the increment dedups against HISTORY
      (5L, batchRun + "#b5#b5#b5#b5", "en", "s", 62L),
      (9L, "%%p9%%" + batchRun + "@v9", "en", "s", 59L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = DedupOps.queries("q233_incremental_substring_dedup")(spark, d)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_dup_positions"), r.getAs[Long]("n_dup_spans"),
          r.getAs[Long]("dup_chars_removed")))).toMap
    assert(rows === Map(1L -> ((11L, 11L, 50L))))
  }

  test("rolling_span_hashes agrees with substr: equal windows hash " +
      "equal, and the window count is length - span + 1 by code point") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("abcdefghij", 3),          // plain ascii
      ("ab", 3),                  // shorter than span → empty
      ("aéébéab", 3) // non-ascii, 7 code points
    ).toDF("t", "n")
    val got = df.select(col("t"),
      graft.catalyst.GraftFunctions.rollingSpanHashes(col("t"), 3).as("h"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(got("ab").isEmpty)
    assert(got("abcdefghij").length === 8)
    val cps = "aéébéab"
    assert(got(cps).length === cps.length - 2) // all BMP, length == cps
    // identical 3-grams at different offsets hash identically:
    // "aéé"? no — use "ab" prefix/suffix: windows 'éab' vs ... build
    // explicit equality from a string with a repeated trigram
    val rep = "xyz123xyz"
    val h = df.sparkSession.range(1).select(
      graft.catalyst.GraftFunctions.rollingSpanHashes(lit(rep), 3).as("h"))
      .head.getSeq[Long](0)
    assert(h(0) === h(6), "repeated trigram must hash equal")
    assert(h.distinct.length === h.length - 1, "only the repeat collides")
  }
}

package graft.text

import graft.SparkSpec
import java.sql.Timestamp

/** q116–q118 semantics on constructed fixtures: transition counting
  * with tie-broken ordering, the zero-chi-square independence case,
  * and trigram/continuation counting with sub-window docs.
  */
class CorpusStatsSpec extends SparkSpec {

  test("q116: per-user ordered transitions; single-event users emit none") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("transitions").toString
    Seq(
      (1L, Timestamp.valueOf("2024-01-01 10:00:00"), 1L, "view", 1.0, "{}"),
      (2L, Timestamp.valueOf("2024-01-01 10:01:00"), 1L, "click", 1.0, "{}"),
      (3L, Timestamp.valueOf("2024-01-01 10:02:00"), 1L, "view", 1.0, "{}"),
      // same timestamp: event_id tie-break orders 4 before 5
      (4L, Timestamp.valueOf("2024-01-01 11:00:00"), 2L, "view", 1.0, "{}"),
      (5L, Timestamp.valueOf("2024-01-01 11:00:00"), 2L, "purchase", 1.0, "{}"),
      (6L, Timestamp.valueOf("2024-01-01 12:00:00"), 3L, "error", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = CorpusStats.queries("q116_transitions")(spark, d)
      .collect().map(r => (r.getAs[String]("prev_type"),
        r.getAs[String]("curr_type")) -> r.getAs[Long]("n")).toMap
    assert(rows === Map(("view", "click") -> 1L, ("click", "view") -> 1L,
      ("view", "purchase") -> 1L))
  }

  test("q117: proportional contingency table yields exactly zero chi-square") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("chisq").toString
    // day 1 and day 2 buckets; view:click = 2:1 in both → independent
    val ev = Seq(
      ("view", "2024-01-01"), ("view", "2024-01-01"), ("click", "2024-01-01"),
      ("view", "2024-01-02"), ("view", "2024-01-02"), ("click", "2024-01-02"))
    ev.zipWithIndex.map { case ((t, day), i) =>
        (i.toLong, Timestamp.valueOf(s"$day 10:00:00"), 1L, t, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val rows = CorpusStats.queries("q117_chi_square")(spark, d)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(rows("view").getAs[Double]("chi2_contrib") === 0.0)
    assert(rows("click").getAs[Double]("chi2_contrib") === 0.0)
    assert(rows("view").getAs[Long]("row_n") === 4L)
    assert(rows("view").getAs[Long]("n_cells") === 2L)
  }

  test("q118: trigram and continuation counts; sub-window docs emit none") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("trigrams").toString
    Seq((1L, "a b c a b c", "en", "s", 11L),
      (2L, "x y", "en", "s", 3L)) // < 3 tokens → zero trigrams
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = CorpusStats.queries("q118_trigram_counts")(spark, d).collect()
    val top = rows.head
    assert(top.getAs[String]("context") === "a b")
    assert(top.getAs[String]("nxt") === "c")
    assert(top.getAs[Long]("n") === 2L)
    assert(top.getAs[Long]("continuations") === 1L)
    assert(top.getAs[Long]("context_n") === 2L)
    assert(rows.length === 3) // "a b"→c, "b c"→a, "c a"→b; nothing from doc 2
  }

  test("q124: posting lists are capped, sorted; df/tf exact; order by df desc") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("invidx").toString
    // 25 docs of "z" (df over the postings cap), plus a 3-doc tail corpus
    val hot = (1L to 25L).map(i => (i, "z", "en", "s", 1L))
    val tail = Seq((26L, "a b a", "en", "s", 5L), (27L, "a c", "en", "s", 3L),
      (28L, "c c c", "en", "s", 5L))
    (hot ++ tail).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = CorpusStats.queries("q124_inverted_index")(spark, d).collect()
    assert(rows.map(_.getAs[String]("term")).toSeq === Seq("z", "a", "c", "b"))
    val byTerm = rows.map(r => r.getAs[String]("term") -> r).toMap
    assert(byTerm("z").getAs[Long]("doc_freq") === 25L)
    assert(byTerm("z").getAs[Long]("total_freq") === 25L)
    // cap: only the first PostingsCap sorted doc ids survive
    assert(byTerm("z").getAs[String]("postings") ===
      (1L to CorpusStats.PostingsCap.toLong).mkString(","))
    assert(byTerm("a").getAs[Long]("doc_freq") === 2L)
    assert(byTerm("a").getAs[Long]("total_freq") === 3L)
    assert(byTerm("a").getAs[String]("postings") === "26,27")
    assert(byTerm("c").getAs[Long]("total_freq") === 4L)
    assert(byTerm("b").getAs[String]("postings") === "26")
  }

  test("q139: MinHash estimate honors bound; identical vocab estimates exactly 1") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("srcminhash").toString
    // A and B share all 10 tokens (J=1); C overlaps A in 5 of 15 (J=1/3);
    // D is disjoint from everyone (pairs with D must be absent)
    val vocabA = (0 until 10).map(i => s"tok$i").mkString(" ")
    val vocabC = ((5 until 10) ++ (100 until 110)).map(i => s"tok$i").mkString(" ")
    Seq((1L, vocabA, "en", "srcA", 60L), (2L, vocabA, "en", "srcB", 60L),
      (3L, vocabC, "en", "srcC", 90L), (4L, "zzz yyy", "en", "srcD", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = CorpusStats.queries("q139_source_minhash_similarity")(spark, d)
      .collect()
      .map(r => (r.getAs[String]("source_a"), r.getAs[String]("source_b")) -> r)
      .toMap
    assert(rows.keySet === Set(("srcA", "srcB"), ("srcA", "srcC"),
      ("srcB", "srcC")), "disjoint srcD pairs must be absent")
    assert(rows(("srcA", "srcB")).getAs[Double]("jaccard") === 1.0)
    assert(rows(("srcA", "srcC")).getAs[Double]("jaccard") === 0.25)
    rows.values.foreach(r => assert(r.getAs[Boolean]("within_bound")))
  }

  test("q139: estimator deviation on real data stays well inside the gate bound") {
    import org.apache.spark.sql.functions._
    // all 190 pairs must be within HALF the gate bound — a pass with real
    // margin, not a boundary graze (the estimator is deterministic, so
    // this is a stable property of the fixed xxhash64 family)
    val margin = CorpusStats.sourceMinhashPairs(spark, "/root/testdata/sf0.001")
      .select(max(abs(col("est_jaccard") - col("jaccard"))).as("m"),
        count(lit(1)).as("n"))
      .head()
    assert(margin.getAs[Long]("n") === 190L)
    assert(margin.getAs[Double]("m") <= CorpusStats.MinhashJaccardBound / 2,
      s"max |est - exact| = ${margin.getAs[Double]("m")}")
  }
}

package graft.text

import graft.SparkSpec

/** Semantics for the incremental near-dup screen (q151) and shingle
  * novelty (q152) on a corpus with a known duplicate structure.
  */
class IncrementalNoveltySpec extends SparkSpec {

  // doc 5 and 10 arrive "today" (id % 5 == 0); 1/2/3 are history.
  // 5 duplicates history docs 1 AND 2 (2 is itself a copy of 1);
  // 10 shares nothing with history.
  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("incr_novel_fixtures").toString
    val dup = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      (1L, dup, "en", "s0"),
      (2L, dup, "en", "s0"),
      (3L, "one two three four five six seven eight", "en", "s0"),
      (5L, dup, "en", "s1"),
      (10L, "nine ten eleven twelve thirteen fourteen fifteen sixteen", "en", "s1"))
      .map { case (id, t, l, src) => (id, t, l, src, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q151: a duplicate increment matches its OLDEST history twin; novel docs are absent") {
    val rows = graft.SparkEntry.queries("q151_incremental_neardup")(spark, dir)
      .collect().map(r => (r.getAs[Long]("doc_new"), r.getAs[Long]("doc_hist"),
        r.getAs[Double]("jaccard")))
    assert(rows.length == 1, s"exactly one screened hit, got ${rows.toSeq}")
    // ties at jaccard 1.0 between history docs 1 and 2 → oldest (1) wins
    assert(rows.head == ((5L, 1L, 1.0)))
  }

  test("q152: first owner gets full novelty, verbatim copies get zero") {
    val nov = graft.SparkEntry.queries("q152_shingle_novelty")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_novel"), r.getAs[Long]("n_shingles"),
          r.getAs[Double]("novelty"))).toMap
    assert(nov(1L)._3 == 1.0, "doc 1 coined every one of its shingles")
    assert(nov(2L)._3 == 0.0 && nov(5L)._3 == 0.0, "copies coin nothing")
    assert(nov(3L)._3 == 1.0 && nov(10L)._3 == 1.0)
    assert(nov(1L)._1 == nov(1L)._2)
  }
}

package graft.text

import graft.SparkSpec

/** Semantics for sequence-length bucketing (q153) and the vocabulary
  * coverage curve (q154) on hand-computed corpora.
  */
class BucketsCoverageSpec extends SparkSpec {

  private def corpus(texts: Seq[String]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("bc_fixtures").toString
    texts.zipWithIndex.map { case (t, i) =>
      (i.toLong + 1, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q153: docs land in next-power-of-two buckets with exact waste") {
    val d = corpus(Seq(
      "a b c",                                   // 3 tokens  → bucket 8
      Seq.fill(10)("w").mkString(" "),           // 10 tokens → bucket 16
      Seq.fill(16)("x").mkString(" "),           // 16 tokens → bucket 16
      Seq.fill(100)("y").mkString(" ")))         // 100       → bucket 128
    val rows = graft.SparkEntry.queries("q153_length_buckets")(spark, d)
      .collect().map(r => r.getAs[Long]("bucket") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
          r.getAs[Long]("padded_tokens"), r.getAs[Long]("wasted_tokens")))
      .toMap
    assert(rows(8L) == ((1L, 3L, 8L, 5L)))
    assert(rows(16L) == ((2L, 26L, 32L, 6L)))    // 10+16 padded to 2×16
    assert(rows(128L) == ((1L, 100L, 128L, 28L)))
    assert(rows.size == 3)
  }

  test("q154: top-k occurrence coverage on a known Zipf-ish corpus") {
    // word w%02d appears (13-i) times: counts 12,11,…,1; T = 78
    val words = (1 to 12).flatMap(i => Seq.fill(13 - i)(f"w$i%02d"))
    val d = corpus(Seq(words.mkString(" ")))
    val rows = graft.SparkEntry.queries("q154_vocab_coverage")(spark, d)
      .collect().map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("cum_tokens"), r.getAs[Long]("total_tokens"),
          r.getAs[Double]("coverage"))).toMap
    // vocab is 12 entries, so k=5 and k=10 materialize, k=25 does not
    assert(rows.keySet == Set(5L, 10L))
    assert(rows(5L)._1 == (8 to 12).sum)         // top-5 counts 12..8
    assert(rows(10L)._1 == (3 to 12).sum)        // top-10 counts 12..3
    assert(rows(10L)._2 == 78L)
    assert(rows(10L)._3 == (3 to 12).sum.toDouble / 78)
  }
}

package graft.text

import graft.SparkSpec

/** Hand-computed semantics for the bigram-LM perplexity filter (q141),
  * the hashed-feature classifier (q142), and sorted-neighborhood
  * blocking (q143) on tiny adversarial corpora.
  */
class LmClassifierSnmSpec extends SparkSpec {

  private def corpus(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("lm_snm_fixtures").toString
    rows.map { case (id, text) => (id, text, "en", "s0", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q141: add-one bigram log-probs on the exact micro grid") {
    val d = corpus(Seq(10L -> "a b", 20L -> "a b", 30L -> "a c"))
    // model: c(a,b)=2 c(a,c)=1 c1(a)=3 V=3
    // p(b|a) = (2+1)/(3+3) = 0.5;  p(c|a) = (1+1)/(3+3) = 1/3
    val rows = graft.SparkEntry.queries("q141_lm_perplexity")(spark, d)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logp"),
          r.getAs[Boolean]("low_quality"))).toMap
    assert(rows(10L)._1 == 1 && rows(20L)._1 == 1 && rows(30L)._1 == 1)
    assert(rows(10L)._2 == math.round(math.log(0.5) * 1e6) / 1e6)
    assert(rows(30L)._2 == math.round(math.log(1.0 / 3) * 1e6) / 1e6)
    assert(rows.values.forall(!_._3))   // nothing near the -7.5 floor
  }

  test("q141: single-token documents carry no bigrams and drop out") {
    val d = corpus(Seq(1L -> "only", 2L -> "two words"))
    val ids = graft.SparkEntry.queries("q141_lm_perplexity")(spark, d)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids == Set(2L))
  }

  test("q142: score is the exact integer weight sum over 1000·n") {
    val d = corpus(Seq(1L -> "ab ab", 2L -> "ab"))
    // fp("ab") = 97·131 + 98 = 12805; bucket = 12805 mod 4096 = 517
    // weight = (517·2654435761 + 12345) mod 2001 − 1000
    val w = ((BigInt(517) * BigInt(2654435761L) + 12345) % 2001 - 1000).toLong
    val rows = graft.SparkEntry.queries("q142_hashed_classifier")(spark, d)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("score"),
          r.getAs[Boolean]("positive"))).toMap
    assert(rows(1L)._1 == 2 && rows(2L)._1 == 1)
    assert(rows(2L)._2 == w.toDouble / 1 / 1000.0)
    assert(rows(1L)._2 == (2.0 * w) / 2 / 1000.0)
    assert(rows(2L)._3 == (w > 0))
  }

  test("q143: neighbors pair within a block, far suffixes and foreign blocks don't") {
    val d = corpus(Seq(
      1L -> "PREFIX__ alpha beta gamma",
      2L -> "PREFIX__ alpha beta gamm",     // dist 1 from doc 1
      3L -> "PREFIX__ alpha XXXXXXXXXXXXXXXXXXXXXXXX", // > SnmMaxDist from both
      4L -> "ZZZZZZZZ alpha beta gamma"))   // other block: never paired
    val pairs = graft.SparkEntry.queries("q143_sorted_neighborhood")(spark, d)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("dist"))).toSet
    // sort inside block PREFIX__ by (key, id): doc2 ("…gamm") < doc1
    // ("…gamma") < doc3 ("…XXXX…" sorts on 'X' > 'b'? no: compare after
    // "alpha " — 'X' < 'b' in ASCII, so doc3 sorts FIRST)
    assert(pairs.exists(p => Set(p._1, p._2) == Set(1L, 2L) && p._3 == 1))
    assert(!pairs.exists(p => Set(p._1, p._2).contains(4L)))
    assert(pairs.forall(_._3 <= DedupOps.SnmMaxDist))
  }

  test("q143: every sorted successor within the window is compared") {
    val d = corpus(Seq(
      1L -> "SAMEBLOK aaaa",
      2L -> "SAMEBLOK aaab",
      3L -> "SAMEBLOK aaac"))
    val pairs = graft.SparkEntry.queries("q143_sorted_neighborhood")(spark, d)
      .collect().map(r => Set(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet
    assert(pairs == Set(Set(1L, 2L), Set(1L, 3L), Set(2L, 3L)))
  }
}

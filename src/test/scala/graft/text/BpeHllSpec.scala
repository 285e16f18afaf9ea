package graft.text

import graft.SparkSpec

/** Hand-computed BPE merge learning (q145) on the textbook low/lower/
  * lowest corpus, and HLL sketch-union semantics (q146) — the merged
  * estimate must dedupe cross-source overlap, not add it.
  */
class BpeHllSpec extends SparkSpec {

  private def corpus(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("bpe_hll_fixtures").toString
    rows.map { case (id, text, src) => (id, text, "en", src, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q145: merges follow weighted pair counts with lexicographic ties") {
    // vocab: low×3, lower×1, lowest×1
    val d = corpus(Seq((1L, "low low lower", "s0"), (2L, "low lowest", "s0")))
    val merges = graft.SparkEntry.queries("q145_bpe_merges")(spark, d)
      .orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("pair_a"),
        r.getAs[String]("pair_b"), r.getAs[Long]("n")))
    // round 1: (l,o) and (o,w) tie at 5 → lexicographic picks (l,o);
    // round 2: (lo,w)=5; round 3: (low,e)=2
    assert(merges.toSeq == Seq(
      (1, "l", "o", 5L), (2, "lo", "w", 5L), (3, "low", "e", 2L)))
  }

  test("q145: leftmost-first merging never overlaps (aaa → [aa, a])") {
    // vocab: aaa×2, ab×1 — round 1 pairs: (a,a)=4, (a,b)=1 → merge (a,a);
    // round 2 on " aa a ", " a b ": pairs (aa,a)=2, (a,b)=1 → (aa,a)
    val d = corpus(Seq((1L, "aaa aaa ab", "s0")))
    val merges = graft.SparkEntry.queries("q145_bpe_merges")(spark, d)
      .orderBy("round").collect()
      .map(r => (r.getAs[Int]("round"), r.getAs[String]("pair_a"),
        r.getAs[String]("pair_b"), r.getAs[Long]("n")))
    assert(merges(0) == (1, "a", "a", 4L))
    assert(merges(1) == (2, "aa", "a", 2L))
  }

  test("q146: union dedupes cross-source overlap and bounds hold") {
    // s0 vocab {x,y,z}, s1 vocab {y,z,q} → global 4 distinct, not 6
    val d = corpus(Seq((1L, "x y z", "s0"), (2L, "y z q", "s1")))
    val rows = graft.SparkEntry.queries("q146_hll_union")(spark, d)
      .collect().map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("exact_tokens"), r.getAs[Boolean]("within_bound")))
      .toMap
    assert(rows("s0")._1 == 3 && rows("s1")._1 == 3)
    assert(rows("ALL")._1 == 4)
    assert(rows.values.forall(_._2), "small-cardinality HLL must be exact-ish")
  }
}

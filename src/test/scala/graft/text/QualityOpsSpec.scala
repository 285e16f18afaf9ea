package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q93/q94 edge semantics on adversarial fixtures: degenerate documents
  * (one repeated token, empty text) and exact benchmark overlap. */
class QualityOpsSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("quality_fixtures").toString
    Seq(
      // doc 0: benchmark slice (0 % 23 == 0), identical text to doc 1
      (0L, "alpha beta gamma delta epsilon zeta", "en", "s0", 35L),
      // doc 1: fully contaminated copy of the benchmark doc
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s1", 35L),
      // doc 2: one token repeated — repetition filter must drop it
      (2L, "spam spam spam spam spam spam", "en", "s2", 29L),
      // doc 3: empty text (degenerate: one empty token after split)
      (3L, "", "en", "s3", 0L),
      // doc 4: varied text, no benchmark overlap
      (4L, "one two three four five six seven eight", "en", "s4", 39L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("repetition: repeated-token doc dropped, varied doc kept, empty doc dropped") {
    val rows = QualityOps.queries("q93_repetition_quality")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // doc 2: 6 tokens, 5 bigrams all "spam spam" → dup=4, top=6
    assert(rows(2L).getAs[Int]("n_bigrams") === 5)
    assert(rows(2L).getAs[Int]("dup_bigrams") === 4)
    assert(rows(2L).getAs[Long]("top_term_count") === 6L)
    assert(rows(2L).getAs[Int]("keep_flag") === 0)
    // doc 4: all distinct → keep
    assert(rows(4L).getAs[Int]("dup_bigrams") === 0)
    assert(rows(4L).getAs[Int]("keep_flag") === 1)
    // doc 3: split("") → one empty token, zero bigrams, top ratio 1 → drop
    assert(rows(3L).getAs[Int]("n_tokens") === 1)
    assert(rows(3L).getAs[Int]("n_bigrams") === 0)
    assert(rows(3L).getAs[Double]("dup_bigram_ratio") === 0.0)
    assert(rows(3L).getAs[Int]("keep_flag") === 0)
  }

  test("contamination: exact benchmark copy flags 1.0, disjoint doc flags 0") {
    val rows = QualityOps.queries("q94_contamination")(spark, dir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // benchmark doc 0 itself is excluded from the corpus output
    assert(!rows.contains(0L))
    assert(rows(1L).getAs[Double]("contamination_ratio") === 1.0)
    assert(rows(1L).getAs[Int]("contaminated_flag") === 1)
    assert(rows(4L).getAs[Long]("n_contaminated") === 0L)
    assert(rows(4L).getAs[Int]("contaminated_flag") === 0)
    // degenerate docs (< 3 tokens) have no shingles and never flag
    assert(rows(3L).getAs[Int]("n_shingles") === 0)
    assert(rows(3L).getAs[Int]("contaminated_flag") === 0)
  }
}

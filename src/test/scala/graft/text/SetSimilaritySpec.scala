package graft.text

import graft.SparkSpec

/** q114/q115 semantics: exact prefix-filtered Jaccard join on
  * constructed shingle overlaps, and snapshot-diff classification.
  */
class SetSimilaritySpec extends SparkSpec {

  test("q114: near-identical docs pair with exact jaccard; disjoint docs don't") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("simjoin_fixtures").toString
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      (1L, base, "en", "s", 10L),
      // last word changed: 8 shingles each, 7 shared → J = 7/9 ≥ 0.7
      (2L, base.replace("kappa", "omega"), "en", "s", 10L),
      // disjoint vocabulary → zero shared shingles
      (3L, "one two three four five six seven eight nine ten", "en", "s", 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = DedupOps.queries("q114_set_similarity_join")(spark, d).collect()
    assert(rows.length === 1)
    assert(rows.head.getAs[Long]("doc_a") === 1L)
    assert(rows.head.getAs[Long]("doc_b") === 2L)
    assert(rows.head.getAs[Double]("jaccard") === 7.0 / 9.0)
  }

  test("q115: diff classifies added/removed/changed/unchanged exactly") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("diff_fixtures").toString
    // keys 1..10: key 3 removed (3 % 101 == 3), key 7 repriced
    // (7 % 7 == 0), key 1 duplicated beyond max (1 % 97 == 1) → added
    (1L to 10L).map(k => (k, k * 10.0, "P"))
      .toDF("o_orderkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val rows = graft.engine.Snapshots.queries("q115_table_diff")(spark, d)
      .collect().map(r => r.getAs[String]("status") -> r.getAs[Long]("n")).toMap
    assert(rows === Map("added" -> 1L, "removed" -> 1L,
      "changed" -> 1L, "unchanged" -> 8L))
  }
}

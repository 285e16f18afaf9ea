package graft.text

import graft.SparkSpec

/** q119 semantics: the data-mixture manifest's integer repeat plan and
  * curriculum phasing, checked against hand-computed exact arithmetic.
  */
class MixtureManifestSpec extends SparkSpec {

  test("q119: epochs/remainder plan is exact integer math; phases order by avg length") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("mixture_fixtures").toString
    // src0 (weight 1200bp): 2 docs × 101 tokens → avail 202,
    //   target 40000*1200//10000 = 4800 → epochs 23, rem 154,
    //   rem_rate_bp 154*10000//202 = 7623, oversampled.
    // tail (default 200bp): 3 docs × 500 tokens → avail 1500,
    //   target 800 → epochs 0, rem_rate_bp 800*10000//1500 = 5333.
    (Seq((1L, "src0", 401L), (2L, "src0", 401L)) ++
      Seq((3L, "tail", 1997L), (4L, "tail", 1997L), (5L, "tail", 1997L)))
      .map { case (id, src, nc) => (id, "t", "en", src, nc) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$d/documents.parquet")
    val rows = SamplingOps.queries("q119_mixture_manifest")(spark, d)
      .orderBy("source").collect()
    assert(rows.length === 2)
    val src0 = rows(0)
    assert(src0.getAs[Long]("avail_tokens") === 202L)
    assert(src0.getAs[Long]("target_tokens") === 4800L)
    assert(src0.getAs[Long]("epochs") === 23L)
    assert(src0.getAs[Long]("rem_rate_bp") === 7623L)
    assert(src0.getAs[Int]("oversampled") === 1)
    val tail = rows(1)
    assert(tail.getAs[Long]("avail_tokens") === 1500L)
    assert(tail.getAs[Long]("target_tokens") === 800L)
    assert(tail.getAs[Long]("epochs") === 0L)
    assert(tail.getAs[Long]("rem_rate_bp") === 5333L)
    assert(tail.getAs[Int]("oversampled") === 0)
    // curriculum: shorter avg docs (src0, 101) phase before tail (500)
    assert(src0.getAs[Int]("curriculum_phase") < tail.getAs[Int]("curriculum_phase"))
  }
}

package graft.text

import graft.SparkSpec

/** q198 token-balanced shard assignment: LPT round-robin semantics and
  * partition-layout independence of the two-pass global rank.
  */
class ShardPackingSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String, docs: Seq[(Long, String)]): Unit =
    docs.map { case (id, t) => (id, t, "en", "s0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def brute(docs: Seq[(Long, String)]): Map[Long, (Long, Long)] = {
    val s = ChunkingOps.WriterShards
    val ranked = docs
      .map { case (id, t) => (id, t.trim.split("\\s+").length.toLong) }
      .sortBy { case (id, n) => (-n, id) }
    ranked.zipWithIndex
      .map { case ((_, n), rank) => (rank % s).toLong -> n }
      .groupBy(_._1)
      .map { case (shard, xs) => shard -> (xs.size.toLong, xs.map(_._2).sum) }
  }

  test("q198 equals the in-memory LPT round-robin, regardless of layout") {
    val rnd = new scala.util.Random(198)
    val docs = (0L until 200L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(30))("w").mkString(" ")
    }
    val expected = brute(docs)
    for (shuffleSeed <- Seq(1, 2)) {
      val d = java.nio.file.Files.createTempDirectory(s"shard_fix$shuffleSeed").toString
      // different on-disk orders must not change the deterministic ranks
      writeDocs(d, new scala.util.Random(shuffleSeed).shuffle(docs))
      val got = graft.SparkEntry.queries("q198_shard_packing")(spark, d)
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got === expected, s"layout seed $shuffleSeed diverged")
    }
  }

  test("q198 share_ppm sums to ~1e6 and is near-balanced on uniform docs") {
    val d = java.nio.file.Files.createTempDirectory("shard_bal").toString
    val docs = (0L until 320L).map(id => id -> Seq.fill(10)("w").mkString(" "))
    writeDocs(d, docs)
    val rows = graft.SparkEntry.queries("q198_shard_packing")(spark, d).collect()
    assert(rows.length === ChunkingOps.WriterShards)
    val ppm = rows.map(_.getLong(3))
    // identical doc sizes → perfectly balanced: every shard holds
    // exactly a 1/16 token share (62500 ppm)
    assert(ppm.forall(_ === 1000000L / ChunkingOps.WriterShards), ppm.toSeq)
  }
}

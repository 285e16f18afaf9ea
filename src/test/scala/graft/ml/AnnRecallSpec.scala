package graft.ml

import graft.SparkSpec

/** q156 recall@k: the reported hits must equal an independently
  * computed intersection of the q28 (exact) and q29 (LSH) neighbor
  * sets — the eval harness may not invent or lose a hit.
  */
class AnnRecallSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("q156 n_hit equals the independent q28 ∩ q29 intersection") {
    def sets(name: String): Map[Long, Set[Long]] =
      graft.SparkEntry.queries(name)(spark, sf)
        .select("query_id", "vec_id").collect()
        .groupBy(_.getLong(0)).view
        .mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = sets("q28_cosine_topk")
    val approx = sets("q29_ann_lsh")
    val recall = graft.SparkEntry.queries("q156_ann_recall")(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(recall.keySet == exact.keySet)
    recall.foreach { case (q, (nExact, nHit, rec)) =>
      assert(nExact == exact(q).size)
      val hits = exact(q).intersect(approx.getOrElse(q, Set.empty)).size
      assert(nHit == hits, s"query $q: reported $nHit, independent $hits")
      assert(rec == hits.toDouble / nExact)
      assert(rec >= 0.0 && rec <= 1.0)
    }
  }
}

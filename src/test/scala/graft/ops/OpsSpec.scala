package graft.ops

import graft.SparkSpec
import graft.text.{DedupOps, TextOps}
import graft.ml.SimilarityOps
import graft.multimodal.MultimodalOps
import org.apache.spark.sql.functions._

/** Behavioral specs for the op modules, on the sf0.001 testdata. The
  * oracle gate (graft.Verify + DuckDB) covers value equality; these cover
  * semantics the oracle can't see (e.g. "LSH actually finds the seeded
  * near-duplicates", "both decode paths agree").
  */
class OpsSpec extends SparkSpec {
  val sf = "/root/testdata/sf0.001"

  test("all registered queries run and return rows on sf0.001") {
    graft.SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every query name has either an oracle or a documented reason") {
    val q = graft.SparkEntry.queries.keySet
    val o = graft.SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q))
  }

  test("query names are unique across modules (no silent map overwrites)") {
    val perModule = graft.SparkEntry.modules.map(_.queries.size).sum
    assert(graft.SparkEntry.queries.size === perModule)
  }

  test("lsh near-duplicates have high verified jaccard and are symmetric-free") {
    val pairs = DedupOps.lshPairs(spark, sf).collect()
    assert(pairs.nonEmpty, "expected seeded near-duplicates in testdata")
    pairs.foreach { r =>
      assert(r.getAs[Double]("jaccard") >= DedupOps.JaccardThreshold)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("lsh candidates are a superset check: known near-dup pair found") {
    // adjacent-pair jaccard query and LSH must agree on any adjacent pair
    // above the threshold
    val adj = SparkEntry_adjacentHighPairs()
    val lsh = DedupOps.lshPairs(spark, sf).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    adj.foreach { p => assert(lsh.contains(p), s"LSH missed near-dup $p") }
  }

  private def SparkEntry_adjacentHighPairs(): Seq[(Long, Long)] =
    graft.SparkEntry.queries("q27_ngram_jaccard")(spark, sf)
      .filter(col("jaccard") >= DedupOps.JaccardThreshold)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSeq

  test("exact dedup groups cover all documents exactly once") {
    val groups = graft.SparkEntry.queries("q23_dedup_exact")(spark, sf)
    val total = groups.agg(sum("group_size")).head().getLong(0)
    val docs = spark.read.parquet(s"$sf/documents.parquet").count()
    assert(total === docs)
  }

  test("cosine top-k: self excluded, ranks contiguous, cosine in [-1,1]") {
    val topk = graft.SparkEntry.queries("q28_cosine_topk")(spark, sf).collect()
    topk.foreach { r =>
      assert(r.getAs[Long]("query_id") !== r.getAs[Long]("vec_id"))
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.0000001 && c <= 1.0000001)
    }
    val byQuery = topk.groupBy(_.getAs[Long]("query_id"))
    byQuery.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Int]("rank")).sorted.toSeq ===
        (1 to SimilarityOps.TopK))
      // ranks ordered by descending cosine
      val sorted = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cosine"))
      assert(sorted.zip(sorted.tail).forall { case (a, b) => a >= b })
    }
  }

  test("ann lsh results are a subset of brute-force candidates per query") {
    // every ANN hit must score <= the brute-force rank-1 cosine
    val bf = graft.SparkEntry.queries("q28_cosine_topk")(spark, sf)
      .filter(col("rank") === 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Double]("cosine"))
      .toMap
    graft.SparkEntry.queries("q29_ann_lsh")(spark, sf).collect().foreach { r =>
      val q = r.getAs[Long]("query_id")
      assert(r.getAs[Double]("cosine") <= bf(q) + 1e-12)
    }
  }

  test("multimodal: q34 real-codec features match closed-form fixture " +
    "geometry (independent Scala recomputation, not the DuckDB oracle)") {
    val rows = graft.SparkEntry.queries("q34_media_features")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("media_id")
      val w = (1 + id % 64).toInt
      val h = (1 + (id * 7) % 48).toInt
      val frames = (id % 3) match {
        case 0 => (1 + id % 11).toInt
        case 1 => 1
        case _ => (1 + id % 7).toInt
      }
      assert(r.getAs[Int]("width") === w, s"width mismatch media $id")
      assert(r.getAs[Int]("height") === h, s"height mismatch media $id")
      assert(r.getAs[Int]("n_frames") === frames, s"frames mismatch media $id")
      assert(r.getAs[Long]("n_pixels") === w.toLong * h)
      assert(r.getAs[Boolean]("is_animated") === (frames > 1))
    }
  }

  test("sessionize: sessions partition each user's events, gaps respected") {
    val sess = graft.SparkEntry.queries("q31_sessionize")(spark, sf)
    val nEvents = sess.agg(sum("n_events")).head().getLong(0)
    val raw = Tables.events(spark, sf).count()
    assert(nEvents === raw)
    assert(sess.filter(col("duration_us") < 0).count() === 0)
  }

  test("approx distinct stays within the configured error bound") {
    val rows = graft.SparkEntry.queries("q56_approx_distinct")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("exact_customers") > 0)
      // the oracle hashes TRUE: the gate only matches if the estimate
      // honors its bound on every group
      assert(r.getAs[Boolean]("within_bound"),
        s"${r.getString(0)}: estimate breached the 10% bound")
    }
  }

  test("lang_id is deterministic and defaults sensibly") {
    val langs = graft.SparkEntry.queries("q21_lang_id")(spark, sf)
      .select("detected_lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(TextOps.markers.map(_._1).toSet + "und"))
  }
}

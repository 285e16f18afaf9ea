package graft.ml

import java.nio.file.Paths

import graft.SparkSpec
import graft.sources.v2.ClusteredSinkOverwrite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** q215's persisted-index claims (r13 verdict task 4), mechanized:
  *
  *   1. the index table is filePerKey over the cell id — every manifest
  *      file carries exactly one inverted list;
  *   2. BUILD-ONCE: a second annIndex call for the same dataset returns
  *      the cached table without rewriting (file signatures unchanged);
  *   3. the search join leaves the INDEX side exchange-free — the scan
  *      reports key-grouped partitioning and only the probe frame
  *      shuffles into the key groups (one-side-shuffle SPJ);
  *   4. recall is unchanged vs q212 — in fact the full result set is
  *      row-identical, because index content, ADC arithmetic, and
  *      ranking are the same by construction.
  */
class PersistedAnnSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def walk(p: SparkPlan): Seq[SparkPlan] =
    p +: (p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other.children.flatMap(walk)
    })

  private def isIndexScan(p: SparkPlan): Boolean = p match {
    case b: BatchScanExec => b.scan.description().contains("graft-sink") &&
      b.scan.description().contains("ivfpq_")
    case _ => false
  }

  test("index table: one file per cell, single-key manifest") {
    val (index, codebook) = SimilarityOps.annIndex(spark, sf)
    assert(index.count() > 0)
    val wh = index.sparkSession.conf
      .get(s"spark.sql.catalog.${SimilarityOps.AnnCat}.warehouse")
    // the q215 build-once table only — q227's upsert index (ivfpq_up_*)
    // and AnnUpsertSpec's split fixture (ivfpq_split_*) share the
    // warehouse when the whole suite runs in one JVM
    val tables = new java.io.File(wh, "g").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("ivfpq_") &&
        !f.getName.startsWith("ivfpq_up_") &&
        !f.getName.startsWith("ivfpq_split_"))
    assert(tables.length === 1)
    val entries = ClusteredSinkOverwrite.readManifest(
      Paths.get(wh, "g", tables.head.getName, "_manifest.jsonl"))
    assert(entries.nonEmpty)
    entries.foreach { e =>
      assert(e.minCluster != null && e.minCluster == e.maxCluster,
        s"file ${e.file} spans cells [${e.minCluster},${e.maxCluster}]")
    }
    // every cell that received vectors has exactly one file
    assert(entries.map(_.minCluster.longValue).distinct.size === entries.size)
    assert(codebook.nonEmpty && codebook.size <= 256)
  }

  test("build-once: a second annIndex call does not rewrite") {
    val (index, _) = SimilarityOps.annIndex(spark, sf)
    index.count()
    val wh = index.sparkSession.conf
      .get(s"spark.sql.catalog.${SimilarityOps.AnnCat}.warehouse")
    val dir = new java.io.File(wh, "g").listFiles()
      .filter(_.getName.startsWith("ivfpq_")).head
    def sig(): Seq[(String, Long)] = {
      def all(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) Option(f.listFiles()).toSeq.flatten.flatMap(all)
        else Seq(f)
      all(dir).map(f => (f.getAbsolutePath, f.lastModified)).sortBy(_._1)
    }
    val before = sig()
    val (again, _) = SimilarityOps.annIndex(spark, sf)
    assert(again.count() > 0)
    assert(sig() === before, "second annIndex call must skip the write")
  }

  test("search join: index side exchange-free, probes shuffle to key groups") {
    val (index, codebook) = SimilarityOps.annIndex(spark, sf)
    val iso = index.sparkSession
    // pin the storage path: a broadcast would vacuously pass
    iso.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val probes = graft.ops.Tables.embeddings(iso, sf)
        .filter(col("vec_id") < SimilarityOps.NumQueries)
        .select(col("vec_id").as("query_id"),
          array((1 to SimilarityOps.PqM).map(_ =>
            array((0 until codebook.size).map(i => lit(i.toLong)): _*)): _*)
            .as("qtab"),
          explode(SimilarityOps.probeCentroids(iso, codebook,
            SimilarityOps.NProbe)(col("embedding"))).as("pcell"))
        .select(col("query_id"), col("qtab"),
          col("pcell").cast("long").as("cell"))
      val cand = SimilarityOps.annCandidates(index, probes)
      assert(cand.count() > 0)
      val nodes = walk(cand.queryExecution.executedPlan)
      val scans = nodes.filter(isIndexScan)
      assert(scans.nonEmpty, "expected the persisted index scan")
      scans.foreach {
        case b: BatchScanExec =>
          assert(b.scan.description().contains("keyGrouped=true"),
            s"index scan must report key-grouped partitioning:\n" +
              b.scan.description())
        case _ => ()
      }
      // no exchange between the index scan and the join above it
      def check(p: SparkPlan, sawExchange: Boolean): Unit = p match {
        case s if isIndexScan(s) =>
          assert(!sawExchange, "the index scan crossed an exchange")
        case a: AdaptiveSparkPlanExec => check(a.executedPlan, sawExchange)
        case q: QueryStageExec => check(q.plan, sawExchange)
        case e: ShuffleExchangeExec => e.children.foreach(check(_, true))
        case other => other.children.foreach(check(_, sawExchange))
      }
      check(cand.queryExecution.executedPlan, sawExchange = false)
    } finally {
      iso.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("q215 is row-identical to q212 (recall gate unchanged)") {
    val a = graft.SparkEntry.queries("q215_persisted_ivfpq")(spark, sf)
    val b = graft.SparkEntry.queries("q212_ivfpq_search")(spark, sf)
    assert(a.exceptAll(b).count() === 0)
    assert(b.exceptAll(a).count() === 0)
  }

  test("q217 probe path: every embeddings scan is probe-bounded, " +
      "index side exchange-free") {
    val df = graft.SparkEntry.queries("q217_ann_probe_recall")(spark, sf)
    assert(df.count() === SimilarityOps.NumQueries)
    val nodes = walk(df.queryExecution.executedPlan)
    // the serving path must never scan the raw corpus: every parquet
    // scan of embeddings carries the pushed vec_id < NumQueries bound
    val embScans = nodes.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.relation.location.rootPaths
            .exists(_.toString.contains("embeddings")) => f
    }
    assert(embScans.nonEmpty, "expected the probe-side embeddings scan")
    embScans.foreach { f =>
      val pushed = f.metadata.getOrElse("PushedFilters", "")
      assert(pushed.contains(s"LessThan(vec_id,${SimilarityOps.NumQueries}"),
        s"embeddings scan must be probe-bounded, got: $pushed")
    }
    // and the persisted index reaches ITS JOIN without an exchange (the
    // SPJ claim; the candidate-ranking shuffle above the join carries
    // only (query_id, vec_id, adc_ppm) tuples and is expected)
    def pathTo(p: SparkPlan): Option[List[SparkPlan]] = {
      if (isIndexScan(p)) Some(List(p))
      else {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: QueryStageExec => Seq(q.plan)
          case o => o.children
        }
        kids.view.flatMap(pathTo).headOption.map(p :: _)
      }
    }
    val path = pathTo(df.queryExecution.executedPlan)
    assert(path.nonEmpty, "expected the persisted index scan")
    val scanToJoin = path.get.reverse.takeWhile(
      !_.isInstanceOf[org.apache.spark.sql.execution.joins.BaseJoinExec])
    assert(!scanToJoin.exists(_.isInstanceOf[ShuffleExchangeExec]),
      s"index side crossed an exchange before its join:\n" +
        scanToJoin.map(_.nodeName).mkString(" <- "))
  }

  test("q217 recall equals q215's in_exact_topk rollup") {
    val truth = graft.SparkEntry.queries("q215_persisted_ivfpq")(spark, sf)
      .groupBy("query_id")
      .agg(sum(col("in_exact_topk").cast("long")).as("hits"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = graft.SparkEntry.queries("q217_ann_probe_recall")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.size === SimilarityOps.NumQueries)
    got.foreach { case (q, nExact, nHit) =>
      assert(nExact === SimilarityOps.TopK.toLong)
      assert(nHit === truth(q),
        s"query $q: probe-only n_hit $nHit != q215 rollup ${truth(q)}")
    }
  }
}

package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sources.v2.ClusteredSinkOverwrite
import org.apache.spark.sql.functions._

/** q211's storage-partitioned-join claims, mechanized (round-12 verdict
  * task 4 — the engine's OWN table format feeding SPJ):
  *
  *   1. a filePerKey write produces a manifest where EVERY file carries
  *      exactly one cluster key (min_cluster == max_cluster, non-null) —
  *      the layout precondition;
  *   2. the ClusteredSinkScan reports key-grouped partitioning over that
  *      layout (visible in its description);
  *   3. the (bucket, key) join of two such tables executes with ZERO
  *      shuffle exchanges — the scans' KeyGroupedPartitioning IS the
  *      join distribution, at any table size, no broadcast involved.
  *
  * The lint walk descends through AQE wrappers (the q161 lesson: a raw
  * plan.collect is vacuous under AdaptiveSparkPlanExec).
  */
class ClusteredSinkSpjSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"
  private lazy val warehouse =
    Files.createTempDirectory("graft_cat_spj_spec").toString

  test("filePerKey write: every manifest file is single-key; SPJ join is exchange-free") {
    val cat = "graft_cat_spj"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.g")
    spark.sql(s"DROP TABLE IF EXISTS $cat.g.a")
    spark.sql(s"DROP TABLE IF EXISTS $cat.g.b")
    spark.sql(s"CREATE TABLE $cat.g.a " +
      "(key BIGINT, bucket BIGINT, payload STRING) PARTITIONED BY (bucket) " +
      "TBLPROPERTIES ('filePerKey'='true')")
    spark.sql(s"CREATE TABLE $cat.g.b " +
      "(key BIGINT, bucket BIGINT, n_lines BIGINT) PARTITIONED BY (bucket) " +
      "TBLPROPERTIES ('filePerKey'='true')")
    graft.ops.Tables.orders(spark, sf)
      .select(col("o_orderkey").cast("long").as("key"),
        (col("o_orderkey") % 32).cast("long").as("bucket"),
        col("o_orderstatus").as("payload"))
      .writeTo(s"$cat.g.a").append()
    graft.ops.Tables.lineitem(spark, sf)
      .groupBy(col("l_orderkey").cast("long").as("key"),
        (col("l_orderkey") % 32).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_lines"))
      .writeTo(s"$cat.g.b").append()

    // 1. layout: single-key files, and together they cover all keys
    for (t <- Seq("a", "b")) {
      val entries = ClusteredSinkOverwrite.readManifest(
        Paths.get(warehouse, "g", t, "_manifest.jsonl"))
      assert(entries.nonEmpty, s"table $t wrote no files")
      entries.foreach { e =>
        assert(e.minCluster != null && e.minCluster == e.maxCluster,
          s"table $t file ${e.file} spans keys [${e.minCluster}," +
            s"${e.maxCluster}] — filePerKey must produce single-key files")
      }
      assert(entries.map(_.minCluster.longValue).distinct.size === 32,
        s"table $t should carry all 32 buckets")
    }

    // 2 + 3. the join plans exchange-free on the reported partitioning
    val iso = spark.newSession()
    iso.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    iso.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    iso.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    iso.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    // keep AQE from broadcasting a side — the claim is the storage path
    iso.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val a = iso.table(s"$cat.g.a")
    val b = iso.table(s"$cat.g.b")
    val joined = a.join(b, a("bucket") === b("bucket") && a("key") === b("key"))
      .select(a("bucket"), a("key"), b("n_lines"))
    val expected = graft.ops.Tables.orders(spark, sf)
      .join(graft.ops.Tables.lineitem(spark, sf),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey")).agg(count(lit(1)).as("n"))
      .count()
    assert(joined.count() === expected)

    val findings = graft.ops.PlanLint.lint(joined)
    assert(findings.find(_.rule == "shuffle-count").map(_.detail).contains("0"),
      s"SPJ over two filePerKey sink tables should need no exchange: $findings")
    // the scans advertise the key grouping (description surfaces it)
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("keyGrouped=true"),
      s"scan should report key-grouped partitioning:\n${planStr.take(1500)}")
  }

  test("multi-key layout does NOT report key grouping (correctness guard)") {
    val cat = "graft_cat_spj"
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.g")
    spark.sql(s"DROP TABLE IF EXISTS $cat.g.plain")
    spark.sql(s"CREATE TABLE $cat.g.plain " +
      "(key BIGINT, bucket BIGINT, payload STRING) PARTITIONED BY (bucket)")
    graft.ops.Tables.orders(spark, sf)
      .select(col("o_orderkey").cast("long").as("key"),
        (col("o_orderkey") % 32).cast("long").as("bucket"),
        col("o_orderstatus").as("payload"))
      .writeTo(s"$cat.g.plain").append()
    val df = spark.table(s"$cat.g.plain").filter(col("bucket") >= 0)
    assert(df.count() > 0)
    val planStr = df.queryExecution.executedPlan.toString
    assert(planStr.contains("keyGrouped=false"),
      "a default (multi-key-file) table must not claim key grouping:\n" +
        planStr.take(1000))
  }
}

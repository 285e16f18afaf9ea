package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DataSource V2 connector behavior: schema, determinism, split planning,
  * id-range filter pushdown (scan-side skipping), residual filters, and
  * column pruning — all asserted at the executed-plan level.
  */
class RangeDocSourceSpec extends SparkSpec {

  private def read(rows: Long, splits: Int) =
    spark.read.format("graft-range")
      .option("rows", rows.toString).option("splits", splits.toString).load()

  private def scanOf(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }
      .getOrElse(fail("no BatchScanExec in plan"))

  test("full read matches the closed-form row function") {
    val got = read(1000, 4).collect()
    assert(got.length === 1000)
    val r = got.find(_.getLong(0) == 123L).get
    assert(r.getInt(1) === (123 % 97))
    assert(r.getString(2) === "cat3")
    assert(r.getLong(3) === (123L * 37 + 11) % 1000003)
    assert(r.getDouble(4) === ((123L * 37 + 11) % 1000003) / 1024.0)
  }

  test("splits plan contiguous gap-free partitions") {
    val df = read(1003, 8)
    assert(df.rdd.getNumPartitions === 8)
    // uneven split: still every id exactly once
    assert(df.select(countDistinct(col("id"))).head.getLong(0) === 1003L)
    assert(df.count() === 1003L)
  }

  test("id range predicates are pushed into the scan and skip generation") {
    val df = read(1000000, 8)
      .filter(col("id") >= 999990L && col("id") < 999995L)
    val scan = scanOf(df)
    // the scan itself was narrowed — the reader generates 5 rows, not 1M
    assert(scan.scan.description().contains("id=[999990,999995)"))
    assert(df.count() === 5)
    // pushed filters no longer appear as a Filter node above the scan
    val hasFilter = df.queryExecution.executedPlan.exists {
      case _: org.apache.spark.sql.execution.FilterExec => true
      case _ => false
    }
    assert(!hasFilter, "id-range filters must be consumed by the source")
  }

  test("equality pushdown plans only the intersecting split") {
    val df = read(1000000, 8).filter(col("id") === 777777L)
    assert(scanOf(df).scan.description().contains("id=[777777,777778)"))
    assert(df.select(col("bucket")).head.getInt(0) === (777777 % 97))
  }

  test("non-id filters stay residual above the scan") {
    val df = read(10000, 4).filter(col("bucket") === 3)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("id=[0,10000)"))
    val expect = (0L until 10000L).count(_ % 97 == 3)
    assert(df.count() === expect)
  }

  test("column pruning reaches the reader schema") {
    val df = read(1000, 4).select(col("category"))
    val scan = scanOf(df)
    assert(scan.scan.readSchema().fieldNames.toSeq === Seq("category"))
    assert(df.distinct().count() === 5)
  }

  test("empty pushdown range plans zero partitions") {
    val df = read(1000, 4).filter(col("id") >= 5000L)
    assert(df.count() === 0)
  }

  test("Long.MaxValue bounds saturate instead of wrapping to an empty scan") {
    // id <= Long.MaxValue means "no upper bound": the succ() saturation
    // guard must keep hi at rows, not wrap negative and clamp below lo
    val df = read(1000, 4).filter(col("id") <= Long.MaxValue)
    assert(df.count() === 1000L)
    // id > Long.MaxValue is unsatisfiable — empty range is the right answer
    assert(read(1000, 4).filter(col("id") > Long.MaxValue).count() === 0L)
  }

  test("repeated pushFilters on one builder does not compound stale bounds") {
    import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThan}
    val b = new graft.sources.v2.RangeDocScanBuilder(1000L, 4)
    b.pushFilters(Array[Filter](GreaterThanOrEqual("id", 100L), LessThan("id", 200L)))
    // a second call with a WIDER range must fully replace the first bounds
    b.pushFilters(Array[Filter](GreaterThanOrEqual("id", 10L)))
    assert(b.build().description().contains("id=[10,1000)"))
  }

  test("SQL DDL path: CREATE TABLE ... USING graft-range") {
    spark.sql("DROP TABLE IF EXISTS graft_range_ddl")
    spark.sql(
      """CREATE TABLE graft_range_ddl USING `graft-range`
        |OPTIONS (rows '5000', splits '4')""".stripMargin)
    try {
      val got = spark.sql(
        """SELECT category, COUNT(*) AS n FROM graft_range_ddl
          |WHERE id >= 4000 GROUP BY category""".stripMargin)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got === Map("cat0" -> 200L, "cat1" -> 200L, "cat2" -> 200L,
        "cat3" -> 200L, "cat4" -> 200L))
    } finally spark.sql("DROP TABLE IF EXISTS graft_range_ddl")
  }

  private def ranged(rows: Long) = spark.read.format("graft-range")
    .option("rows", rows.toString).option("splits", "8").load()

  test("ungrouped COUNT/MIN/MAX push completely: no aggregate in the plan") {
    val df = ranged(200000)
      .filter(col("id") >= 50000L && col("id") < 150000L)
      .selectExpr("count(*) AS n", "min(id) AS mn", "max(id) AS mx")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("graft-range-agg"), s"agg scan missing:\n$plan")
    assert(!plan.contains("Aggregate"), s"aggregate survived pushdown:\n$plan")
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ==
      ((100000L, 50000L, 149999L)))
  }

  test("COUNT(col) on a non-nullable source column pushes as count") {
    val df = ranged(1000).selectExpr("count(bucket) AS n")
    assert(df.queryExecution.executedPlan.toString.contains("graft-range-agg"))
    assert(df.collect().head.getLong(0) == 1000L)
  }

  test("COUNT(*) plus COUNT(col) push together (distinct result field names)") {
    val df = ranged(1000).filter(col("id") >= 100L)
      .selectExpr("count(*) AS a", "count(bucket) AS b", "min(id) AS mn")
    assert(df.queryExecution.executedPlan.toString.contains("graft-range-agg"))
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((900L, 900L, 100L)))
  }

  test("empty pushed range aggregates to count 0 with NULL min/max") {
    val df = ranged(1000).filter(col("id") >= 5000L)
      .selectExpr("count(*) AS n", "min(id) AS mn", "max(id) AS mx")
    assert(df.queryExecution.executedPlan.toString.contains("graft-range-agg"))
    val r = df.collect().head
    assert(r.getLong(0) == 0L && r.isNullAt(1) && r.isNullAt(2))
  }

  test("reported statistics let Catalyst broadcast a narrowed range") {
    import spark.implicits._
    val big = (0L until 60000L).map(i => (i % 97, i)).toDF("bucket2", "payload")
    val dim = ranged(200000).filter(col("id") >= 100L && col("id") < 150L)
    val joined = big.join(dim, col("bucket2") === col("bucket"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"narrowed v2 side should broadcast:\n$plan")
    // and the estimate itself is exact on rows
    val scan = dim.queryExecution.optimizedPlan.collect {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation => r
    }.head
    assert(scan.computeStats().rowCount.contains(BigInt(50)))
  }

  // ------------------------------------------------- runtime filtering

  test("runtime In-filter tightens the range and drops non-intersecting splits") {
    import org.apache.spark.sql.sources.{EqualTo, Filter, In}
    def scan() = new graft.sources.v2.RangeDocScan(
      graft.sources.v2.RangeDocSource.schema, 0L, 1000000L, 16)
    // two ids at opposite ends: envelope keeps [10, 999991); only the
    // splits actually containing an id survive
    val s = scan()
    s.filter(Array[Filter](In("id", Array[Any](999990L, 10L))))
    val parts = s.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.v2.RangeDocPartition])
    assert(parts.length === 2, parts.mkString(","))
    assert(parts.exists(p => p.lo <= 10L && 10L < p.hi))
    assert(parts.exists(p => p.lo <= 999990L && 999990L < p.hi))
    // runtime EqualTo plans exactly one split
    val s2 = scan()
    s2.filter(Array[Filter](EqualTo("id", 777777L)))
    assert(s2.planInputPartitions().length === 1)
    // an empty pushed set is a legal empty scan
    val s3 = scan()
    s3.filter(Array[Filter](In("id", Array.empty[Any])))
    assert(s3.planInputPartitions().isEmpty)
    // repeated filter() calls intersect, never widen
    val s4 = scan()
    s4.filter(Array[Filter](In("id", Array[Any](5L, 10L, 15L))))
    s4.filter(Array[Filter](In("id", Array[Any](10L, 20L))))
    val p4 = s4.planInputPartitions()
      .map(_.asInstanceOf[graft.sources.v2.RangeDocPartition])
    assert(p4.length === 1 && p4.head.lo <= 10L && 10L < p4.head.hi)
  }

  test("broadcast join pushes a dynamic-pruning runtime filter into the scan") {
    // fact: 1M generated rows (too big to broadcast); dim: a second
    // graft-range scan narrowed by a RESIDUAL (non-id) predicate — the
    // selective-filter shape Spark's PartitionPruning rule requires on
    // the build side. DPP then re-offers dim's id set to the fact scan
    // as a runtime In-filter, and the fact side generates only the
    // envelope of dim's ids instead of all 1M rows.
    val fact = read(1000000L, 16)
    val dim = read(2000L, 2).filter(col("bucket") === 3)
      .select(col("id").as("fk"))
    val joined = fact.join(dim, col("id") === col("fk"))
    // collect() executes THIS DataFrame's QueryExecution, so its plan
    // metrics populate (count() would spawn a separate one, zeroed here)
    val n = joined.collect().length
    assert(n === (0L until 2000L).count(_ % 97 == 3))
    val planStr = joined.queryExecution.executedPlan.toString
    assert(planStr.contains("dynamicpruning"),
      s"no runtime filter reached the scan:\n$planStr")
    // the fact scan's executed output is the dim-id envelope (≤ 1944
    // generated rows — ids ≡ 3 mod 97 under 2000 span [3, 1944)), not 1M
    val factRows = collectLeaves(joined.queryExecution.executedPlan)
      .collectFirst {
        case b: BatchScanExec if b.scan.description().contains("1000000") =>
          b.metrics("numOutputRows").value
      }
    assert(factRows.exists(r => r >= n && r < 10000L),
      s"fact scan read ${factRows} rows — runtime pruning did not engage")
  }

  private def collectLeaves(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      collectLeaves(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      collectLeaves(q.plan)
    case other => other.collectLeaves().flatMap {
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        collectLeaves(q.plan)
      case l => Seq(l)
    }
  }

  // ------------------------------------------------- metadata columns

  test("_split metadata column maps rows to their planned partition") {
    val df = read(1000L, 4).select(col("_split"), col("id"))
    // 1000 rows / 4 splits → width 250; _split = id / 250
    val bad = df.filter(col("_split") =!= (col("id") / 250).cast("int")).count()
    assert(bad === 0L)
    assert(df.select(countDistinct(col("_split"))).head().getLong(0) === 4L)
  }

  test("_split is absent from SELECT * and survives pushdown narrowing") {
    val df = read(1000L, 4)
    assert(!df.columns.contains("_split"))
    // narrowed range [100, 600) re-plans splits over n=500 (width 125)
    val narrowed = read(1000L, 4)
      .filter(col("id") >= 100L && col("id") < 600L)
      .select(col("_split"), col("id"))
    val bad = narrowed
      .filter(col("_split") =!= ((col("id") - 100) / 125).cast("int")).count()
    assert(bad === 0L)
  }

  test("grouped / non-closed-form aggregations decline pushdown and stay correct") {
    val grouped = ranged(1000).groupBy("category").count()
    assert(!grouped.queryExecution.executedPlan.toString
      .contains("graft-range-agg"))
    assert(grouped.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      .forall(_._2 == 200L))
    // SUM over the modular column has no closed form — declined too
    val summed = ranged(1000).selectExpr("sum(amount) AS s")
    assert(!summed.queryExecution.executedPlan.toString
      .contains("graft-range-agg"))
    assert(summed.collect().head.getLong(0) ==
      (0L until 1000L).map(id => (id * 37 + 11) % 1000003).sum)
  }

  // ------------------------------------------------- limit / top-N pushdown

  test("LIMIT pushes fully: the scan generates only `limit` rows") {
    val df = read(1000000, 8).limit(37)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("limit=37"),
      scan.scan.description())
    assert(scan.scan.description().contains("id=[0,37)"))
    assert(df.collect().length === 37)
  }

  test("top-N on id desc narrows the scan to the range tail") {
    val df = read(1000000, 8)
      .filter(col("id") >= 20000L && col("id") < 180000L)
      .orderBy(col("id").desc).limit(50)
    val scan = scanOf(df)
    assert(scan.scan.description().contains("topN=50"), scan.scan.description())
    assert(scan.scan.description().contains("id=[179950,180000)"))
    val got = df.collect().map(_.getLong(0))
    assert(got.toSeq === (179999L until 179949L by -1L).toSeq)
  }

  test("OFFSET pushes fully and composes with a pushed LIMIT (pagination)") {
    // plain offset: scan head shifts
    val df = read(1000, 4).offset(990)
    assert(scanOf(df).scan.description().contains("offset=990"),
      scanOf(df).scan.description())
    assert(df.collect().map(_.getLong(0)).toSeq === (990L until 1000L).toSeq)
    // offset + limit pagination: page 3 of size 20
    val page = read(1000000, 8).offset(60).limit(20)
    val got = page.collect().map(_.getLong(0))
    assert(got.toSeq === (60L until 80L).toSeq, got.mkString(","))
    val desc = scanOf(page).scan.description()
    assert(desc.contains("offset=60"), desc)
  }

  test("top-N on a non-id column is declined and stays a full scan") {
    val df = read(10000, 4).orderBy(col("amount").desc).limit(5)
    assert(scanOf(df).scan.description().contains("id=[0,10000)"))
    val expect = (0L until 10000L).map(id => (id * 37 + 11) % 1000003)
      .sorted.reverse.take(5)
    assert(df.collect().map(_.getLong(3)).toSeq === expect)
  }

  // ------------------------------------------- storage-partitioned join

  private def bucketed(rows: Long) = spark.read.format("graft-range")
    .option("rows", rows.toString).option("partitionBy", "bucket").load()

  test("bucketed scan plans one residue-class split per bucket value") {
    val df = bucketed(1000L)
    assert(df.rdd.getNumPartitions === 97)
    assert(df.count() === 1000L)
    assert(df.filter(col("bucket") =!= (col("id") % 97).cast("int")).count() === 0L)
    // each split holds exactly its residue class (provenance = bucket)
    assert(df.select(col("_split"), col("bucket"))
      .filter(col("_split") =!= col("bucket")).count() === 0L)
  }

  test("storage-partitioned join runs with zero shuffles and zero sorts") {
    val conf = spark.conf
    val prevBucketing = conf.get("spark.sql.sources.v2.bucketing.enabled", "false")
    val prevBroadcast = conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevRequireAll = conf.get("spark.sql.requireAllClusterKeysForCoPartition", "true")
    conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // join keys (bucket, id) ⊃ partition key (bucket): the strict default
    // co-partition check rejects SPJ for superset join keys
    conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      val a = bucketed(200000L)
      val b = bucketed(300000L)
      val joined = a.join(b, a("bucket") === b("bucket") && a("id") === b("id"))
        .groupBy(a("bucket")).agg(count(lit(1)).as("n"),
          sum(a("amount") + b("amount")).as("total"))
      val rows = joined.collect()
      // correctness: every shared id joins exactly once
      assert(rows.map(_.getLong(1)).sum === 200000L)
      // NOTE: a raw plan.collect{case e: ShuffleExchangeExec} is VACUOUS
      // under AQE — TreeNode.collect does not descend into
      // AdaptiveSparkPlanExec's executedPlan, so it always found zero and
      // this test passed for a round while SPJ silently wasn't engaging
      // (join keys (bucket,id) ⊃ partition key (bucket) needs
      // spark.sql.requireAllClusterKeysForCoPartition=false, now set at
      // session build). PlanLint.lint descends properly.
      val findings = graft.ops.PlanLint.lint(joined)
      assert(findings.find(_.rule == "shuffle-count").map(_.detail).contains("0"),
        s"SPJ should need no exchange: $findings")
      val planStr = joined.queryExecution.executedPlan.toString
      assert(!planStr.contains("Sort "),
        s"reported (bucket,id) ordering should elide the merge sort:\n${planStr.take(1500)}")
    } finally {
      conf.set("spark.sql.sources.v2.bucketing.enabled", prevBucketing)
      conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      conf.set("spark.sql.requireAllClusterKeysForCoPartition", prevRequireAll)
    }
  }
}

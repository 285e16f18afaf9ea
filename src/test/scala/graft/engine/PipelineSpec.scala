package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import Fixtures.clock

  lazy val run = InsurancePipeline.run(Fixtures.raw(spark),
    Sink.Cached(), clock, parallelism = 4)
  lazy val outputs = run._1
  lazy val audit = run._2.cache()

  test("DAG topological order respects layers") {
    val order = new Dag(InsurancePipeline.models(clock), Sink.Cached()).topoOrder
    val pos = order.zipWithIndex.toMap
    assert(pos("customers_bronze") < pos("customers_silver"))
    assert(pos("customers_silver") < pos("gold_customer_360"))
    assert(pos("claims_silver") < pos("gold_executive_summary"))
    assert(order.size === 12)
  }

  test("all 12 models materialize with rows") {
    assert(outputs.size === 12)
    outputs.foreach { case (name, df) =>
      assert(df.count() > 0, s"$name is empty")
    }
  }

  test("audit log: one row per model, counts reconcile") {
    assert(audit.count() === 12)
    val rows = audit.collect().map(r =>
      r.getAs[String]("dataset") -> r).toMap
    // bronze is cast-only: source == target
    assert(rows("customers_bronze").getAs[Long]("source_records") ===
      rows("customers_bronze").getAs[Long]("target_records"))
    // customers silver: 7 bronze → 4 silver (2 missing-PK dropped, 1 dup)
    assert(rows("customers_silver").getAs[Long]("source_records") === 7L)
    assert(rows("customers_silver").getAs[Long]("target_records") === 4L)
    assert(audit.filter(col("bad_records") =!= 0).count() === 0)
  }

  test("gold_customer_360: per-customer KPIs") {
    val g = outputs("gold_customer_360")
    val byId = g.collect().map(r => r.getAs[String]("customer_id") -> r).toMap
    // C003/C004 have invalid emails → excluded from customer_base
    assert(byId.keySet === Set("C001", "C002"))
    val c1 = byId("C001")
    assert(c1.getAs[Long]("total_policies") === 2L)
    // premiums 1200 + 2400
    assert(c1.getAs[java.math.BigDecimal]("total_annual_premium")
      .compareTo(new java.math.BigDecimal("3600")) === 0)
    // claims on P001 (4500+1000) + P002 CL004 dedup→11000, CL005 settled -100
    assert(c1.getAs[Long]("total_claims") === 4L)
    assert(c1.getAs[Double]("total_settled") === 4500.0 + 1000.0 + 11000.0 - 100.0)
    assert(c1.getAs[Int]("fraud_flag") === 1) // CL002 fraud_indicator=1
    assert(c1.getAs[String]("generation_segment") === "Gen X") // age 35
    val c2 = byId("C002")
    assert(c2.getAs[Long]("total_claims") === 1L) // CL003 only (CL006 missing policy)
    assert(c2.getAs[Int]("churned_flag") === 1) // P003 ended 2024-03-01 < 2025-06-15
    assert(c2.getAs[String]("generation_segment") === "Boomer+") // age 65
  }

  test("gold_policy_performance: grain and claim join") {
    val g = outputs("gold_policy_performance")
    // policy_base excludes P005 (invalid premium) and P006 (invalid dates)
    val types = g.select("policy_type").distinct().collect().map(_.getString(0)).toSet
    assert(types === Set("Auto", "Home", "Life"))
    val auto202401 = g.filter(col("policy_type") === "Auto" &&
      col("policy_month") === lit("2024-01-01 00:00:00").cast("timestamp")).head()
    assert(auto202401.getAs[Long]("policy_count") === 1L) // P001
    // loss_ratio guarded: no row has null loss_ratio
    assert(g.filter(col("loss_ratio").isNull).count() === 0)
  }

  test("gold_executive_summary: full-outer month coalesce + global sort") {
    val g = outputs("gold_executive_summary")
    val months = g.select("report_period").collect()
      .map(_.getTimestamp(0).toString)
    // sorted DESC (the only top-level ORDER BY in the reference)
    assert(months.toSeq === months.sorted.reverse.toSeq)
    // claim months with no policy starts still appear (full outer)
    val m202403 = g.filter(col("report_period") ===
      lit("2024-03-01 00:00:00").cast("timestamp")).head()
    assert(m202403.getAs[Long]("total_claims") === 1L) // CL002
    // gwp=0 that month → loss_ratio guard → 0
    assert(m202403.getAs[Double]("loss_ratio") === 0.0)
  }

  test("gold_claims_operations: adjuster join and categories") {
    val g = outputs("gold_claims_operations")
    // CL006 (missing policy) and CL005-null-adjuster rows: CL005 has no
    // adjuster but is kept in claims_base (join is on policy/customer)
    assert(g.filter(col("adjuster_id") === "ADJ1").count() >= 1)
    val adj1 = g.filter(col("adjuster_id") === "ADJ1").head()
    // ADJ1 handled CL001 (ratio .9) and CL003 (ratio .975)
    assert(math.abs(adj1.getAs[Double]("adjuster_avg_settlement_ratio") - 0.9375) < 1e-9)
    assert(adj1.getAs[String]("state_risk_category") !== null)
    val cats = g.select("customer_age_category").distinct().collect()
      .map(_.getString(0)).toSet
    assert(cats.subsetOf(Set("Young Driver", "Mature Driver", "Senior Driver")))
  }

  test("claims_operations joins customers via the POLICY's customer id") {
    // a claim whose own customer_id is bogus must still reach the mart
    // through its policy's customer (reference joins p.customer_id)
    val rawClaims = Fixtures.rawClaims(spark)
      .withColumn("customer_id", lit("C-DOES-NOT-EXIST"))
    val claims = Silver.claims(Bronze.claims(rawClaims), Fixtures.clock)
    val policies = outputs("policies_silver")
    val customers = outputs("customers_silver")
    val mart = Gold.claimsOperations(claims, policies, customers, Fixtures.clock)
    // CL001 (policy P001 -> customer C001, state TX) must still appear
    assert(mart.filter(col("customer_state") === "TX").count() > 0)
  }

  test("row-count conservation: bronze = silver kept + dropped") {
    val bronzeC = outputs("customers_bronze")
    val silverC = outputs("customers_silver")
    val droppedMissing = bronzeC.filter(col("customer_id").isNull ||
      trim(col("customer_id")) === "").count()
    // trim: silver trims before flagging? (reference flags pre-trim value)
    val dupDropped = 1L
    assert(bronzeC.count() === silverC.count() + droppedMissing + dupDropped)
  }
}

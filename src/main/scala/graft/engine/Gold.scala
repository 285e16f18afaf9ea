package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Gold layer — the four analytic marts
  * (models/gold/gold_{customer_360,policy_performance,claims_operations,
  * executive_summary}.sql).
  *
  * The reference's hand-written dataflow optimizations are preserved as
  * plan shape (SURVEY.md §4): pre-aggregate-then-join (partial-agg
  * pushdown below joins is not something Catalyst does for us), and
  * quality-flag filters before the aggregates. The aggregated sides are
  * tiny relative to the base tables, so AQE picks broadcast-hash joins
  * for them at scale; claims⋈policies stays a shuffle join on policy_id.
  */
object Gold {
  private def cnt(p: Column): Column = count(when(p, 1))
  private def z(c: Column): Column = coalesce(c, lit(0))

  /** models/gold/gold_customer_360.sql — per-customer KPI mart. */
  def customer360(customers: DataFrame, policies: DataFrame,
      claims: DataFrame, clock: Clock = Clock.System): DataFrame = {
    val customerBase = customers
      .filter(col("invalid_email_flag") === 0)
      .select("customer_id", "full_name", "age", "annual_income",
        "credit_score", "state", "marital_status", "occupation", "processed_at")

    val policyMetrics = policies
      .filter(col("missing_customer_id_flag") === 0 &&
        col("invalid_premium_amount_flag") === 0)
      .groupBy("customer_id")
      .agg(
        // unique-by-construction (silver dedup): COUNT(DISTINCT pk) == COUNT(pk)
        count(col("policy_id")).as("total_policies"),
        sum(col("premium_amount")).as("total_annual_premium"),
        avg(col("premium_amount")).as("avg_policy_premium"),
        sum(col("coverage_amount")).as("total_coverage"),
        avg(col("coverage_amount")).as("avg_coverage"),
        min(col("start_date")).as("first_policy_date"),
        max(col("end_date")).as("latest_policy_end"),
        cnt(col("status") === "ACTIVE").as("active_policies"),
        cnt(col("status") === "CANCELLED").as("cancelled_policies"))

    val claimsMetrics = claims.alias("cl")
      .filter(col("missing_policy_flag") === 0)
      .join(policies.select("policy_id", "customer_id").alias("p"),
        Seq("policy_id"), "inner")
      .groupBy(col("p.customer_id").as("customer_id"))
      .agg(
        // unique-by-construction (silver dedup): COUNT(DISTINCT pk) == COUNT(pk)
        count(col("cl.claim_id")).as("total_claims"),
        sum(col("cl.claim_amount")).as("total_claimed"),
        sum(col("cl.settled_amount")).as("total_settled"),
        avg(col("cl.claim_amount")).as("avg_claim_amount"),
        avg(col("cl.reporting_delay_days")).as("avg_reporting_delay"),
        cnt(col("cl.fraud_indicator") === 1).as("potential_fraud_claims"),
        min(col("cl.claim_date")).as("first_claim_date"),
        max(col("cl.claim_date")).as("latest_claim_date"))

    val profit = z(col("total_annual_premium")) - z(col("total_settled"))

    customerBase
      .join(policyMetrics, Seq("customer_id"), "left")
      .join(claimsMetrics, Seq("customer_id"), "left")
      .select(
        col("customer_id"),
        col("full_name"),
        col("age"),
        when(col("age") < 25, "Gen Z")
          .when(col("age") < 35, "Millennial")
          .when(col("age") < 55, "Gen X")
          .otherwise("Boomer+").as("generation_segment"),
        col("annual_income"),
        col("credit_score"),
        col("state"),
        col("marital_status"),
        col("occupation"),
        z(col("total_policies")).as("total_policies"),
        z(col("total_annual_premium")).as("total_annual_premium"),
        z(col("avg_policy_premium")).as("avg_policy_premium"),
        z(col("total_coverage")).as("total_coverage"),
        z(col("active_policies")).as("active_policies"),
        z(col("cancelled_policies")).as("cancelled_policies"),
        col("first_policy_date"),
        col("latest_policy_end"),
        z(col("total_claims")).as("total_claims"),
        z(col("total_claimed")).as("total_claimed"),
        z(col("total_settled")).as("total_settled"),
        z(col("avg_claim_amount")).as("avg_claim_amount"),
        z(col("potential_fraud_claims")).as("potential_fraud_claims"),
        profit.as("customer_lifetime_profit"),
        when(z(col("total_annual_premium")) === 0, 0)
          .otherwise(z(col("total_settled")) / col("total_annual_premium"))
          .as("loss_ratio"),
        when(z(col("total_policies")) === 0, 0)
          .otherwise(z(col("total_claims")).cast(DoubleType) / col("total_policies"))
          .as("claims_frequency"),
        when(profit > 10000, "High Value")
          .when(profit > 5000, "Medium Value")
          .when(profit > 0, "Low Value")
          .otherwise("Loss Making").as("customer_value_segment"),
        when(z(col("total_claims")) === 0, "No Claims")
          .when(z(col("total_claims")).cast(DoubleType) /
            coalesce(col("total_policies"), lit(1)) < 0.1, "Low Risk")
          .when(z(col("total_claims")).cast(DoubleType) /
            coalesce(col("total_policies"), lit(1)) < 0.3, "Medium Risk")
          .otherwise("High Risk").as("risk_tier"),
        when(col("latest_policy_end") < clock.today, 1).otherwise(0)
          .as("churned_flag"),
        when(z(col("potential_fraud_claims")) > 0, 1).otherwise(0)
          .as("fraud_flag"),
        clock.today.as("report_date"),
        col("processed_at"))
  }

  /** models/gold/gold_policy_performance.sql — policy-type × month mart. */
  def policyPerformance(policies: DataFrame, claims: DataFrame,
      clock: Clock = Clock.System): DataFrame = {
    val policyBase = policies
      .filter(col("invalid_premium_amount_flag") === 0 &&
        col("invalid_coverage_amount_flag") === 0 &&
        col("invalid_date_range_flag") === 0)
      .groupBy(col("policy_type"), col("status"), col("payment_frequency"),
        date_trunc("month", col("start_date")).as("policy_month"))
      .agg(
        count(lit(1)).as("policy_count"),
        sum(col("premium_amount")).as("total_premium_revenue"),
        sum(col("coverage_amount")).as("total_coverage_exposure"),
        avg(col("premium_amount")).as("avg_premium"),
        avg(col("coverage_amount")).as("avg_coverage"),
        avg(col("deductible")).as("avg_deductible"),
        avg(col("policy_duration_days")).as("avg_policy_duration"))

    val claimsByType = claims.alias("cl")
      .filter(col("missing_policy_flag") === 0)
      .join(policies.select("policy_id", "policy_type").alias("p"),
        Seq("policy_id"), "inner")
      .groupBy(col("p.policy_type").as("policy_type"),
        date_trunc("month", col("cl.claim_date")).as("claim_month"))
      .agg(
        // unique-by-construction (silver dedup): COUNT(DISTINCT pk) == COUNT(pk)
        count(col("cl.claim_id")).as("total_claims"),
        sum(col("cl.claim_amount")).as("total_claim_amount"),
        sum(col("cl.settled_amount")).as("total_settled_amount"),
        avg(col("cl.claim_amount")).as("avg_claim_severity"),
        avg(col("cl.reporting_delay_days")).as("avg_reporting_delay"),
        cnt(col("cl.fraud_indicator") === 1).as("fraud_claims"))

    val pb = policyBase.alias("pb")
    val cp = claimsByType.alias("cp")
    val typeWin = Window.partitionBy(col("pb.policy_type"))
      .orderBy(col("pb.policy_month"))

    pb.join(cp,
        col("pb.policy_type") === col("cp.policy_type") &&
          col("pb.policy_month") === col("cp.claim_month"), "left")
      .select(
        col("pb.policy_type").as("policy_type"),
        col("pb.status").as("status"),
        col("pb.payment_frequency").as("payment_frequency"),
        col("pb.policy_month").as("policy_month"),
        col("pb.policy_count").as("policy_count"),
        col("pb.total_premium_revenue").as("total_premium_revenue"),
        col("pb.total_coverage_exposure").as("total_coverage_exposure"),
        col("pb.avg_premium").as("avg_premium"),
        col("pb.avg_coverage").as("avg_coverage"),
        col("pb.avg_deductible").as("avg_deductible"),
        col("pb.avg_policy_duration").as("avg_policy_duration"),
        z(col("cp.total_claims")).as("total_claims"),
        z(col("cp.total_claim_amount")).as("total_claim_amount"),
        z(col("cp.total_settled_amount")).as("total_settled_amount"),
        z(col("cp.avg_claim_severity")).as("avg_claim_severity"),
        z(col("cp.avg_reporting_delay")).as("avg_reporting_delay"),
        z(col("cp.fraud_claims")).as("fraud_claims"),
        when(col("pb.total_premium_revenue") > 0,
          z(col("cp.total_settled_amount")) / col("pb.total_premium_revenue"))
          .otherwise(0).as("loss_ratio"),
        when(col("pb.policy_count") > 0,
          z(col("cp.total_claims")).cast(DoubleType) / col("pb.policy_count"))
          .otherwise(0).as("claims_frequency"),
        (col("pb.total_premium_revenue") - z(col("cp.total_settled_amount")))
          .as("underwriting_profit"),
        when(z(col("cp.total_claims")) > 0,
          col("cp.fraud_claims").cast(DoubleType) / col("cp.total_claims"))
          .otherwise(0).as("fraud_rate"),
        when(z(col("cp.total_settled_amount")) /
          nullif(col("pb.total_premium_revenue"), lit(0)) <= 0.6, "Excellent")
          .when(z(col("cp.total_settled_amount")) /
            nullif(col("pb.total_premium_revenue"), lit(0)) <= 0.8, "Good")
          .when(z(col("cp.total_settled_amount")) /
            nullif(col("pb.total_premium_revenue"), lit(0)) <= 1.0, "Average")
          .otherwise("Poor").as("performance_tier"),
        lag(col("pb.total_premium_revenue"), 12).over(typeWin)
          .as("premium_revenue_prev_year"),
        lag(col("pb.policy_count"), 12).over(typeWin)
          .as("policy_count_prev_year"),
        clock.today.as("report_date"))
  }

  /** models/gold/gold_claims_operations.sql — claims-ops × adjuster mart. */
  def claimsOperations(claims: DataFrame, policies: DataFrame,
      customers: DataFrame, clock: Clock = Clock.System): DataFrame = {
    val claimsBase = claims.alias("cl")
      .filter(col("cl.missing_policy_flag") === 0)
      .join(policies.select("policy_id", "customer_id", "policy_type").alias("p"),
        Seq("policy_id"), "inner")
      // the reference joins on the POLICY's customer (p.customer_id =
      // c.customer_id, gold_claims_operations.sql:41); claims carry their
      // own customer_id, so an implicit USING join would silently bind to
      // the wrong column
      .join(customers.select(col("customer_id").as("cust_id"), col("state"),
        col("age")).alias("c"),
        col("p.customer_id") === col("cust_id"), "inner")
      .groupBy(col("cl.claim_type").as("claim_type"),
        col("cl.severity").as("severity"),
        col("cl.status").as("status"),
        col("cl.adjuster_id").as("adjuster_id"),
        date_trunc("month", col("cl.claim_date")).as("claim_month"),
        col("p.policy_type").as("policy_type"),
        col("c.state").as("customer_state"),
        col("c.age").as("customer_age"))
      .agg(
        count(lit(1)).as("claim_count"),
        sum(col("cl.claim_amount")).as("total_claim_amount"),
        sum(col("cl.settled_amount")).as("total_settled_amount"),
        avg(col("cl.claim_amount")).as("avg_claim_amount"),
        avg(col("cl.settled_amount")).as("avg_settled_amount"),
        avg(col("cl.reporting_delay_days")).as("avg_reporting_delay"),
        avg(col("cl.settlement_ratio")).as("avg_settlement_ratio"),
        cnt(col("cl.fraud_indicator") === 1).as("potential_fraud_cases"))

    val adjusterPerformance = claims
      .filter(col("adjuster_id").isNotNull)
      .groupBy("adjuster_id")
      .agg(
        count(lit(1)).as("total_claims_handled"),
        avg(col("settlement_ratio")).as("ap_avg_settlement_ratio"),
        avg(col("reporting_delay_days")).as("avg_processing_time"),
        sum(when(col("fraud_indicator") === 1, 1).otherwise(0))
          .as("fraud_cases_detected"))

    val typeWin = Window.partitionBy(col("claim_type")).orderBy(col("claim_month"))

    claimsBase
      .join(adjusterPerformance, Seq("adjuster_id"), "left")
      .select(
        col("claim_type"), col("severity"), col("status"), col("adjuster_id"),
        col("claim_month"), col("policy_type"), col("customer_state"),
        col("claim_count"), col("total_claim_amount"),
        col("total_settled_amount"), col("avg_claim_amount"),
        col("avg_settled_amount"), col("avg_reporting_delay"),
        col("avg_settlement_ratio"), col("potential_fraud_cases"),
        when(col("claim_count") > 0,
          col("potential_fraud_cases").cast(DoubleType) / col("claim_count"))
          .otherwise(0).as("fraud_rate"),
        col("total_claims_handled").as("adjuster_total_claims"),
        col("ap_avg_settlement_ratio").as("adjuster_avg_settlement_ratio"),
        col("avg_processing_time").as("adjuster_avg_processing_time"),
        col("fraud_cases_detected").as("adjuster_fraud_detected"),
        when(col("ap_avg_settlement_ratio") >= 0.9 &&
          col("avg_processing_time") <= 7, "High Performer")
          .when(col("ap_avg_settlement_ratio") >= 0.8 &&
            col("avg_processing_time") <= 14, "Good Performer")
          .when(col("ap_avg_settlement_ratio") >= 0.7 &&
            col("avg_processing_time") <= 21, "Average Performer")
          .otherwise("Needs Improvement").as("adjuster_performance_tier"),
        when(col("customer_state").isin("FL", "TX", "CA"), "High Risk State")
          .when(col("customer_state").isin("NY", "NJ", "CT"), "Medium Risk State")
          .otherwise("Low Risk State").as("state_risk_category"),
        when(col("customer_age") < 25, "Young Driver")
          .when(col("customer_age").between(25, 65), "Mature Driver")
          .otherwise("Senior Driver").as("customer_age_category"),
        lag(col("claim_count"), 1).over(typeWin).as("prev_month_claims"),
        lag(col("total_claim_amount"), 1).over(typeWin)
          .as("prev_month_claim_amount"),
        clock.today.as("report_date"))
  }

  /** models/gold/gold_executive_summary.sql — monthly company KPI mart. */
  def executiveSummary(policies: DataFrame, claims: DataFrame,
      clock: Clock = Clock.System): DataFrame = {
    val monthlyFinancials = policies
      .filter(col("invalid_premium_amount_flag") === 0)
      .groupBy(date_trunc("month", col("start_date")).as("report_period"))
      .agg(
        // unique-by-construction (silver dedup): COUNT(DISTINCT pk) == COUNT(pk)
        count(col("policy_id")).as("new_policies"),
        countDistinct(col("customer_id")).as("active_customers"),
        sum(col("premium_amount")).as("gross_written_premium"),
        sum(col("coverage_amount")).as("total_coverage_in_force"),
        avg(col("premium_amount")).as("avg_policy_premium"))

    val monthlyClaims = claims
      .filter(col("missing_policy_flag") === 0)
      .groupBy(date_trunc("month", col("claim_date")).as("report_period"))
      .agg(
        // unique-by-construction (silver dedup): COUNT(DISTINCT pk) == COUNT(pk)
        count(col("claim_id")).as("total_claims"),
        sum(col("claim_amount")).as("total_incurred_claims"),
        sum(col("settled_amount")).as("total_paid_claims"),
        avg(col("claim_amount")).as("avg_claim_severity"),
        cnt(col("fraud_indicator") === 1).as("fraud_claims"))

    // USING-style full outer join coalesces report_period for free
    // (SURVEY.md §2.3 J4)
    val kpis = monthlyFinancials.join(monthlyClaims, Seq("report_period"), "full_outer")
      .select(
        col("report_period"),
        z(col("new_policies")).as("new_policies"),
        z(col("active_customers")).as("active_customers"),
        z(col("gross_written_premium")).as("gross_written_premium"),
        z(col("total_coverage_in_force")).as("total_coverage_in_force"),
        z(col("avg_policy_premium")).as("avg_policy_premium"),
        z(col("total_claims")).as("total_claims"),
        z(col("total_incurred_claims")).as("total_incurred_claims"),
        z(col("total_paid_claims")).as("total_paid_claims"),
        z(col("avg_claim_severity")).as("avg_claim_severity"),
        z(col("fraud_claims")).as("fraud_claims"),
        when(z(col("gross_written_premium")) > 0,
          z(col("total_paid_claims")) / col("gross_written_premium"))
          .otherwise(0).as("loss_ratio"),
        when(z(col("new_policies")) > 0,
          z(col("total_claims")).cast(DoubleType) / col("new_policies"))
          .otherwise(0).as("claims_frequency"),
        (z(col("gross_written_premium")) - z(col("total_paid_claims")))
          .as("underwriting_profit"),
        when(z(col("total_claims")) > 0,
          col("fraud_claims").cast(DoubleType) / col("total_claims"))
          .otherwise(0).as("fraud_rate"))

    // Single-partition window — acceptable at monthly-mart cardinality
    // (SURVEY.md §2.5 W3): the input here is ≤ one row per month.
    val globalWin = Window.orderBy(col("report_period"))
    def lag12(c: Column): Column = lag(c, 12).over(globalWin)

    kpis.select(
        col("report_period"),
        col("new_policies"), col("active_customers"), col("total_claims"),
        col("gross_written_premium"), col("total_coverage_in_force"),
        col("total_incurred_claims"), col("total_paid_claims"),
        col("underwriting_profit"),
        col("loss_ratio"), col("claims_frequency"), col("fraud_rate"),
        col("avg_policy_premium"), col("avg_claim_severity"),
        lag12(col("gross_written_premium")).as("gwp_prev_year"),
        lag12(col("new_policies")).as("policies_prev_year"),
        lag12(col("underwriting_profit")).as("profit_prev_year"),
        when(lag12(col("gross_written_premium")) > 0,
          (col("gross_written_premium") - lag12(col("gross_written_premium")))
            / lag12(col("gross_written_premium")) * 100)
          .otherwise(0).as("gwp_growth_rate_yoy"),
        when(lag12(col("new_policies")) > 0,
          (col("new_policies") - lag12(col("new_policies")))
            / lag12(col("new_policies")).cast(DoubleType) * 100)
          .otherwise(0).as("policy_growth_rate_yoy"),
        when(col("loss_ratio") <= 0.6, "Excellent")
          .when(col("loss_ratio") <= 0.8, "Good")
          .when(col("loss_ratio") <= 1.0, "Acceptable")
          .otherwise("Concerning").as("performance_category"),
        clock.today.as("report_date"),
        clock.now.as("created_at"))
      .orderBy(col("report_period").desc)
  }
}

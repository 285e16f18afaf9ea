package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Locks the reference-semantics decisions called out in SURVEY.md §7's
  * risk register:
  *  - LAG(12) is 12 ROWS back, labeled "prev_year" — with month gaps it
  *    deliberately does NOT mean month-minus-12 (do not "fix" it);
  *  - division guards return 0 (not NULL) when the denominator is 0;
  *  - full-outer month coalesce keeps claim-only months.
  */
class GoldSemanticsSpec extends SparkSpec {
  import Fixtures.clock

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def d(s: String) = java.sql.Date.valueOf(s)
  private def dec(v: String) = new java.math.BigDecimal(v)

  /** One ACTIVE monthly policy per listed start month, same type. */
  private def policiesForMonths(months: Seq[String],
      premium: String = "100.00") = {
    val rows = months.zipWithIndex.map { case (m, i) =>
      Row(s"P$i", s"C$i", "auto", dec("1000.00"), dec(premium), dec("50.00"),
        d(m), d("2030-01-01"), "active", "A1", "U1", "monthly",
        ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), null,
        "f.csv", ts("2024-01-01 00:00:00"))
    }
    Silver.policies(Bronze.policies(spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Schemas.policies)), clock)
  }

  private val emptyClaims = Silver.claims(Bronze.claims(
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row], Schemas.claims)),
    clock)

  test("policy_performance LAG(12) is rows-based: gaps shift the 'prev year'") {
    // 14 monthly buckets with a GAP: 2020-01..2020-06, then 2021-01..2021-08
    val months = (1 to 6).map(m => f"2020-$m%02d-01") ++
      (1 to 8).map(m => f"2021-$m%02d-01")
    val gold = Gold.policyPerformance(policiesForMonths(months), emptyClaims,
      clock).orderBy("policy_month").collect()
    assert(gold.length === 14)
    // row 13 (0-based 12) is 2021-07; 12 ROWS back is 2020-01 — NOT 2020-07
    val lagged = gold.filter(r => !r.isNullAt(r.fieldIndex("policy_count_prev_year")))
    assert(lagged.length === 2) // only the 13th and 14th rows have a lag value
    val first = lagged.head
    assert(first.getAs[java.sql.Timestamp]("policy_month").toString
      .startsWith("2021-07"))
    // the lag took the value from 12 rows earlier (2020-01's count = 1)
    assert(first.getAs[Long]("policy_count_prev_year") === 1L)
  }

  test("division guards yield 0, not NULL, on zero denominators") {
    // a policy whose only claim month has no matching policy month →
    // claims-side coalesce paths; and a base with zero premium revenue
    val gold = Gold.policyPerformance(policiesForMonths(Seq("2020-01-01")),
      emptyClaims, clock).collect()
    val r = gold.head
    assert(r.getAs[Double]("loss_ratio") === 0.0)
    assert(r.getAs[Double]("claims_frequency") === 0.0)
    assert(r.getAs[Double]("fraud_rate") === 0.0)
    // revenue > 0, settled 0: 0/revenue = 0 ≤ 0.6 → Excellent
    assert(r.getAs[String]("performance_tier") === "Excellent")
    // zero premium revenue: NULLIF(0) denominator → NULL division → all
    // WHENs false → 'Poor', but the guarded loss_ratio still yields 0
    // (reference semantics, preserved)
    val zero = Gold.policyPerformance(
      policiesForMonths(Seq("2020-01-01"), premium = "0.00"),
      emptyClaims, clock).collect().head
    assert(zero.getAs[Double]("loss_ratio") === 0.0)
    assert(zero.getAs[String]("performance_tier") === "Poor")
  }

  test("executive summary keeps claim-only months via full outer join") {
    val policies = policiesForMonths(Seq("2020-01-01"))
    val claimRows = Seq(Row("CL1", "P0", "C0", ts("2022-05-10 00:00:00"),
      ts("2022-05-11 00:00:00"), 500.0, 400.0, Integer.valueOf(100),
      "collision", "settled", "ADJ1", "auto", "low", Integer.valueOf(0),
      ts("2024-01-01 00:00:00"), ts("2024-01-01 00:00:00"), "f.csv",
      ts("2024-01-01 00:00:00")))
    val claims = Silver.claims(Bronze.claims(spark.createDataFrame(
      spark.sparkContext.parallelize(claimRows, 1), Schemas.claims)), clock)
    val summary = Gold.executiveSummary(policies, claims, clock).collect()
    assert(summary.length === 2) // one policy month + one claim-only month
    val claimMonth = summary.find(
      _.getAs[java.sql.Timestamp]("report_period").toString.startsWith("2022-05")).get
    assert(claimMonth.getAs[Long]("new_policies") === 0L)
    assert(claimMonth.getAs[Long]("total_claims") === 1L)
    assert(claimMonth.getAs[Double]("loss_ratio") === 0.0) // gwp=0 guard
  }
}

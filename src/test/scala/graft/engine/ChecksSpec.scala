package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** dbt generic-test analogues: not_null/unique (reference suite) plus
  * accepted_values and relationships. */
class ChecksSpec extends SparkSpec {
  import Fixtures.clock

  private lazy val silver = {
    val claims = Silver.claims(Bronze.claims(Fixtures.rawClaims(spark)), clock)
    val policies = Silver.policies(Bronze.policies(Fixtures.rawPolicies(spark)), clock)
    (claims, policies)
  }

  test("accepted_values: passes on the real domain, counts rows outside it") {
    val (claims, _) = silver
    val ok = Checks.acceptedValues(claims, "claims_silver", "severity",
      Seq("LOW", "MEDIUM", "HIGH", "CRITICAL"))
    assert(ok.passed, s"unexpected severities: ${ok.violations}")
    val bad = Checks.acceptedValues(claims, "claims_silver", "severity",
      Seq("LOW"))
    assert(!bad.passed && bad.violations > 0)
    // nulls never violate accepted_values (dbt semantics)
    import spark.implicits._
    val withNull = Seq(Some("LOW"), None).toDF("severity")
    assert(Checks.acceptedValues(withNull, "t", "severity", Seq("LOW")).passed)
  }

  test("relationships: counts orphaned foreign keys via anti join") {
    val (claims, policies) = silver
    val res = Checks.relationships(claims, "claims_silver", "policy_id",
      policies, "policy_id")
    // fixture CL006 references a policy that does not exist
    val expected = claims.filter(col("missing_policy_flag") === 0)
      .join(policies.select("policy_id"), Seq("policy_id"), "left_anti")
      .count() + claims.filter(col("missing_policy_flag") === 1 &&
        col("policy_id").isNotNull).count()
    assert(res.violations === expected)
    assert(res.violations > 0, "fixtures must contain an orphaned claim")
    // a table is always consistent with itself
    assert(Checks.relationships(policies, "policies_silver", "policy_id",
      policies, "policy_id").passed)
  }
}

package graft.engine

import graft.SparkSpec

class TypedEntitiesSpec extends SparkSpec {
  import Fixtures.clock

  test("typed Dataset views roundtrip the silver schemas") {
    val cs = TypedEntities.customers(
      Silver.customers(Bronze.customers(Fixtures.rawCustomers(spark)), clock))
    val rows = cs.collect()
    assert(rows.nonEmpty)
    val alice = rows.find(_.customer_id == "C001").get
    assert(alice.full_name == "Alice Smith")
    assert(alice.age.contains(35))
    assert(alice.annual_income == BigDecimal("85000.00"))

    val cls = TypedEntities.claims(
      Silver.claims(Bronze.claims(Fixtures.rawClaims(spark)), clock))
    // typed transform: total settled for non-flagged claims
    val settled = cls.filter(c => c.missing_policy_flag == 0 &&
        c.invalid_settled_amount_flag == 0)
      .collect().map(_.settled_amount).sum
    assert(settled > 0)
  }
}

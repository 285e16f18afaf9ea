package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

/** Deterministic adversarial insurance fixtures (FIXTURES.md §A): duplicate
  * PKs with differing recency, null/empty PKs, negative amounts, invalid
  * emails, inverted date ranges — one seeded defect per silver quality
  * flag, so every branch of the clean/flag/dedup logic is exercised.
  */
object Fixtures {
  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
  private def d(s: String) = java.sql.Date.valueOf(s)
  private def dec(v: String) = new java.math.BigDecimal(v)

  /** Fixed clock for deterministic processed_at / age / report_date. */
  val clock: Clock = Clock.Fixed(java.time.Instant.parse("2025-06-15T12:00:00Z"))

  def rawCustomers(spark: SparkSession): DataFrame = {
    val rows = Seq(
      // clean row
      // NOTE: email must have no surrounding whitespace — the reference's
      // invalid_email_flag regex-checks the RAW column (pre-trim), so a
      // padded email counts as invalid (customers_silver.sql:50-53).
      Row("C001", "  alice ", " SMITH ", "Alice.Smith@Example.COM", "555-0001",
        d("1990-03-15"), "1 Main St", "Austin", "TX", "78701", dec("85000.00"),
        720, "married", "engineer", ts("2024-01-01 00:00:00"), ts("2024-06-01 00:00:00"),
        "f1.csv", ts("2024-06-01 01:00:00")),
      // duplicate PK: later updated_at must win (W1 dedup)
      Row("C002", "bob", "jones", "bob@old.example.com", "555-0002",
        d("1960-07-01"), "2 Oak Ave", "Miami", "FL", "33101", dec("60000.00"),
        650, "single", "teacher", ts("2024-01-01 00:00:00"), ts("2024-03-01 00:00:00"),
        "f1.csv", ts("2024-03-01 01:00:00")),
      Row("C002", "bob", "jones", "bob@new.example.com", "555-0002",
        d("1960-07-01"), "2 Oak Ave", "Miami", "FL", "33101", dec("61000.00"),
        655, "single", "teacher", ts("2024-01-01 00:00:00"), ts("2024-05-01 00:00:00"),
        "f2.csv", ts("2024-05-01 01:00:00")),
      // invalid email
      Row("C003", "carol", "wu", "not-an-email", "555-0003",
        d("2003-11-20"), "3 Pine Rd", "NYC", "NY", "10001", dec("40000.00"),
        600, "single", "student", ts("2024-02-01 00:00:00"), ts("2024-02-01 00:00:00"),
        "f1.csv", ts("2024-02-01 01:00:00")),
      // null email
      Row("C004", "dan", "lee", null, "555-0004",
        d("1985-01-05"), "4 Elm St", "LA", "CA", "90001", dec("120000.00"),
        780, "married", "doctor", ts("2024-02-01 00:00:00"), ts("2024-02-01 00:00:00"),
        "f1.csv", ts("2024-02-01 01:00:00")),
      // missing PK (empty) — dropped by silver
      Row("", "eve", "null-id", "eve@example.com", "555-0005",
        d("1970-05-05"), "5 Oak St", "Boston", "MA", "02101", dec("70000.00"),
        700, "married", "nurse", ts("2024-03-01 00:00:00"), ts("2024-03-01 00:00:00"),
        "f1.csv", ts("2024-03-01 01:00:00")),
      // missing PK (null) — dropped by silver
      Row(null, "frank", "noid", "frank@example.com", "555-0006",
        null, "6 Ash St", "Denver", "CO", "80201", dec("55000.00"),
        640, "single", "chef", ts("2024-03-01 00:00:00"), ts("2024-03-01 00:00:00"),
        "f1.csv", ts("2024-03-01 01:00:00")))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Schemas.customers)
  }

  def rawPolicies(spark: SparkSession): DataFrame = {
    def p(id: String, cust: String, ptype: String, cov: String, prem: String,
        ded: String, start: String, end: String, status: String,
        upd: String): Row =
      Row(id, cust, ptype, dec(cov), dec(prem), dec(ded), d(start), d(end),
        status, "A1", "U1", "monthly", ts("2024-01-01 00:00:00"), ts(upd),
        null, "p1.csv", ts("2024-06-01 01:00:00"))
    val rows = Seq(
      p("P001", "C001", "auto", "50000.00", "1200.00", "500.00",
        "2024-01-10", "2025-01-10", "active", "2024-06-01 00:00:00"),
      p("P002", "C001", "home", "300000.00", "2400.00", "1000.00",
        "2024-02-15", "2025-02-15", "active", "2024-06-01 00:00:00"),
      p("P003", "C002", "auto", "40000.00", "1100.00", "500.00",
        "2023-03-01", "2024-03-01", "cancelled", "2024-06-01 00:00:00"),
      // duplicate PK — later updated_at wins
      p("P004", "C003", "life", "100000.00", "800.00", "0.00",
        "2024-04-01", "2034-04-01", "active", "2024-04-01 00:00:00"),
      p("P004", "C003", "life", "150000.00", "900.00", "0.00",
        "2024-04-01", "2034-04-01", "active", "2024-05-01 00:00:00"),
      // negative premium → invalid_premium_amount_flag
      p("P005", "C004", "auto", "60000.00", "-50.00", "500.00",
        "2024-05-01", "2025-05-01", "active", "2024-06-01 00:00:00"),
      // inverted date range → invalid_date_range_flag
      p("P006", "C004", "home", "250000.00", "2000.00", "1000.00",
        "2025-06-01", "2024-06-01", "pending", "2024-06-01 00:00:00"),
      // missing customer id → missing_customer_id_flag (kept, flagged)
      p("P007", "", "auto", "30000.00", "950.00", "250.00",
        "2023-01-10", "2026-01-10", "active", "2024-06-01 00:00:00"),
      // missing PK — dropped
      p("", "C002", "auto", "10000.00", "500.00", "100.00",
        "2024-01-01", "2025-01-01", "active", "2024-06-01 00:00:00"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Schemas.policies)
  }

  def rawClaims(spark: SparkSession): DataFrame = {
    def c(id: String, pol: String, cust: String, cdate: String, rdate: String,
        camt: java.lang.Double, samt: java.lang.Double, fraud: Integer,
        adjuster: String, ctype: String, upd: String): Row =
      Row(id, pol, cust, ts(cdate), ts(rdate), camt, samt, Integer.valueOf(500),
        "collision", "settled", adjuster, ctype, "medium", fraud,
        ts("2024-01-01 00:00:00"), ts(upd), "c1.csv", ts("2024-06-01 01:00:00"))
    val rows = Seq(
      c("CL001", "P001", "C001", "2024-02-10 08:00:00", "2024-02-12 08:00:00",
        5000.0, 4500.0, 0, "ADJ1", "auto", "2024-06-01 00:00:00"),
      c("CL002", "P001", "C001", "2024-03-05 08:00:00", "2024-03-25 08:00:00",
        2000.0, 1000.0, 1, "ADJ2", "auto", "2024-06-01 00:00:00"),
      c("CL003", "P003", "C002", "2024-01-20 08:00:00", "2024-01-21 08:00:00",
        8000.0, 7800.0, 0, "ADJ1", "auto", "2024-06-01 00:00:00"),
      // duplicate PK — later wins (settled_amount differs)
      c("CL004", "P002", "C001", "2024-04-01 08:00:00", "2024-04-02 08:00:00",
        12000.0, 0.0, 0, "ADJ3", "home", "2024-04-10 00:00:00"),
      c("CL004", "P002", "C001", "2024-04-01 08:00:00", "2024-04-02 08:00:00",
        12000.0, 11000.0, 0, "ADJ3", "home", "2024-05-10 00:00:00"),
      // negative settled → invalid_settled_amount_flag; zero claim_amount
      // → settlement_ratio NULL
      c("CL005", "P002", "C001", "2024-05-01 08:00:00", "2024-05-03 08:00:00",
        0.0, -100.0, 0, null, "home", "2024-06-01 00:00:00"),
      // missing policy id → missing_policy_flag (kept, flagged, excluded by gold)
      c("CL006", "", "C002", "2024-05-15 08:00:00", "2024-05-18 08:00:00",
        3000.0, 2500.0, 1, "ADJ2", "auto", "2024-06-01 00:00:00"),
      // missing PK — dropped
      c(null, "P001", "C001", "2024-05-20 08:00:00", "2024-05-21 08:00:00",
        1000.0, 900.0, 0, "ADJ1", "auto", "2024-06-01 00:00:00"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Schemas.claims)
  }

  def rawPremiums(spark: SparkSession): DataFrame = {
    def pr(id: String, pol: String, cust: String, amt: java.lang.Double,
        late: java.lang.Double, status: String, fileTime: String): Row =
      Row(id, pol, cust, ts("2024-02-01 00:00:00"), ts("2024-02-15 00:00:00"),
        amt, "monthly", " credit card ", status, late, 0.0, 10.0,
        if (amt == null) null else java.lang.Double.valueOf(amt + 10.0),
        s"T-$id", " stripe ", ts("2024-01-01 00:00:00"),
        ts("2024-02-01 00:00:00"), "pr1.csv", ts(fileTime))
    val rows = Seq(
      pr("PM001", "P001", "C001", 100.0, 0.0, "paid", "2024-02-01 01:00:00"),
      // duplicate PK — later source_file_time wins
      pr("PM002", "P002", "C001", 200.0, 0.0, "pending", "2024-02-01 01:00:00"),
      pr("PM002", "P002", "C001", 200.0, 5.0, "paid", "2024-03-01 01:00:00"),
      // negative amounts — clamped to 0, not flagged
      pr("PM003", "P003", "C002", -50.0, -1.0, "paid", "2024-02-01 01:00:00"))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Schemas.premiums)
  }

  def raw(spark: SparkSession): Map[String, DataFrame] = Map(
    "raw_customers" -> rawCustomers(spark),
    "raw_policies" -> rawPolicies(spark),
    "raw_claims" -> rawClaims(spark),
    "raw_premiums" -> rawPremiums(spark))
}

package graft.engine

import org.apache.spark.sql.types._

/** Declared schemas for the four raw insurance entities — the bronze CAST
  * targets (reference: models/bronze/{customers,policies,claims,premiums}
  * _bronze.sql; see FIXTURES.md). These are the authoritative bronze
  * schemas: bronze is a pure cast-projection onto them.
  *
  * The DECIMAL(18,2)-vs-DOUBLE money inconsistency (customers/policies are
  * DECIMAL, claims/premiums are DOUBLE, deductible_amount is INT) is the
  * reference's own semantics (SURVEY.md §1) and is preserved verbatim.
  */
object Schemas {
  private val S = StringType
  private val TS = TimestampType
  private val money = DecimalType(18, 2)

  /** Ingestion metadata carried through every layer
    * (models/bronze/customers_bronze.sql:40-41). */
  val meta: Seq[StructField] = Seq(
    StructField("source_file_path", S),
    StructField("source_file_time", TS))

  val customers: StructType = StructType(Seq(
    StructField("customer_id", S),
    StructField("first_name", S),
    StructField("last_name", S),
    StructField("email", S),
    StructField("phone", S),
    StructField("date_of_birth", DateType),
    StructField("address", S),
    StructField("city", S),
    StructField("state", S),
    StructField("zip_code", S),
    StructField("annual_income", money),
    StructField("credit_score", IntegerType),
    StructField("marital_status", S),
    StructField("occupation", S),
    StructField("created_at", TS),
    StructField("updated_at", TS)) ++ meta)

  val policies: StructType = StructType(Seq(
    StructField("policy_id", S),
    StructField("customer_id", S),
    StructField("policy_type", S),
    StructField("coverage_amount", money),
    StructField("premium_amount", money),
    StructField("deductible", money),
    StructField("start_date", DateType),
    StructField("end_date", DateType),
    StructField("status", S),
    StructField("agent_id", S),
    StructField("underwriter_id", S),
    StructField("payment_frequency", S),
    StructField("created_at", TS),
    StructField("updated_at", TS),
    // Auto Loader schema-rescue artifact, policies only
    // (models/bronze/policies_bronze.sql:38)
    StructField("_rescued_data", S)) ++ meta)

  val claims: StructType = StructType(Seq(
    StructField("claim_id", S),
    StructField("policy_id", S),
    StructField("customer_id", S),
    StructField("claim_date", TS),
    StructField("reported_date", TS),
    StructField("claim_amount", DoubleType),
    StructField("settled_amount", DoubleType),
    StructField("deductible_amount", IntegerType),
    StructField("claim_reason", S),
    StructField("status", S),
    StructField("adjuster_id", S),
    StructField("claim_type", S),
    StructField("severity", S),
    StructField("fraud_indicator", IntegerType),
    StructField("created_at", TS),
    StructField("updated_at", TS)) ++ meta)

  val premiums: StructType = StructType(Seq(
    StructField("premium_id", S),
    StructField("policy_id", S),
    StructField("customer_id", S),
    StructField("payment_date", TS),
    StructField("due_date", TS),
    StructField("premium_amount", DoubleType),
    StructField("payment_frequency", S),
    StructField("payment_method", S),
    StructField("payment_status", S),
    StructField("late_fee", DoubleType),
    StructField("discount_applied", DoubleType),
    StructField("tax_amount", DoubleType),
    StructField("total_amount", DoubleType),
    StructField("transaction_id", S),
    StructField("payment_processor", S),
    StructField("created_at", TS),
    StructField("updated_at", TS)) ++ meta)

  /** Audit-log row shape (models/bronze/customers_bronze.sql:6-7). */
  val auditLog: StructType = StructType(Seq(
    StructField("dataset", S),
    StructField("layer", S),
    StructField("time_processed", TS),
    StructField("source_records", LongType),
    StructField("target_records", LongType),
    StructField("bad_records", LongType)))
}

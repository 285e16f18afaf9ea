package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data tests — the Spark analogue of dbt's `not_null` /
  * `unique` schema tests (models/bronze/bronze_schema.yml; SURVEY.md §5).
  * Each check returns the violating-row count (dbt fails if count > 0).
  */
object Checks {
  final case class CheckResult(table: String, column: String, check: String,
      violations: Long) {
    def passed: Boolean = violations == 0L
  }

  def notNull(df: DataFrame, table: String, column: String): CheckResult =
    CheckResult(table, column, "not_null",
      df.filter(col(column).isNull).count())

  def unique(df: DataFrame, table: String, column: String): CheckResult =
    CheckResult(table, column, "unique",
      df.filter(col(column).isNotNull).groupBy(col(column))
        .agg(count(lit(1)).as("n")).filter(col("n") > 1).count())

  /** dbt's `accepted_values` generic test: rows whose column value falls
    * outside the allowed set (nulls pass — dbt composes with not_null). */
  def acceptedValues(df: DataFrame, table: String, column: String,
      values: Seq[String]): CheckResult =
    CheckResult(table, column, "accepted_values",
      df.filter(col(column).isNotNull && !col(column).isin(values: _*)).count())

  /** dbt's `relationships` generic test: referential integrity — child
    * rows whose FK has no match in the parent column. Planned as a
    * left-anti join, so at scale it is one hash join probing the
    * DISTINCT parent keys (broadcast when small), never a row-by-row
    * lookup. */
  def relationships(child: DataFrame, table: String, fk: String,
      parent: DataFrame, parentKey: String): CheckResult =
    CheckResult(table, fk, "relationships",
      child.filter(col(fk).isNotNull)
        .join(parent.select(col(parentKey).as(fk)).distinct(),
          Seq(fk), "left_anti")
        .count())

  /** The reference's complete test suite: not_null + unique on each bronze
    * primary key (bronze_schema.yml:9-11,22-24,33-35,44-46). */
  def bronzeSuite(bronze: Map[String, DataFrame]): Seq[CheckResult] = {
    val pks = Seq(
      "customers_bronze" -> "customer_id",
      "policies_bronze" -> "policy_id",
      "claims_bronze" -> "claim_id",
      "premiums_bronze" -> "premium_id")
    pks.flatMap { case (t, pk) =>
      bronze.get(t).toSeq.flatMap(df =>
        Seq(notNull(df, t, pk), unique(df, t, pk)))
    }
  }
}

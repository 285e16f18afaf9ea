package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Relational operator inventory — one query per SURVEY.md §2 row,
  * expressed over the TPC-H-ish testdata schema with a DuckDB oracle twin
  * (registered in [[graft.SparkEntry]]).
  *
  * Determinism rules (both engines must produce bit-identical values):
  *  - sums of DOUBLE go through DECIMAL(18,4): exact, order-independent,
  *    then cast back to DOUBLE (exact decimal→double is deterministic);
  *  - averages are built as decimal-sum / count (double division of
  *    identical operands is IEEE-deterministic);
  *  - every aggregate/computed column is aliased identically in the Spark
  *    plan and the oracle SQL (driver hashes by column name).
  */
object RelationalOps {
  import Tables._

  /** SUM(CAST(x AS DECIMAL(18,4))) cast back to double — order-independent
    * exact sum, identical in Spark and DuckDB. Scale 4 (not 2) so that
    * products of two 2-decimal values land exactly on the decimal grid and
    * the cast never sits on a rounding midpoint (where Spark's HALF_UP and
    * DuckDB's rounding would disagree). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  /** Deterministic average: exact decimal sum / count. */
  def davg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 4))).cast(DoubleType) / count(c))

  // ---------------------------------------------------------------- §2.4 A1-A5
  /** Pricing-summary style aggregation (A1 count, A3 sum, A4 avg, A8 multi-key
    * group). Partial aggregation (map-side combine) is automatic via
    * HashAggregateExec partial/final. */
  def q01Agg(s: SparkSession, d: String): DataFrame =
    lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** All queries + oracles owned by this module. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg" -> (q01Agg _)
  )

  def oracles: Map[String, String] = Map(
    "q01_agg" -> q01Sql
  )
}

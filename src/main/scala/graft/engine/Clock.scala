package graft.engine

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Injectable clock so CURRENT_TIMESTAMP / CURRENT_DATE semantics
  * (reference: models/silver/customers_silver.sql:42,45,
  * models/gold/gold_customer_360.sql:134,144) are deterministic in tests.
  *
  * `now`/`today` are Columns: the production clock keeps Spark's
  * plan-time-constant `current_timestamp()`/`current_date()` semantics
  * (evaluated once per query, not per row — same as the warehouse), the
  * fixed clock substitutes literals.
  */
trait Clock {
  def now: Column
  def today: Column
  /** Driver-side instant for non-plan timestamps (the audit post-hook's
    * `time_processed` — models/bronze/customers_bronze.sql:13). */
  def instant: java.time.Instant
}

object Clock {
  /** Production clock — Spark's own query-constant now/today. */
  object System extends Clock {
    def now: Column = current_timestamp()
    def today: Column = current_date()
    def instant: java.time.Instant = java.time.Instant.now()
  }

  /** Deterministic clock for tests and reproducible runs. */
  final case class Fixed(ts: java.time.Instant) extends Clock {
    def now: Column = lit(java.sql.Timestamp.from(ts))
    def today: Column =
      lit(java.sql.Date.valueOf(ts.atZone(java.time.ZoneOffset.UTC).toLocalDate))
    def instant: java.time.Instant = ts
  }
}

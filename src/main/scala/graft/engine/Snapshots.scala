package graft.engine

import graft.ops.{QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** dbt-style change-tracking materializations the reference's users rely
  * on beyond full-refresh `table`s: SCD2 snapshots (dbt `snapshot` /
  * `timestamp` strategy) and incremental merge (dbt `incremental` with
  * `unique_key`).
  *
  * Scale design: both are one shuffle on the business key. The SCD2
  * window needs only (ts, tie) per key partition — no full-history
  * buffering beyond the partition Spark already sorts; incremental merge
  * is latest-wins dedup over existing ∪ batch, which AQE plans as a
  * shuffled window (and at lake scale would be scoped to the partitions
  * the batch touches).
  */
object Snapshots extends QueryModule {

  /** SCD2 validity intervals over a version log: each (key, version-ts)
    * row becomes [valid_from = ts, valid_to = next version's ts), open
    * (null valid_to, is_current = 1) for the latest version. `tie` makes
    * same-timestamp versions deterministic — pass a unique id.
    */
  def scd2(versions: DataFrame, key: String, ts: String, tie: Column)
      : DataFrame = {
    val w = Window.partitionBy(col(key)).orderBy(col(ts).asc, tie.asc)
    versions
      .withColumn("valid_from", col(ts))
      .withColumn("valid_to", lead(col(ts), 1).over(w))
      .withColumn("is_current",
        when(lead(col(ts), 1).over(w).isNull, 1).otherwise(0))
  }

  /** dbt incremental with unique_key semantics: rows of `batch` replace
    * same-key rows of `existing` when strictly newer by `version`;
    * brand-new keys append. Latest-wins with a deterministic tie-break
    * on `tie` (existing row wins ties, matching dbt's "do not touch
    * unchanged rows").
    */
  def incrementalMerge(existing: DataFrame, batch: DataFrame, key: String,
      version: String, tie: Column): DataFrame =
    Silver.latestByKey(
      existing.withColumn("__is_batch", lit(0))
        .unionByName(batch.withColumn("__is_batch", lit(1))),
      key,
      Seq(col(version).desc, col("__is_batch").asc, tie.desc))
      .drop("__is_batch")

  // ============================================================ SCD2 gate
  // the events stream as a user-state version log: every event is a
  // version of the user's state, SCD2 gives each one its validity window
  register("q70_scd2_snapshot",
    """SELECT user_id, event_id, event_type, value,
      |  ts AS valid_from,
      |  LEAD(ts) OVER w AS valid_to,
      |  CAST(CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END AS INTEGER)
      |    AS is_current
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""".stripMargin) {
    (s, d) =>
      scd2(Tables.events(s, d)
          .select("user_id", "event_id", "event_type", "value", "ts"),
        "user_id", "ts", col("event_id"))
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("value"), col("valid_from"), col("valid_to"),
          col("is_current").cast("int").as("is_current"))
  }

  // ============================================================ incremental
  // incremental-merge gate: "existing" = even event ids, "batch" = odd ids
  // plus REVISED versions of every 10th even id (newer ts, value+1000);
  // the merged state must show exactly the revised rows winning
  register("q71_incremental_merge",
    """WITH existing AS (
      |  SELECT event_id, user_id, event_type, value, ts
      |  FROM events WHERE event_id % 2 = 0),
      |batch AS (
      |  SELECT event_id, user_id, event_type, value, ts
      |  FROM events WHERE event_id % 2 = 1
      |  UNION ALL
      |  SELECT event_id, user_id, event_type, value + 1000 AS value,
      |    ts + INTERVAL 1 DAY AS ts
      |  FROM events WHERE event_id % 20 = 0),
      |unioned AS (
      |  SELECT *, 0 AS is_batch FROM existing
      |  UNION ALL SELECT *, 1 AS is_batch FROM batch),
      |merged AS (
      |  SELECT event_id, user_id, event_type, value, ts
      |  FROM unioned
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_id
      |    ORDER BY ts DESC, is_batch ASC, user_id DESC) = 1)
      |SELECT event_id, user_id, event_type, value, ts FROM merged""".stripMargin) {
    (s, d) =>
      val ev = Tables.events(s, d)
        .select("event_id", "user_id", "event_type", "value", "ts")
      val existing = ev.filter(col("event_id") % 2 === 0)
      val revised = ev.filter(col("event_id") % 20 === 0)
        .withColumn("value", col("value") + 1000)
        .withColumn("ts", col("ts") + expr("INTERVAL 1 DAY"))
      val batch = ev.filter(col("event_id") % 2 === 1).unionByName(revised)
      incrementalMerge(existing, batch, "event_id", "ts", col("user_id"))
        .select("event_id", "user_id", "event_type", "value", "ts")
  }
}

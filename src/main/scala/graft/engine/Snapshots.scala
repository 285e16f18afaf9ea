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

  // ============================================================ table diff
  // Snapshot reconciliation — the "what changed between yesterday's and
  // today's build" operator a pipeline runs after every rebuild: full
  // outer join on the primary key, rows classified added / removed /
  // changed / unchanged by comparing an md5 row fingerprint (so wide
  // rows compare as one fixed-width value, never column-by-column
  // through the shuffle). Both snapshots are derived deterministically
  // from orders: the "new" build drops keys ≡ 3 (mod 101), reprices
  // keys ≡ 0 (mod 7), and appends beyond-max keys ≡ 1 (mod 97).
  // One shuffle per side into the join; the census is a tiny rollup.
  register("q115_table_diff", {
    val fp = "md5(concat_ws('|', CAST(o_orderkey AS VARCHAR), " +
      "CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), " +
      "o_orderpriority))"
    s"""WITH old AS (
       |  SELECT o_orderkey, $fp AS fp FROM orders),
       |new_base AS (
       |  SELECT o_orderkey,
       |    CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10 ELSE o_totalprice END
       |      AS o_totalprice,
       |    o_orderpriority
       |  FROM orders WHERE o_orderkey % 101 <> 3),
       |new_added AS (
       |  SELECT o_orderkey + (SELECT MAX(o_orderkey) + 1 FROM orders) AS o_orderkey,
       |    o_totalprice, o_orderpriority
       |  FROM orders WHERE o_orderkey % 97 = 1),
       |new AS (
       |  SELECT o_orderkey, $fp AS fp
       |  FROM (SELECT * FROM new_base UNION ALL SELECT * FROM new_added)),
       |classified AS (
       |  SELECT CASE
       |    WHEN o.o_orderkey IS NULL THEN 'added'
       |    WHEN n.o_orderkey IS NULL THEN 'removed'
       |    WHEN o.fp <> n.fp THEN 'changed'
       |    ELSE 'unchanged' END AS status
       |  FROM old o FULL OUTER JOIN new n ON o.o_orderkey = n.o_orderkey)
       |SELECT status, COUNT(*) AS n FROM classified GROUP BY status""".stripMargin
  }) { (s, d) =>
    def fingerprint(df: DataFrame): DataFrame =
      df.select(col("o_orderkey"),
        md5(concat_ws("|", col("o_orderkey").cast("string"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").cast("string"),
          col("o_orderpriority"))).as("fp"))
    val orders = Tables.orders(s, d)
      .select("o_orderkey", "o_totalprice", "o_orderpriority")
    // scalar driver sync (one long) — the added-keys offset
    val maxKey = orders.agg(max(col("o_orderkey"))).head().getLong(0) + 1
    val newBase = orders.filter(col("o_orderkey") % 101 =!= 3)
      .withColumn("o_totalprice",
        when(col("o_orderkey") % 7 === 0, col("o_totalprice") + 10)
          .otherwise(col("o_totalprice")))
    val newAdded = orders.filter(col("o_orderkey") % 97 === 1)
      .withColumn("o_orderkey", col("o_orderkey") + maxKey)
    val oldFp = fingerprint(orders)
      .select(col("o_orderkey").as("k_old"), col("fp").as("fp_old"))
    val newFp = fingerprint(newBase.unionByName(newAdded))
      .select(col("o_orderkey").as("k_new"), col("fp").as("fp_new"))
    oldFp.join(newFp, col("k_old") === col("k_new"), "full_outer")
      .select(when(col("k_old").isNull, "added")
        .when(col("k_new").isNull, "removed")
        .when(col("fp_old") =!= col("fp_new"), "changed")
        .otherwise("unchanged").as("status"))
      .groupBy("status").agg(count(lit(1)).as("n"))
  }

  // ====================================================== point-in-time
  // Point-in-time (a.k.a. "as-was") lookup against an SCD2 dimension —
  // the temporal-family capstone composing [[scd2]] with an as-of
  // probe: for each (user, probe day) the join returns the state
  // version whose validity interval covers the probe instant, i.e. the
  // answer to "what was this user's state when the fact happened". The
  // probe is the LAST version with valid_from ≤ t (one window over
  // user_id, the q58 as-of shape — never an interval nested loop), so
  // the plan is two narrow scans + one shuffle per side on the key.
  register("q120_point_in_time",
    """WITH dim AS (
      |  SELECT user_id, event_id, event_type, ts AS valid_from,
      |    LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS valid_to
      |  FROM events),
      |probes AS (
      |  SELECT user_id,
      |    CAST(CAST(MIN(ts) AS DATE) + INTERVAL 7 DAY AS TIMESTAMP) AS probe_ts
      |  FROM events GROUP BY user_id),
      |matched AS (
      |  SELECT p.user_id, p.probe_ts, d.event_id, d.event_type,
      |    d.valid_from, d.valid_to,
      |    ROW_NUMBER() OVER (PARTITION BY p.user_id
      |      ORDER BY d.valid_from DESC, d.event_id DESC) AS rn
      |  FROM probes p JOIN dim d
      |    ON p.user_id = d.user_id AND d.valid_from <= p.probe_ts)
      |SELECT user_id, probe_ts, event_id AS state_event_id,
      |  event_type AS state_at_probe,
      |  CAST(valid_to IS NULL OR valid_to > probe_ts AS INTEGER) AS interval_covers
      |FROM matched WHERE rn = 1""".stripMargin) { (s, d) =>
    val dim = scd2(
      Tables.events(s, d).select("user_id", "event_id", "event_type", "ts"),
      "user_id", "ts", col("event_id"))
    val probes = Tables.events(s, d).groupBy("user_id")
      .agg((min(to_date(col("ts"))) + expr("INTERVAL 7 DAY"))
        .cast("timestamp").as("probe_ts"))
    val w = Window.partitionBy(col("p_user"))
      .orderBy(col("valid_from").desc, col("event_id").desc)
    probes.select(col("user_id").as("p_user"), col("probe_ts"))
      .join(dim, col("p_user") === col("user_id") &&
        col("valid_from") <= col("probe_ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_user").as("user_id"), col("probe_ts"),
        col("event_id").as("state_event_id"),
        col("event_type").as("state_at_probe"),
        (col("valid_to").isNull || col("valid_to") > col("probe_ts"))
          .cast("integer").as("interval_covers"))
  }

  // ========================== incremental aggregate-state maintenance
  // The aggregate sibling of q71's row-level incremental merge: a
  // periodic pipeline keeps per-key PARTIAL aggregate state (count, sum,
  // min, max — all mergeable) and folds each new batch in with a keyed
  // full-outer merge, never reprocessing history. At 100 TB this is the
  // difference between scanning the full fact table per run and scanning
  // one day's partition: state size is |keys|, merge cost is
  // |keys| + |batch|. Non-mergeable forms (exact median, distinct) need
  // sketch state instead — see q146's HLL union for that contract.
  //
  // The gate splits orders at a date cutoff, builds state from the old
  // half, merges the new half's partials, and the ORACLE aggregates the
  // whole table directly — merged state must equal the full recompute,
  // which is exactly the invariant an incremental materialization owes
  // its consumers.
  register("q168_incremental_state",
    """SELECT o_custkey,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS sum_cents,
      |  MIN(CAST(o_orderdate AS DATE)) AS first_date,
      |  MAX(CAST(o_orderdate AS DATE)) AS last_date
      |FROM orders GROUP BY 1""".stripMargin) { (s, d) =>
    val base = Tables.orders(s, d)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
        col("o_orderdate").cast("date").as("odate"))
    def partials(df: DataFrame, sfx: String): DataFrame = df
      .groupBy("o_custkey")
      .agg(count(lit(1)).as(s"n$sfx"), sum(col("cents")).as(s"s$sfx"),
        min(col("odate")).as(s"lo$sfx"), max(col("odate")).as(s"hi$sfx"))
    val state = partials(base.filter(col("odate") < lit("1997-01-01")), "0")
    val delta = partials(base.filter(col("odate") >= lit("1997-01-01")), "1")
    // keyed full-outer merge; Spark's least/greatest skip nulls, so keys
    // present on only one side keep that side's bounds
    state.join(delta, Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("n1"), lit(0L)))
          .as("n_orders"),
        (coalesce(col("s0"), lit(0L)) + coalesce(col("s1"), lit(0L)))
          .as("sum_cents"),
        least(col("lo0"), col("lo1")).as("first_date"),
        greatest(col("hi0"), col("hi1")).as("last_date"))
  }

  // ============================================================ CDC apply
  // Change-data-capture apply — the lakehouse MERGE contract q71's
  // upsert cannot express: an op-coded change log (I/U/D) with a
  // per-key sequence number, applied last-writer-wins with DELETE
  // tombstones, including the delete-then-resurrect ordering (a 'U'
  // with a later sequence than a 'D' re-creates the row). The log here
  // is synthesized from orders in four deterministic batches (insert
  // the missing third, reprice every 5th key, delete every 7th,
  // resurrect every 14th at a fixed price), so the oracle mirrors it
  // as UNION ALL branches.
  //
  // Scale: the apply is ONE shuffle — groupBy(key) with max-of-struct
  // (seq-first ordering), map-side partials combining per-key versions
  // before the exchange — never a window sort over the log (the q197
  // argmax pattern). A real deployment reads the log from a CDC
  // source; the per-key winner logic is exactly this aggregate.
  register("q200_cdc_apply",
    """WITH o AS (SELECT o_orderkey AS k, o_totalprice AS p FROM orders),
      |log AS (
      |  SELECT k, 'I' AS op, 0 AS seq, p AS val FROM o WHERE k % 3 <> 2
      |  UNION ALL
      |  SELECT k, 'I', 1, p FROM o WHERE k % 3 = 2
      |  UNION ALL
      |  SELECT k, 'U', 2, p + 100 FROM o WHERE k % 5 = 0
      |  UNION ALL
      |  SELECT k, 'D', 3, CAST(NULL AS DOUBLE) FROM o WHERE k % 7 = 0
      |  UNION ALL
      |  SELECT k, 'U', 4, 555.0 FROM o WHERE k % 14 = 0),
      |w AS (
      |  SELECT k, op, seq, val, ROW_NUMBER() OVER (
      |    PARTITION BY k ORDER BY seq DESC) AS rn
      |  FROM log)
      |SELECT k AS o_orderkey, val AS final_value,
      |  CAST(seq AS INTEGER) AS last_seq, op AS last_op
      |FROM w WHERE rn = 1 AND op <> 'D'""".stripMargin) { (s, d) =>
    val o = Tables.orders(s, d)
      .select(col("o_orderkey").as("k"), col("o_totalprice").as("p"))
    def batch(pred: Column, op: String, seq: Int, value: Column) =
      o.filter(pred).select(col("k"), lit(op).as("op"),
        lit(seq).as("seq"), value.as("val"))
    val log = batch(col("k") % 3 =!= 2, "I", 0, col("p"))
      .unionByName(batch(col("k") % 3 === 2, "I", 1, col("p")))
      .unionByName(batch(col("k") % 5 === 0, "U", 2, col("p") + 100))
      .unionByName(batch(col("k") % 7 === 0, "D", 3,
        lit(null).cast(org.apache.spark.sql.types.DoubleType)))
      .unionByName(batch(col("k") % 14 === 0, "U", 4, lit(555.0)))
    log.groupBy("k")
      .agg(max(struct(col("seq"), col("op"), col("val"))).as("w"))
      .filter(col("w.op") =!= "D")
      .select(col("k").as("o_orderkey"), col("w.val").as("final_value"),
        col("w.seq").as("last_seq"), col("w.op").as("last_op"))
  }
}

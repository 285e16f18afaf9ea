package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins: salt the hot side so a single hot key
  * spreads over `factor` reducers, replicating the other side per salt.
  *
  * AQE's skew-join splitting (on by default) handles most runtime skew;
  * explicit salting is for the cases AQE can't fix — aggregation-input
  * skew feeding a join, or a build side too big to broadcast but with a
  * known handful of hot keys. The result is row-identical to the plain
  * join.
  */
object Salting {
  /** Join types for which replicating `other` keeps the result
    * row-identical to the plain join: every `other` row that reaches the
    * output must have matched a (uniquely-salted) `skewed` row. Outer
    * variants that preserve unmatched `other` rows would emit them once
    * per salt — `factor`× duplicated — so they are rejected.
    */
  private val ReplicationSafeJoinTypes: Set[String] =
    Set("inner", "left", "leftouter", "cross", "leftsemi", "semi",
      "leftanti", "anti")

  /** Equi-join `skewed ⋈ other` on `key`, spreading each key of the
    * skewed side across `factor` salted partitions. `other` is
    * replicated `factor`× — keep it the smaller input.
    *
    * `joinType` must preserve no unmatched `other` rows (see
    * [[ReplicationSafeJoinTypes]]); right/full outer joins would emit
    * each unmatched `other` row `factor` times.
    */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
      factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0)
    require(ReplicationSafeJoinTypes.contains(joinType.toLowerCase.replace("_", "")),
      s"saltedJoin does not support joinType=$joinType: replicating the " +
        "non-salted side would duplicate its unmatched rows; use the plain " +
        "join (AQE skew handling) for right/full outer joins")
    // deterministic scatter: hash the full row, not rand() — keeps the
    // join re-executable (retried tasks must land rows identically)
    val salted = skewed.withColumn("__salt",
      pmod(hash(struct(skewed.columns.map(col).toSeq: _*)), lit(factor)))
    val replicated = other.withColumn("__salt",
      explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: partial-aggregate on
    * (key, salt), then final-aggregate on key. For algebraic aggregates
    * Spark's own partial aggregation already does this; use it when the
    * partial step is a custom/expensive reduction.
    */
  def saltedCount(df: DataFrame, key: String, factor: Int): DataFrame =
    df.withColumn("__salt",
        pmod(hash(struct(df.columns.map(col).toSeq: _*)), lit(factor)))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("cnt"))
}

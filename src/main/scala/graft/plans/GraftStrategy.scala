package graft.plans

import org.apache.spark.sql.{DataFrame, GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** Planner strategy mapping graft's custom logical nodes to their
  * physical operators (injected via
  * [[graft.catalyst.GraftExtensions]] or [[GraftPlans.install]]).
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, ties) =>
      AsOfJoinExec(lk, rk, lt, rt, ties, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Public DataFrame API over the custom plan nodes. */
object GraftPlans {
  /** Idempotently install [[GraftStrategy]] on a live session (sessions
    * built with the `spark.sql.extensions` config don't need this). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GraftStrategy)) {
      spark.experimental.extraStrategies =
        GraftStrategy +: spark.experimental.extraStrategies
    }

  /** Native as-of left join: for each `left` row, the latest `right` row
    * with `right(time) <= left(time)` in the same `key` group; same-time
    * ties resolve to the greatest `ties` tuple (pass a unique right id
    * for determinism). Right columns of unmatched rows are null.
    *
    * Column names must be disjoint between the two frames (rename before
    * joining) — the node outputs both sides verbatim.
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
      rightKey: String, rightTime: String, ties: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val dup = left.columns.toSet.intersect(right.columns.toSet)
    require(dup.isEmpty, s"rename overlapping columns before asofJoin: $dup")
    // NOTE: plan-node expressions must be RESOLVED attributes of the
    // analyzed children — a computed Column injected here would carry an
    // unresolved ColumnNode the analyzer never visits inside a custom
    // node. Callers needing computed time axes pre-project them (see
    // asofJoinForward).
    val plan = AsOfJoinPlan(
      GraftColumnBridge.logicalPlan(left),
      GraftColumnBridge.logicalPlan(right),
      Seq(GraftColumnBridge.expression(left(key))),
      Seq(GraftColumnBridge.expression(right(rightKey))),
      GraftColumnBridge.expression(left(time)),
      GraftColumnBridge.expression(right(rightTime)),
      ties.map(c => GraftColumnBridge.expression(right(c))))
    GraftColumnBridge.ofRows(spark, plan)
  }

  /** Forward as-of left join: the EARLIEST right row with
    * `right(time) >= left(time)` per key (the "next event at or after"
    * lookup — e.g. first fill after an order). Same operator, time axis
    * negated via pre-projected helper columns: backward-latest over (-t)
    * IS forward-earliest over t. Ties at the same timestamp resolve to
    * the greatest `ties` tuple.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
      time: String, rightKey: String, rightTime: String, ties: Seq[String])
      : DataFrame = {
    import org.apache.spark.sql.functions.unix_micros
    val l2 = left.withColumn("__asof_lt", -unix_micros(left(time)))
    val r2 = right.withColumn("__asof_rt", -unix_micros(right(rightTime)))
    asofJoin(l2, r2, key, "__asof_lt", rightKey, "__asof_rt", ties)
      .drop("__asof_lt", "__asof_rt")
  }
}

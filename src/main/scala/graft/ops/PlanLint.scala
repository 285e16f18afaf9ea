package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution._
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Physical-plan linter: the scale smells this repo audits by hand in
  * PLANS.md, mechanized. A 100 TB deployment runs this against every
  * production query the way `graft.engine.Checks` runs dbt-style data
  * tests — plans that silently regress into a cartesian product, a
  * data-sized global window, or an unpushed scan filter fail fast at
  * review time instead of at cluster time.
  *
  * Rules (each yields a [[PlanLint.Finding]]):
  *   - `cross-join`    — CartesianProduct / BroadcastNestedLoopJoin
  *     anywhere in the plan. Bounded 1-row scalar frames are legitimate
  *     (see PlanShapeSpec's allowlist) — the lint surfaces them; the
  *     caller decides.
  *   - `global-window` — a Window operator with an empty PARTITION BY:
  *     every row moves through one partition (q45/W3 is fine because it
  *     runs post-aggregation on a mart-sized frame; the lint can't know
  *     cardinality, so it reports and the caller judges).
  *   - `unpushed-scan` — a parquet scan with no pushed-down filters
  *     feeding a Filter: the predicate may be push-eligible (or may be
  *     on a computed column — again, surfaced for judgment).
  *   - `shuffle-count` — one informational finding with the number of
  *     shuffle exchanges in the plan.
  */
object PlanLint {

  final case class Finding(rule: String, node: String, detail: String)

  /** Walk the physical plan, descending through AQE wrappers, query
    * stages, codegen boundaries, and exchange reuse. */
  private def expand(p: SparkPlan): Seq[SparkPlan] = {
    val inner: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case other                    => other.children
    }
    p +: inner.flatMap(expand)
  }

  def lint(df: DataFrame): Seq[Finding] = {
    val nodes = expand(df.queryExecution.executedPlan)

    val crosses = nodes.collect {
      case c: CartesianProductExec =>
        Finding("cross-join", "CartesianProduct", c.simpleStringWithNodeId())
      case b: BroadcastNestedLoopJoinExec =>
        Finding("cross-join", "BroadcastNestedLoopJoin", s"${b.joinType} join with non-equi or empty condition")
    }

    val globalWindows = nodes.collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Finding("global-window", "Window",
          s"empty PARTITION BY over ${w.orderSpec.map(_.sql).mkString(", ")}")
    }

    // a pushed-filter list carrying only inferred IsNotNull guards has
    // pushed no actual predicate — the scan still reads every row group
    def effectivelyUnpushed(pushed: String): Boolean =
      pushed.stripPrefix("[").stripSuffix("]")
        .replaceAll("IsNotNull\\([^)]*\\)", "")
        .replaceAll("[,\\s]", "").isEmpty

    // Descend only through the Filter's own unary chain (projections,
    // codegen wrappers, AQE stages): crossing a join would blame scans on
    // the other side whose columns the predicate never references, and
    // crossing another FilterExec would report one scan once per stacked
    // Filter — both false-positive noise in a gating tool.
    def scanBelow(p: SparkPlan): Option[FileSourceScanExec] = p match {
      case s: FileSourceScanExec    => Some(s)
      case a: AdaptiveSparkPlanExec => scanBelow(a.executedPlan)
      case q: QueryStageExec        => scanBelow(q.plan)
      case _: FilterExec            => None // the inner Filter owns this scan
      case u if u.children.size == 1 => scanBelow(u.children.head)
      case _                         => None
    }

    val unpushedScans = nodes.collect {
      case f: FilterExec =>
        scanBelow(f.child).collect {
          case s if s.metadata.get("PushedFilters").exists(effectivelyUnpushed) =>
            Finding("unpushed-scan", "FileSourceScan",
              s"Filter(${f.condition.sql.take(80)}) above a scan with no pushed predicate")
        }
    }.flatten

    val shuffles = nodes.count {
      case _: ShuffleExchangeExec => true
      case _                      => false
    }

    crosses ++ globalWindows ++ unpushedScans :+
      Finding("shuffle-count", "Exchange", shuffles.toString)
  }

  /** The findings as a DataFrame — joinable with an allowlist table the
    * way PlanShapeSpec encodes its bounded-frame exemptions. */
  def report(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    lint(df).toDF("rule", "node", "detail")
  }
}

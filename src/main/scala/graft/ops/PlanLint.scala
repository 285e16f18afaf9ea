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
  *   - `unpushed-scan` — a Filter whose condition contains a PUSH-
  *     ELIGIBLE conjunct (a plain scan column compared to a literal)
  *     sitting above a parquet scan that pushed no real predicate.
  *     Conditions made only of null guards or computed expressions
  *     (modulo, size(...), UDF outputs) are not findings — parquet
  *     cannot evaluate them, so nothing was lost.
  *   - `window-collect` — a `collect_set`/`collect_list` aggregate
  *     evaluated over a Window frame. WindowExec buffers the frame per
  *     row and the collect buffer is unbounded in the domain of the
  *     collected column, so an innocuous-looking rolling-distinct
  *     explodes on a hot key at scale. Bounded-domain uses (q166's
  *     ≤ |parts-per-supplier-quarter| frame) are allowlisted by the
  *     caller with a cardinality rationale — the lint reports all of
  *     them.
  *   - `shuffle-count` — one informational finding with the number of
  *     shuffle exchanges in the plan.
  */
object PlanLint {

  final case class Finding(rule: String, node: String, detail: String)

  /** Walk the physical plan, descending through AQE wrappers, query
    * stages, codegen boundaries, and exchange reuse. Public because a
    * raw `plan.collect` is VACUOUS on adaptive plans (TreeNode.collect
    * does not enter AdaptiveSparkPlanExec) — every plan-shape assertion
    * in the repo must walk through here. */
  def expand(p: SparkPlan): Seq[SparkPlan] = {
    val inner: Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec        => Seq(q.plan)
      case r: ReusedExchangeExec    => Seq(r.child)
      case other                    => other.children
    }
    p +: inner.flatMap(expand)
  }

  /** Every shuffle exchange in the (possibly adaptive) plan. */
  def shuffleExchanges(df: DataFrame): Seq[ShuffleExchangeExec] =
    expand(df.queryExecution.executedPlan).collect {
      case e: ShuffleExchangeExec => e
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

    // Descend only through the Filter's own projection/plumbing chain:
    // crossing a join would blame scans on the other side whose columns
    // the predicate never references; crossing another FilterExec would
    // report one scan once per stacked Filter; and crossing a Window /
    // Aggregate / Generate would blame the scan for predicates on columns
    // that only exist ABOVE the scan — all false-positive noise in a
    // gating tool.
    def scanBelow(p: SparkPlan): Option[FileSourceScanExec] = p match {
      case s: FileSourceScanExec    => Some(s)
      case a: AdaptiveSparkPlanExec => scanBelow(a.executedPlan)
      case q: QueryStageExec        => scanBelow(q.plan)
      case u @ (_: ProjectExec | _: WholeStageCodegenExec | _: InputAdapter |
                _: ColumnarToRowExec) => scanBelow(u.children.head)
      case r: ReusedExchangeExec    => scanBelow(r.child)
      case _                        => None
    }

    // A conjunct parquet COULD have pushed: a plain scan column compared
    // to a literal (the DataSourceStrategy-translatable shapes). Null
    // guards and computed expressions are not losses — they can't push.
    import org.apache.spark.sql.catalyst.expressions.{
      And, AttributeReference, BinaryComparison, Expression, In, InSet,
      Literal, StartsWith}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    def plainAttr(e: Expression, cols: Set[String]): Boolean = e match {
      case a: AttributeReference => cols.contains(a.name)
      case _                     => false
    }
    def pushEligible(e: Expression, cols: Set[String]): Boolean = e match {
      case b: BinaryComparison =>
        (plainAttr(b.left, cols) && b.right.isInstanceOf[Literal]) ||
          (plainAttr(b.right, cols) && b.left.isInstanceOf[Literal])
      case In(a, vs)          => plainAttr(a, cols) && vs.forall(_.isInstanceOf[Literal])
      case InSet(a, _)        => plainAttr(a, cols)
      case StartsWith(a, _: Literal) => plainAttr(a, cols)
      case _                  => false
    }

    val unpushedScans = nodes.collect {
      case f: FilterExec =>
        scanBelow(f.child).collect {
          case s if s.metadata.get("PushedFilters").exists(effectivelyUnpushed) &&
              conjuncts(f.condition)
                .exists(pushEligible(_, s.output.map(_.name).toSet)) =>
            Finding("unpushed-scan", "FileSourceScan",
              s"Filter(${f.condition.sql.take(80)}) above a scan with no pushed predicate")
        }
    }.flatten

    // collect_set/collect_list inside a window frame: per-row unbounded
    // buffers — a hot key turns a rolling-distinct into an OOM at scale
    import org.apache.spark.sql.catalyst.expressions.aggregate.{CollectList, CollectSet}
    val windowCollects = nodes.collect {
      case w: WindowExec =>
        w.windowExpression.flatMap(_.collect {
          case c: CollectSet =>
            Finding("window-collect", "Window",
              s"collect_set(${c.child.sql.take(60)}) over a window frame")
          case c: CollectList =>
            Finding("window-collect", "Window",
              s"collect_list(${c.child.sql.take(60)}) over a window frame")
        })
    }.flatten

    // Scala UDFs anywhere in the plan: a UDF is an encoder round-trip
    // per row and an opaque wall to codegen/pushdown — the repo's rule
    // is native Expression kernels in operator paths (ShingleHash,
    // CosineSimilarity, CmsEstimate), so any ScalaUDF is either fixture
    // plumbing (allowlisted with a rationale) or a regression.
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val udfs = nodes.flatMap { n =>
      n.expressions.flatMap(_.collect {
        case u: ScalaUDF =>
          Finding("scala-udf", n.nodeName,
            s"ScalaUDF ${u.udfName.getOrElse("<anon>")}(${u.children.map(_.sql).mkString(",").take(60)})")
      })
    }

    val shuffles = nodes.count {
      case _: ShuffleExchangeExec => true
      case _                      => false
    }

    crosses ++ globalWindows ++ unpushedScans ++ windowCollects ++ udfs :+
      Finding("shuffle-count", "Exchange", shuffles.toString)
  }

  /** The findings as a DataFrame — joinable with an allowlist table the
    * way PlanShapeSpec encodes its bounded-frame exemptions. */
  def report(spark: SparkSession, df: DataFrame): DataFrame = {
    import spark.implicits._
    lint(df).toDF("rule", "node", "detail")
  }
}

package graft.catalyst

import org.apache.spark.sql.{GraftColumnBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.Average
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Optimizer rule: rewrite a pure band join — an inner join whose only
  * usable predicate is `x >= lo AND x < hi` — into the binned equi-join
  * shape (`graft.ops.TemporalJoins.binnedRangeJoin` as a REWRITE instead
  * of an API the caller must know about). Without it Spark plans a
  * broadcast-nested-loop (or cartesian) join: every fact row tests every
  * interval. With it, both sides gain a bin key (`floor(value/width)`;
  * intervals explode to the bins they cover) and the join becomes a
  * plain shuffled/broadcast HASH join on the bin, with the original
  * band predicate re-applied as a post-filter.
  *
  * Bin width via `spark.graft.rangeJoin.binWidth`:
  *   - unset or `auto` — derived from interval-span statistics: one
  *     scalar `avg(hi - lo)` aggregate over the interval side executed
  *     at optimization time, rounded up. Width ≈ the mean span makes
  *     each interval explode to ~2 bins while a bin pairs with few
  *     intervals — the standard operating point for binned interval
  *     joins. Cost: one tiny Spark job per band-join optimization,
  *     only on plans the rule would rewrite anyway. If the interval
  *     side is empty (or the probe fails) the rule backs off.
  *   - a positive integer — explicit width override (workload knowledge
  *     beats the heuristic when spans are heavy-tailed).
  *   - `off` / `0` — rule disabled.
  *
  * Coverage note: intervals explode to `floor(lo/w) .. floor(hi/w)`
  * (inclusive). The upper bin over-covers by at most one bin when `hi`
  * is not on the bin grid; the re-applied band predicate removes the
  * overshoot. This differs from the manual operator's `(hi-1)` bound,
  * which assumes integral bounds — the rule must stay correct for ANY
  * numeric bounds.
  *
  * Safety: only fires when the join has NO equi-conjunct (if one
  * exists, Spark already hash-joins on it and the bin adds nothing);
  * after the rewrite the join HAS an equi-conjunct, which also makes
  * the rule idempotent under transformUp. The auto probe is reentrancy-
  * guarded: a band join nested inside the stats aggregate's own plan is
  * left alone rather than recursing.
  */
object RangeJoinBinningRule extends Rule[LogicalPlan] with PredicateHelper {
  val ConfKey = "spark.graft.rangeJoin.binWidth"

  private sealed trait Mode
  private case object Off extends Mode
  private case object Auto extends Mode
  private final case class Fixed(w: Long) extends Mode

  private def mode: Mode =
    SQLConf.get.getConfString(ConfKey, "auto").trim.toLowerCase match {
      case "" | "auto" => Auto
      case "off" | "0" => Off
      case v => v.toLongOption.filter(_ > 0).map(Fixed.apply).getOrElse(Off)
    }

  private val deriving = new ThreadLocal[java.lang.Boolean] {
    override def initialValue(): java.lang.Boolean = java.lang.Boolean.FALSE
  }

  /** Interval-span statistic → bin width: `max(1, ceil(avg(hi - lo)))`
    * over the interval side, executed as a one-row aggregate. */
  private def derivedWidth(right: LogicalPlan, lo: Expression,
      hi: Expression): Option[Long] = {
    if (deriving.get) return None
    deriving.set(true)
    try {
      val span = Subtract(Cast(hi, DoubleType), Cast(lo, DoubleType))
      val agg = Aggregate(Nil,
        Seq(Alias(new Average(span).toAggregateExpression(), "__graft_avg_span")()),
        right)
      val row = GraftColumnBridge.ofRows(SparkSession.active, agg).head()
      if (row.isNullAt(0)) None
      else Some(row.getDouble(0)).filter(s => !s.isNaN && s > 0)
        .map(s => math.max(1L, math.ceil(s).toLong))
    } catch { case scala.util.control.NonFatal(_) => None }
    finally deriving.set(false)
  }

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def bin(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = mode match {
    case Off => plan
    case m => plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        val conjuncts = splitConjunctivePredicates(cond)
        val hasEqui = conjuncts.exists {
          case EqualTo(a, b) =>
            (refsOnly(a, left) && refsOnly(b, right)) ||
              (refsOnly(a, right) && refsOnly(b, left))
          case EqualNullSafe(a, b) =>
            (refsOnly(a, left) && refsOnly(b, right)) ||
              (refsOnly(a, right) && refsOnly(b, left))
          case _ => false
        }
        val band = conjuncts.collectFirst {
          // x >= lo AND x < hi, x from one side, bounds from the other
          case GreaterThanOrEqual(x, lo)
              if refsOnly(x, left) && refsOnly(lo, right) &&
                conjuncts.exists {
                  case LessThan(x2, hi) =>
                    x2.semanticEquals(x) && refsOnly(hi, right)
                  case _ => false
                } =>
            val hi = conjuncts.collectFirst {
              case LessThan(x2, h) if x2.semanticEquals(x) &&
                refsOnly(h, right) => h
            }.get
            (x, lo, hi)
        }
        if (hasEqui || band.isEmpty ||
            !band.get._1.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]) {
          j
        } else {
          val (x, lo, hi) = band.get
          val width = m match {
            case Fixed(w) => Some(w)
            case Auto => derivedWidth(right, lo, hi)
            case Off => None
          }
          width match {
            case None => j
            case Some(w) =>
              val lBin = Alias(bin(x, w), "__graft_bin_l")()
              val newLeft = Project(left.output :+ lBin, left)
              val rBinAttr = AttributeReference("__graft_bin_r", LongType)()
              // Sequence is TimeZoneAware: it stays unresolved (and fails
              // post-optimizer plan validation) until the zone is pinned
              val gen = Explode(Sequence(bin(lo, w), bin(hi, w), None,
                Some(SQLConf.get.sessionLocalTimeZone)))
              val newRight = Generate(gen, unrequiredChildIndex = Nil,
                outer = false, qualifier = None,
                generatorOutput = Seq(rBinAttr), child = right)
              val newCond = And(EqualTo(lBin.toAttribute, rBinAttr), cond)
              // restore the original output (the bin columns are internal)
              Project(j.output,
                Join(newLeft, newRight, Inner, Some(newCond), hint))
          }
        }
    }
  }
}

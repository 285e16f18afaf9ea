package graft.catalyst

import org.apache.spark.sql.catalyst.expressions._
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
  * Opt-in via `spark.graft.rangeJoin.binWidth` (unset → rule inactive):
  * bin width is workload knowledge — comparable to the interval span —
  * that the optimizer cannot infer from statistics it doesn't have.
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
  * the rule idempotent under transformUp.
  */
object RangeJoinBinningRule extends Rule[LogicalPlan] with PredicateHelper {
  val ConfKey = "spark.graft.rangeJoin.binWidth"

  private def binWidth: Option[Long] = {
    val v = SQLConf.get.getConfString(ConfKey, "")
    if (v.isEmpty) None else v.toLongOption.filter(_ > 0)
  }

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  private def bin(e: Expression, w: Long): Expression =
    Cast(Floor(Divide(Cast(e, DoubleType), Literal(w.toDouble))), LongType)

  override def apply(plan: LogicalPlan): LogicalPlan = binWidth match {
    case None => plan
    case Some(w) => plan.transformUp {
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

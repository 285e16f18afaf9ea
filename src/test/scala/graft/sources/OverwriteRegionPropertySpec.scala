package graft.sources

import org.apache.spark.sql.sources._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.v2.ClusteredSinkOverwrite

/** Property gate for [[ClusteredSinkOverwrite.compile]] — the region
  * algebra decides which committed files an overwrite may SKIP, so a
  * wrong envelope silently resurrects replaced rows (file kept that
  * should have been rewritten) and a wrong predicate drops survivors.
  *
  * Properties, over random filter trees (depth ≤ 3) and keys in a small
  * domain (so And/Or/Not interactions are exhaustively hit):
  *  1. `matches(k)` equals a direct three-valued-logic interpreter for
  *     every non-null key;
  *  2. the [lo,hi] envelope is SOUND: every matching key lies inside it
  *     (an unsound envelope is the resurrect-rows bug);
  *  3. null handling: matchesNull is true iff the interpreter matches a
  *     null key (IsNull / AlwaysTrue reach null; value predicates and
  *     their negations never do);
  *  4. matchesAll implies every key in the domain matches.
  */
class OverwriteRegionPropertySpec extends AnyFunSuite {

  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"gen failed for seed $i")))
    }

  private val col = "bucket"
  private val domain: Seq[Long] = -6L to 6L

  private val leafGen: Gen[Filter] = Gen.oneOf(
    Gen.chooseNum(-5L, 5L).map(v => EqualTo(col, v)),
    Gen.nonEmptyListOf(Gen.chooseNum(-5L, 5L))
      .map(vs => In(col, vs.map(_.asInstanceOf[Any]).toArray)),
    Gen.chooseNum(-5L, 5L).map(v => GreaterThan(col, v)),
    Gen.chooseNum(-5L, 5L).map(v => GreaterThanOrEqual(col, v)),
    Gen.chooseNum(-5L, 5L).map(v => LessThan(col, v)),
    Gen.chooseNum(-5L, 5L).map(v => LessThanOrEqual(col, v)),
    Gen.const(IsNull(col)),
    Gen.const(IsNotNull(col)),
    Gen.const(AlwaysTrue()),
    Gen.const(AlwaysFalse()))

  private def treeGen(depth: Int): Gen[Filter] =
    if (depth == 0) leafGen
    else Gen.frequency(
      3 -> leafGen,
      2 -> Gen.zip(treeGen(depth - 1), treeGen(depth - 1)).map(And.tupled),
      2 -> Gen.zip(treeGen(depth - 1), treeGen(depth - 1)).map(Or.tupled),
      1 -> treeGen(depth - 1).map(Not))

  /** Three-valued-logic reference interpreter: None = UNKNOWN (null
    * key under a value predicate). A row is replaced iff TRUE. */
  private def eval(f: Filter, key: Option[Long]): Option[Boolean] = f match {
    case AlwaysTrue()  => Some(true)
    case AlwaysFalse() => Some(false)
    case IsNull(_)     => Some(key.isEmpty)
    case IsNotNull(_)  => Some(key.nonEmpty)
    case EqualTo(_, v) => key.map(_ == v.asInstanceOf[Long])
    case In(_, vs)     => key.map(k => vs.exists(_.asInstanceOf[Long] == k))
    case GreaterThan(_, v)        => key.map(_ > v.asInstanceOf[Long])
    case GreaterThanOrEqual(_, v) => key.map(_ >= v.asInstanceOf[Long])
    case LessThan(_, v)           => key.map(_ < v.asInstanceOf[Long])
    case LessThanOrEqual(_, v)    => key.map(_ <= v.asInstanceOf[Long])
    case And(l, r) => (eval(l, key), eval(r, key)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true))            => Some(true)
      case _                                   => None
    }
    case Or(l, r) => (eval(l, key), eval(r, key)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false))        => Some(false)
      case _                                 => None
    }
    case Not(c) => eval(c, key).map(!_)
    case other  => fail(s"unhandled $other")
  }

  test("compiled region == three-valued interpreter on every key; " +
    "envelope sound; null + matchesAll flags exact") {
    forSamples(Gen.listOfN(2, treeGen(3)), 500) { fs =>
      val filters = fs.toArray[Filter]
      val region = ClusteredSinkOverwrite.compile(filters, col)
      // Spark semantics: the filter array is a conjunction
      def ref(key: Option[Long]): Boolean =
        filters.forall(f => eval(f, key).contains(true))
      for (k <- domain) {
        assert(region.matches(k) === ref(Some(k)),
          s"matches($k) wrong for ${filters.mkString(" AND ")}")
        if (region.matches(k)) {
          assert(region.lo.forall(_ <= k) && region.hi.forall(k <= _),
            s"envelope [${region.lo},${region.hi}] excludes matching $k " +
              s"for ${filters.mkString(" AND ")}")
        }
      }
      assert(region.matchesNull === ref(None),
        s"matchesNull wrong for ${filters.mkString(" AND ")}")
      if (region.matchesAll)
        domain.foreach(k => assert(region.matches(k),
          s"matchesAll but $k unmatched for ${filters.mkString(" AND ")}"))
    }
  }
}

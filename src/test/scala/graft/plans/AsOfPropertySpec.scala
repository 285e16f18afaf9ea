package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based oracle for the native as-of join (codegen'd merge):
  * random key-collided, tie-heavy, null-ridden datasets vs a
  * driver-side reference implementation of the spec — for each left
  * row, the right row in the same key group with the greatest
  * (time, tie) tuple among `time <= leftTime`; null times on either
  * side never match. The generated-Java merge state machine
  * (carry/persist/advance) must reproduce this exactly for every
  * partitioning the planner picks.
  */
class AsOfPropertySpec extends SparkSpec {
  import spark.implicits._

  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"gen failed for seed $i")))
    }

  // (key, time-or-null) pools sized to force duplicates and ties
  private val rowGen: Gen[(Long, Option[Long])] = for {
    k <- Gen.choose(1L, 6L)
    t <- Gen.frequency(
      9 -> Gen.choose(0L, 30L).map(Some(_)),
      1 -> Gen.const(Option.empty[Long]))
  } yield (k, t)

  private val datasetGen: Gen[(List[(Long, Option[Long])], List[(Long, Option[Long])])] =
    for {
      nl <- Gen.choose(1, 50)
      nr <- Gen.choose(0, 50)
      l <- Gen.listOfN(nl, rowGen)
      r <- Gen.listOfN(nr, rowGen)
    } yield (l, r)

  test("native as-of matches a driver-side reference on random data") {
    forSamples(datasetGen, 25) { case (lRows, rRows) =>
      val left = lRows.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t.map(Long.box).orNull) }
        .toDF("lid", "k", "t")
      val right = rRows.zipWithIndex
        .map { case ((k, t), i) => (k, t.map(Long.box).orNull, i.toLong) }
        .toDF("rk", "rt", "rid")

      val gotRows = GraftPlans.asofJoin(left, right, "k", "t", "rk", "rt", Seq("rid"))
        .select("lid", "rid").collect()
      // exactly one output row per left row — a Map would silently
      // collapse a duplicate-emission bug in the codegen produce loop
      assert(gotRows.length === lRows.length,
        s"expected ${lRows.length} output rows, got ${gotRows.length}")
      val got = gotRows
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toMap

      // reference: greatest (time, rid) among same-key rights with
      // non-null rt <= non-null t
      val expected = lRows.zipWithIndex.map { case ((k, tOpt), i) =>
        val m = tOpt match {
          case None => -1L
          case Some(t) =>
            val cands = rRows.zipWithIndex.collect {
              case ((rk, Some(rt)), rid) if rk == k && rt <= t => (rt, rid.toLong)
            }
            if (cands.isEmpty) -1L else cands.max._2
        }
        i.toLong -> m
      }.toMap

      assert(got === expected,
        s"left=$lRows\nright=$rRows")
    }
  }
}

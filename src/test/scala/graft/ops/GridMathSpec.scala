package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Proves the staged-division identity GridMath renders: the Spark SQL
  * expression equals floor(A·10⁶/T) computed in unbounded BigInt
  * arithmetic, for the full documented envelope (A to Long.Max, T to
  * Long.Max/1000) including the near-overflow region where the naive
  * `A * 1000000 div T` would overflow. This pins the algebra
  * independently of the oracle gate: q108/q171/q186 use the SAME
  * rendered identity on both engine sides, so a shared algebra mistake
  * would strict-pass — this spec is the side channel that catches it.
  * (The DuckDB rendering differs only in `//` for `div`; DuckDB's
  * BIGINT `//` and `%` agree with Spark's for nonnegative operands —
  * the q179 contract.)
  */
class GridMathSpec extends SparkSpec {

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(fail(s"gen failed for seed $seed"))

  private def reference(a: Long, t: Long): Long =
    ((BigInt(a) * 1000000) / BigInt(t)).toLong

  private def viaSpark(pairs: Seq[(Long, Long)]): Seq[Long] = {
    import spark.implicits._
    pairs.toDF("a", "t")
      .select(expr(GridMath.ppmSpark("a", "t")).as("g"))
      .as[Long].collect().toSeq
  }

  test("staged ppm == BigInt floor(A*1e6/T) on edge and boundary values") {
    val maxT = Long.MaxValue / 1000 // documented T ceiling
    val as = Seq(0L, 1L, 2L, 999L, 1000L, 1001L, 999999L, 1000000L,
      9223372036854L, 9223372036855L, // naive-form overflow boundary
      Long.MaxValue - 1, Long.MaxValue)
    val ts = Seq(1L, 2L, 3L, 7L, 999L, 1000L, 1000001L,
      9223372036854L, maxT - 1, maxT)
    // envelope: the RESULT must itself fit BIGINT (A/T ≤ ~9.2e12) —
    // inherent to any ppm output, see GridMath's scaladoc
    val pairs = (for (a <- as; t <- ts) yield (a, t))
      .filter { case (a, t) => BigInt(a) * 1000000 / t <= Long.MaxValue }
    assert(pairs.size > 60) // the filter must not hollow out the matrix
    val got = viaSpark(pairs)
    pairs.zip(got).foreach { case ((a, t), g) =>
      assert(g === reference(a, t), s"A=$a T=$t")
    }
  }

  test("staged ppm == BigInt floor(A*1e6/T) on random (A, T) in the envelope") {
    val gen = Gen.listOfN(400,
      Gen.zip(Gen.chooseNum(0L, Long.MaxValue),
        Gen.chooseNum(1L, Long.MaxValue / 1000)))
    val pairs = (sample(gen, 7L) ++ sample(gen, 11L))
      .map { case (a, t) =>
        // clamp T up so the result fits BIGINT (the documented envelope)
        (a, math.max(t, a / 9000000000000L + 1))
      }
    val got = viaSpark(pairs)
    pairs.zip(got).foreach { case ((a, t), g) =>
      assert(g === reference(a, t), s"A=$a T=$t")
    }
  }

  test("staged ppm is bit-identical to the naive form where the naive form fits") {
    // the claim behind "bit-identical at small scale": on the domain the
    // old rendering survived, values are unchanged
    val gen = Gen.listOfN(400,
      Gen.zip(Gen.chooseNum(0L, Long.MaxValue / 1000000),
        Gen.chooseNum(1L, Long.MaxValue / 1000)))
    val pairs = sample(gen, 13L)
    import spark.implicits._
    val both = pairs.toDF("a", "t")
      .select(expr(GridMath.ppmSpark("a", "t")).as("staged"),
        expr("a * 1000000 div t").as("naive"))
      .as[(Long, Long)].collect()
    both.foreach { case (st, nv) => assert(st === nv) }
  }
}

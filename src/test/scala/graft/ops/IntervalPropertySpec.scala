package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants for the interval operators over randomized
  * geometry (the fixed testdata can't cover degenerate shapes: touching
  * endpoints, bin-boundary-straddling windows, single-point intervals,
  * duplicate bounds).
  *
  *   - binned overlap join ≡ brute-force pair join for ANY interval set
  *     (the bin-ownership dedup neither drops nor duplicates pairs)
  *   - the concurrency sweep's peak equals the brute-force count of
  *     intervals containing the reported peak day
  */
class IntervalPropertySpec extends SparkSpec {

  private def forSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    (1 to n).foreach { i =>
      body(gen.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"gen failed for seed $i")))
    }

  // (id, cust, lo, hi) with small day/cust spaces so collisions,
  // containments, and exact-touch endpoints are common; spans cross the
  // 16-day bin width in every alignment
  private val intervalsGen: Gen[List[(Long, Long, Long, Long)]] =
    Gen.listOfN(80, for {
      cust <- Gen.choose(1L, 6L)
      lo <- Gen.choose(0L, 120L)
      span <- Gen.choose(0L, 40L)
    } yield (0L, cust, lo, lo + span)).map(_.zipWithIndex.map {
      case ((_, c, l, h), i) => (i.toLong, c, l, h)
    })

  private val W = TemporalJoins.OverlapBinDays

  test("binned overlap join equals brute force on random geometry") {
    import spark.implicits._
    forSamples(intervalsGen, 8) { ivs =>
      val df = ivs.toDF("id", "cust", "lo", "hi")
      val bins = df.withColumn("bin",
        explode(sequence(expr(s"lo div $W"), expr(s"hi div $W"))))
      val a = bins.select(col("cust"), col("id").as("id_a"),
        col("lo").as("lo_a"), col("hi").as("hi_a"), col("bin"))
      val b = bins.select(col("cust").as("cust_b"), col("id").as("id_b"),
        col("lo").as("lo_b"), col("hi").as("hi_b"), col("bin").as("bin_b"))
      val got = a.join(b, col("cust") === col("cust_b") &&
          col("bin") === col("bin_b") && col("id_a") < col("id_b"))
        .filter(col("lo_a") <= col("hi_b") && col("lo_b") <= col("hi_a"))
        .filter(col("bin") === expr(s"greatest(lo_a, lo_b) div $W"))
        .select("id_a", "id_b")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

      val brute = (for {
        x @ (ia, ca, la, ha) <- ivs
        (ib, cb, lb, hb) <- ivs
        if ca == cb && ia < ib && la <= hb && lb <= ha
      } yield (ia, ib)).toSet

      assert(got === brute, s"n=${ivs.size}")
    }
  }

  test("sweep peak equals brute-force concurrency on random geometry") {
    import spark.implicits._
    forSamples(intervalsGen, 5) { ivs =>
      val df = ivs.toDF("id", "cust", "lo", "hi")
      val bdy = df.select(col("cust"), col("lo").as("day"), lit(1L).as("delta"))
        .unionAll(df.select(col("cust"), (col("hi") + 1).as("day"),
          lit(-1L).as("delta")))
      val daily = bdy.groupBy("cust", "day").agg(sum("delta").as("d"))
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy("cust").orderBy("day")
        .rowsBetween(Long.MinValue, 0)
      val wAll = org.apache.spark.sql.expressions.Window.partitionBy("cust")
      val peaks = daily
        .select(col("cust"), col("day"), sum(col("d")).over(wCum).as("open"))
        .withColumn("peak", max(col("open")).over(wAll))
        .filter(col("open") === col("peak"))
        .groupBy("cust")
        .agg(max(col("open")).as("peak_open"), min(col("day")).as("peak_day"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))

      val byCust = ivs.groupBy(_._2)
      peaks.foreach { case (cust, peak, day) =>
        val spans = byCust(cust)
        val at = spans.count { case (_, _, lo, hi) => lo <= day && day <= hi }
        assert(at.toLong === peak, s"cust=$cust day=$day")
      }
    }
  }
}

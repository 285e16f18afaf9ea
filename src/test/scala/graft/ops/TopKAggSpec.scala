package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** TopKAgg: the bounded-state aggregate must equal the window-rank
  * formulation on random data, for EVERY partitioning (the merge path
  * is exercised differently by each partition count).
  */
class TopKAggSpec extends SparkSpec {

  private val rowsGen: Gen[List[(String, Long, Long, Long)]] =
    Gen.listOfN(400, for {
      g <- Gen.oneOf("a", "b", "c")
      c <- Gen.choose(0L, 50L) // small value space forces ties
      o <- Gen.choose(0L, 30L)
      l <- Gen.choose(0L, 3L)
    } yield (g, c, o, l))

  test("aggregator equals window rank under every partitioning") {
    import spark.implicits._
    val k = 4
    val topk = udaf(TopKAgg.aggregator(k),
      org.apache.spark.sql.Encoders.product[TopKRow])
    (1 to 4).foreach { seed =>
      val data = rowsGen(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(fail("gen failed"))
      Seq(1, 3, 13).foreach { parts =>
        val df = data.toDF("g", "c", "o", "l").repartition(parts)
        val got = df.groupBy("g")
          .agg(topk(col("c"), col("o"), col("l")).as("tk"))
          .select(col("g"), posexplode(col("tk.rows")))
          .select(col("g"), col("pos"), col("col.c"), col("col.o"),
            col("col.l"))
          .collect()
          .map(r => (r.getString(0), r.getInt(1), r.getLong(2),
            r.getLong(3), r.getLong(4))).toSet

        val expect = data.groupBy(_._1).flatMap { case (g, rows) =>
          rows.map(r => (r._2, r._3, r._4))
            .sortBy { case (c, o, l) => (-c, o, l) }
            .take(k).zipWithIndex
            .map { case ((c, o, l), i) => (g, i, c, o, l) }
        }.toSet

        assert(got === expect, s"seed=$seed parts=$parts")
      }
    }
  }

  test("saturated-buffer fast path never drops a qualifying row") {
    // ascending inserts: every row qualifies when it arrives
    val agg = TopKAgg.aggregator(3)
    val buf = (1L to 10L).foldLeft(agg.zero) { (b, i) =>
      agg.reduce(b, TopKRow(i, i, 0))
    }
    assert(agg.finish(buf).rows.map(_.c) === Seq(10L, 9L, 8L))
  }
}

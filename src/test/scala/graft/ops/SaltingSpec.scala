package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SaltingSpec extends SparkSpec {

  test("salted join is row-identical to the plain join under heavy skew") {
    import spark.implicits._
    // 90% of rows share one hot key
    val skewed = spark.range(0, 20000)
      .select(when(col("id") % 10 < 9, 1L).otherwise(col("id") % 100)
        .as("k"), col("id").as("payload"))
    val dim = spark.range(0, 100).select(col("id").as("k"),
      concat(lit("dim"), col("id")).as("label"))

    val plain = skewed.join(dim, Seq("k"))
    val salted = Salting.saltedJoin(skewed, dim, "k", factor = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("salted two-phase count matches plain count per key") {
    import spark.implicits._
    val skewed = spark.range(0, 10000)
      .select(when(col("id") % 10 < 8, 7L).otherwise(col("id") % 50).as("k"))
    val plain = skewed.groupBy("k").agg(count(lit(1)).as("cnt"))
    val salted = Salting.saltedCount(skewed, "k", factor = 16)
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }
}

package graft.ops

import graft.SparkSpec

/** q109–q111 semantics on constructed fixtures: a perfect line must
  * recover slope/intercept with r²=1, mode must tie-break on the value,
  * and XOR aggregation must cancel pairs.
  */
class StatsOpsSpec extends SparkSpec {

  private lazy val dir: String = {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("stats_fixtures").toString
    // group "O": y = 2x + 3 exactly; group "F": constant x (degenerate)
    val rows =
      Seq((1L, 1, 1.0, 5.0, "A", "O"), (2L, 1, 2.0, 7.0, "A", "O"),
        (3L, 1, 3.0, 9.0, "A", "O"), (4L, 1, 4.0, 11.0, "A", "O"),
        (5L, 2, 2.0, 1.0, "A", "F"), (6L, 2, 2.0, 9.0, "A", "F"),
        // returnflag B: linenumbers 1,1,2,2 — mode must tie-break to 1
        // (own linestatus group so they don't perturb the O regression)
        (7L, 1, 1.0, 1.0, "B", "M"), (8L, 1, 1.0, 1.0, "B", "M"),
        (9L, 2, 1.0, 1.0, "B", "M"), (10L, 2, 1.0, 1.0, "B", "M"))
    rows.toDF("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_returnflag", "l_linestatus")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    d
  }

  test("q109: exact line recovers slope 2 / intercept 3 with r2 = 1") {
    val rows = RelationalOps.queries("q109_regression")(spark, dir)
      .collect().map(r => r.getAs[String]("l_linestatus") -> r).toMap
    val o = rows("O")
    assert(o.getAs[Double]("slope") === 2.0)
    // intercept in cents (the sums are cent-gridded): 3.0 → 300
    assert(o.getAs[Double]("intercept") === 300.0)
    assert(o.getAs[Double]("r2") === 1.0)
    // degenerate group: zero x-variance → NULL fit, never an ANSI error
    val f = rows("F")
    assert(f.isNullAt(f.fieldIndex("slope")))
    assert(f.isNullAt(f.fieldIndex("intercept")))
    assert(f.isNullAt(f.fieldIndex("r2")))
  }

  test("q110: mode tie-breaks to the smaller value") {
    val rows = RelationalOps.queries("q110_mode")(spark, dir)
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    assert(rows("B").getAs[Int]("mode_linenumber") === 1)
    assert(rows("B").getAs[Long]("mode_cnt") === 2L)
    assert(rows("A").getAs[Int]("mode_linenumber") === 1)
  }

  test("q112: median and MAD are exact on a constructed distribution") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("mad_fixtures").toString
    // values 10,20,30,40,100 (an outlier): median 30, |dev| = 20,10,0,10,70
    // → MAD 10; even group 1,2,3,4: median 2.5, devs 1.5,0.5,0.5,1.5 → MAD 1
    (Seq((1L, "P1", 10.0), (2L, "P1", 20.0), (3L, "P1", 30.0),
      (4L, "P1", 40.0), (5L, "P1", 100.0),
      (6L, "P2", 1.0), (7L, "P2", 2.0), (8L, "P2", 3.0), (9L, "P2", 4.0)))
      .toDF("o_orderkey", "o_orderpriority", "o_totalprice")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val rows = RelationalOps.queries("q112_mad")(spark, d)
      .collect().map(r => r.getAs[String]("o_orderpriority") -> r).toMap
    assert(rows("P1").getAs[Double]("median_cents") === 3000.0)
    assert(rows("P1").getAs[Double]("mad_cents") === 1000.0)
    assert(rows("P1").getAs[Long]("n") === 5L)
    assert(rows("P2").getAs[Double]("median_cents") === 250.0)
    assert(rows("P2").getAs[Double]("mad_cents") === 100.0)
  }

  test("q111: xor of pairs cancels; and/or envelope the key bits") {
    val rows = RelationalOps.queries("q111_bitwise_agg")(spark, dir)
      .collect().map(r => r.getAs[String]("l_returnflag") -> r).toMap
    // B keys: 7^8^9^10 = 15^3 = 12
    assert(rows("B").getAs[Long]("key_xor") === (7L ^ 8L ^ 9L ^ 10L))
    assert(rows("A").getAs[Long]("key_and") === (1L & 2L & 3L & 4L & 5L & 6L))
    assert(rows("A").getAs[Long]("key_or") === (1L | 2L | 3L | 4L | 5L | 6L))
  }
}

package graft.catalyst

import graft.SparkSpec
import graft.text.PortableHash
import org.apache.spark.sql.functions._

class ShingleHashSpec extends SparkSpec {

  test("expression matches the reference formula and dedups shingles") {
    import spark.implicits._
    val df = Seq(
      ("a b c d", 2),    // shingles: abc, bcd
      ("a b c a b c a b c", 7), // repeated -> distinct {abc, bca, cab}
      ("x y", 0),        // too short
      ("a a a a", 1)     // single distinct shingle
    ).toDF("text", "expected_distinct")
    val out = df.select(col("expected_distinct"),
      GraftFunctions.shingleHashes(split(col("text"), " ")).as("sh")).collect()
    out.foreach { r =>
      val exp = r.getInt(0)
      val got = r.getSeq[Long](1)
      assert(got.size === (if (exp == 0) 0 else math.max(exp min 3, got.size)))
    }
    // exact value check against the arithmetic definition
    val row = df.filter(col("text") === "a b c d")
      .select(GraftFunctions.shingleHashes(split(col("text"), " "))).head()
    def h(w: String) = PortableHash.hash60Jvm(w) % ShingleHash.P
    def sh3(a: String, b: String, c: String) =
      ((h(a) * ShingleHash.A1 + h(b)) % ShingleHash.P * ShingleHash.A2 + h(c)) % ShingleHash.P
    assert(row.getSeq[Long](0) === Seq(sh3("a", "b", "c"), sh3("b", "c", "d")))
  }

  test("SQL registration: shingle_hashes callable from spark.sql") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT size(shingle_hashes(split('the quick brown fox', ' '))) AS n")
      .head().getInt(0)
    assert(n === 2)
  }

  test("null and codegen/interpreted paths agree") {
    import spark.implicits._
    val df = Seq(Some("a b c d"), None).toDF("text")
    val viaExpr = df.select(
      GraftFunctions.shingleHashes(split(col("text"), " ")).as("sh")).collect()
    assert(viaExpr.count(_.isNullAt(0)) === 1)
  }
}

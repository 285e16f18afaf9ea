package graft.catalyst

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** [[JaroWinkler]] — the q197 record-linkage kernel. Pins:
  *   1. the classic textbook values (MARTHA/MARHTA etc.) to the exact
  *     doubles the DuckDB oracle produces (probed on 250k random pairs
  *     bit-identical before the kernel landed — see scaladoc);
  *   2. the two semantic forks that make naive implementations diverge
  *     from the oracle: INTEGER-floored half-transpositions and the
  *     0.7 boost threshold;
  *   3. codegen == interpreted evaluation;
  *   4. edge cases (empty strings, null) and SQL registration.
  */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic textbook pairs match the oracle's exact doubles") {
    assert(jw("MARTHA", "MARHTA") === 0.9611111111111111)
    assert(jw("DWAYNE", "DUANE") === 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("CRATE", "TRACE") === 0.7333333333333334)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("Customer#000000001", "Customer#000000010") === 0.9888888888888889)
  }

  test("half-transpositions floor to an integer (the rapidfuzz fork)") {
    // 3 mismatched matched-positions → t = 1 (floor), NOT 1.5:
    // (4/8 + 4/4 + 3/4) / 3 = 0.75. The diff/2.0 variant yields 0.7083.
    assert(jw("ecbaeebb", "aebb") === 0.75)
  }

  test("prefix boost applies only above jaro 0.7") {
    // jaro 0.4667 with a 2-char common prefix: stays unboosted
    assert(jw("aaxxxxxxxx", "aayyyyyyyy") === 0.4666666666666666)
    // jaro 0.8333 with a 1-char prefix: boosted to 0.85
    assert(jw("aXbXcX", "abc") === 0.8500000000000001)
    // high jaro but no common prefix: unboosted
    assert(jw("xabcde", "yabcde") === 0.888888888888889)
  }

  test("empty and degenerate inputs") {
    assert(jw("", "") === 0.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("a", "") === 0.0)
    assert(jw("a", "b") === 0.0)
    assert(jw("ab", "ba") === 0.0) // window 0: no match possible
  }

  test("codegen == interpreted on random pairs") {
    val rnd = new scala.util.Random(197)
    val alph = "abcde"
    def s() = (0 until rnd.nextInt(12)).map(_ => alph(rnd.nextInt(5))).mkString
    val rows = (1 to 400).map(_ => (s(), s()))
    val df = rows.toDF("a", "b")
      .select(col("a"), col("b"),
        GraftFunctions.jaroWinkler(col("a"), col("b")).as("native"))
    // interpreted reference: the same static kernel, driver-side
    val bad = df.collect().filter { r =>
      r.getDouble(2) != jw(r.getString(0), r.getString(1))
    }
    assert(bad.isEmpty, s"codegen diverged on ${bad.take(3).mkString(", ")}")
  }

  test("null propagation and SQL registration") {
    val withNull = Seq((Some("abc"), None: Option[String]))
      .toDF("a", "b")
      .select(GraftFunctions.jaroWinkler(col("a"), col("b")).as("s"))
      .collect()
    assert(withNull(0).isNullAt(0))
    GraftFunctions.register(spark)
    val s = spark.sql("SELECT jaro_winkler('MARTHA', 'MARHTA') AS s")
      .as[Double].head()
    assert(s === 0.9611111111111111)
  }
}

package graft.catalyst

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** [[SortedIntersectCount]] — the q163 triangle-closing kernel. Pins:
  *   1. kernel == size(array_intersect) over random SORTED distinct
  *      arrays (the built-in is the semantic oracle; the kernel exists
  *      to count without materializing);
  *   2. edge cases: empty arrays, disjoint, identical, null input;
  *   3. SQL registration via GraftFunctions.register.
  */
class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("kernel == size(array_intersect) on random sorted distinct arrays") {
    val rnd = new scala.util.Random(163)
    val rows = (1 to 500).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60).toLong)
        .distinct.sorted
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
      .select(
        GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
    assert(df.filter(col("native") =!= col("builtin")).count() === 0)
  }

  test("int-array variant == long variant on the same values") {
    val rnd = new scala.util.Random(164)
    val rows = (1 to 300).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(40))(rnd.nextInt(60)).distinct.sorted
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
      .select(
        GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("ints"),
        // Cast with an explicit containsNull=false target: the DDL string
        // "array<long>" parses to containsNull=true, which the kernel's
        // strict type check (correctly) rejects — getLong would silently
        // read a null slot as 0.
        GraftFunctions.sortedIntersectCount(
          col("a").cast(ArrayType(LongType, containsNull = false)),
          col("b").cast(ArrayType(LongType, containsNull = false)))
          .as("longs"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
    assert(df.filter(col("ints") =!= col("builtin") ||
      col("longs") =!= col("builtin")).count() === 0)
  }

  test("edge cases: empty / disjoint / identical / null") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)))
      .toDF("a", "b")
      .select(GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("n"))
      .as[Long].collect()
    assert(df.toSeq === Seq(0L, 0L, 3L))
    val withNull = Seq((Some(Seq(1L)), None: Option[Seq[Long]]))
      .toDF("a", "b")
      .select(GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("n"))
      .collect()
    assert(withNull(0).isNullAt(0))
  }

  test("SQL registration") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 2L, 5L), array(2L, 5L, 9L)) AS n")
      .as[Long].head()
    assert(n === 2L)
  }
}

package graft.catalyst

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}

/** [[PackSortedLongs]] / [[PackedIntersectCount]] — the q163 shuffle-byte
  * diet. Pins:
  *   1. pack→unpack round-trips ANY long array bit-exactly (zigzag
  *      deltas — sortedness affects only size, never correctness);
  *   2. packed kernel == size(array_intersect) == unpacked kernel on
  *      random sorted distinct arrays (semantic oracle chain);
  *   3. packing is genuinely smaller than 8 B/element on sorted ids;
  *   4. edge cases: empty, disjoint, identical, null input;
  *   5. SQL registration.
  */
class PackedAdjacencySpec extends SparkSpec {
  import spark.implicits._

  test("pack → unpack round-trips arbitrary long arrays bit-exactly") {
    val rnd = new scala.util.Random(201)
    val cases = Seq(
      Array.empty[Long],
      Array(0L), Array(-1L), Array(Long.MaxValue), Array(Long.MinValue),
      Array(Long.MinValue, Long.MaxValue, 0L, -5L) // unsorted, extreme deltas
    ) ++ (1 to 200).map { _ =>
      Array.fill(rnd.nextInt(50))(rnd.nextLong())
    }
    cases.foreach { arr =>
      val packed = PackedAdjacency.pack(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(arr))
      assert(PackedAdjacency.unpack(packed).toSeq === arr.toSeq)
    }
  }

  test("packed kernel == size(array_intersect) == unpacked kernel") {
    val rnd = new scala.util.Random(163)
    val rows = (1 to 500).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(60))(rnd.nextLong() % 100000)
        .distinct.sorted
      (arr(), arr())
    }
    val df = rows.toDF("a", "b")
      .select(
        GraftFunctions.packedIntersectCount(
          GraftFunctions.packSortedLongs(col("a")),
          GraftFunctions.packSortedLongs(col("b"))).as("packed"),
        GraftFunctions.sortedIntersectCount(col("a"), col("b")).as("unpacked"),
        size(array_intersect(col("a"), col("b"))).cast("long").as("builtin"))
    assert(df.filter(col("packed") =!= col("builtin") ||
      col("unpacked") =!= col("builtin")).count() === 0)
  }

  test("sorted graph ids pack well below 8 bytes per element") {
    // the q163 producer shape: sorted distinct ids from a bounded key
    // space (part keys) — deltas are small, varints mostly 1-3 bytes
    val rnd = new scala.util.Random(7)
    val ids = Seq.fill(2000)(rnd.nextInt(2000000).toLong).distinct.sorted
    val packed = PackedAdjacency.pack(
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(ids.toArray))
    val ratio = packed.length.toDouble / (8.0 * ids.length)
    assert(ratio < 0.4,
      f"expected < 0.4 of UnsafeArrayData width, got $ratio%.2f " +
        f"(${packed.length} bytes for ${ids.length} ids)")
  }

  test("edge cases: empty / disjoint / identical / null") {
    val df = Seq(
      (Seq.empty[Long], Seq(1L, 2L)),
      (Seq(1L, 3L, 5L), Seq(2L, 4L, 6L)),
      (Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)))
      .toDF("a", "b")
      .select(GraftFunctions.packedIntersectCount(
        GraftFunctions.packSortedLongs(col("a")),
        GraftFunctions.packSortedLongs(col("b"))).as("n"))
      .as[Long].collect()
    assert(df.toSeq === Seq(0L, 0L, 3L))
    val withNull = Seq((Some(Seq(1L)), None: Option[Seq[Long]]))
      .toDF("a", "b")
      .select(GraftFunctions.packedIntersectCount(
        GraftFunctions.packSortedLongs(
          col("a").cast(ArrayType(LongType, containsNull = false))),
        GraftFunctions.packSortedLongs(
          col("b").cast(ArrayType(LongType, containsNull = false)))).as("n"))
      .collect()
    assert(withNull(0).isNullAt(0))
  }

  test("SQL registration") {
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT packed_intersect_count(" +
        "pack_sorted_longs(array(1L, 2L, 5L))," +
        "pack_sorted_longs(array(2L, 5L, 9L))) AS n")
      .as[Long].head()
    assert(n === 2L)
  }
}

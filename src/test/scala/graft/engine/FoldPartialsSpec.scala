package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[IncrementalGold.foldPartials]] (r19: the replay gates' flat state
  * views) must equal the nested [[IncrementalGold.merge]] cascade it
  * replaces — same groups, same sums, same zero-count drops — including
  * the cases that make the equivalence non-obvious: NULL group keys
  * (real groups under the merge's null-safe join), groups that cancel
  * to zero mid-chain and reappear later, and NULL measure values. */
class FoldPartialsSpec extends SparkSpec {
  import spark.implicits._

  private val keys = Seq("k1", "k2")

  private def frame(rows: Seq[(String, Integer, Long, java.lang.Double)])
      : DataFrame =
    rows.toDF("k1", "k2", "n", "m")

  private def canon(df: DataFrame): Set[(String, Integer, Long, Option[Double])] =
    df.collect().map { r =>
      (Option(r.getString(0)).orNull,
        if (r.isNullAt(1)) null else Integer.valueOf(r.getInt(1)),
        r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    }.toSet

  test("flat fold equals the nested merge cascade (null keys, zero-cancel, null measures)") {
    val b1 = frame(Seq(
      ("a", 1, 1L, 1.5),
      ("a", null, 1L, null), // NULL key component: a real group
      (null, 2, 2L, 4.0),
      ("z", 9, 1L, 2.0)))
    val b2 = frame(Seq(
      ("a", 1, 1L, 2.5),
      ("z", 9, -1L, -2.0), // cancels z's group to zero mid-chain
      ("a", null, 1L, null))) // null measure stays null through the fold
    val b3 = frame(Seq(
      ("z", 9, 2L, 7.0), // zero-cancelled group reappears
      (null, 2, -1L, -1.0)))
    val nested = IncrementalGold.merge(
      IncrementalGold.merge(b1, b2, keys, "n"), b3, keys, "n")
    val flat = IncrementalGold.foldPartials(Seq(b1, b2, b3), keys, "n")
    // the merge's 0-coalesce turns an all-NULL measure group into 0
    // where SUM keeps NULL — normalize that one representational
    // difference (invisible to every consumer: NULL-able measures are
    // always guarded by their own non-null counts)
    def zeroNull(df: DataFrame): DataFrame =
      df.withColumn("m", coalesce(col("m"), lit(0.0)))
    assert(canon(zeroNull(flat)) === canon(zeroNull(nested)))
    // the zero-cancelled-then-reborn group carries ONLY the rebirth values
    val z = flat.filter(col("k1") === "z").collect()
    assert(z.length === 1 && z.head.getLong(2) === 2L &&
      z.head.getDouble(3) === 7.0)
  }

  test("single-partial fold is the identity (no spurious zero-drop)") {
    val b1 = frame(Seq(("a", 1, 0L, 0.0), ("b", 2, 1L, 1.0)))
    // one frame: returned as-is (state bootstrapping keeps init
    // partials unfiltered, matching the pre-r19 replay fold)
    assert(IncrementalGold.foldPartials(Seq(b1), keys, "n")
      .collect().length === 2)
  }
}

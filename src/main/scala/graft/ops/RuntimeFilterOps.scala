package graft.ops

import graft.catalyst.{BloomBuild, BloomMightContain}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Runtime-filter operators: join pruning that happens BEFORE the
  * shuffle, from information only available at run time.
  *
  * The static-planning counterparts live elsewhere (predicate pushdown in
  * every scan; DSv2 DPP in `sources/v2/RangeDocSource`). This module is
  * the in-plan form: a compact summary of one join side, computed first
  * and shipped to the other side's map tasks.
  */
object RuntimeFilterOps extends QueryModule {
  import RelationalOps.dsum

  // ================================================== bloom-pruned join
  // fact ⋈ dim with a bloom pre-filter: the URGENT order keys fold into
  // a 2^12-word (32 KiB) bitset via the typed Aggregator (map-side
  // OR-combine, bounded driver value), and the native codegen predicate
  // [[BloomMightContain]] drops non-matching lineitem rows INSIDE the
  // scan's whole-stage-codegen stage — before the join exchange. False
  // positives (~0.27% at these parameters) are removed by the exact
  // LeftSemi join that follows, so the result is hash-identical to the
  // plain semi-join the oracle runs; what changed is the exchange
  // volume: ~1/5 of lineitem survives to the shuffle at sf0.01 (the
  // URGENT share) instead of 100%. RuntimeFilterSpec pins the pruning
  // (bitset FP-rate bound, survivor-count sandwich, codegen presence).
  register("q158_bloom_join",
    """SELECT l.l_linestatus AS status,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(MIN(l.l_orderkey) AS BIGINT) AS min_key,
      |  CAST(MAX(l.l_orderkey) AS BIGINT) AS max_key
      |FROM lineitem l
      |WHERE l.l_orderkey IN (
      |  SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |GROUP BY 1""".stripMargin) { (s, dir) =>
    val dimKeys = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey").cast("long").as("k"))

    // distributed bitset build: one pass over dim, OR-merged partials,
    // 4 KiB × 8 = 32 KiB driver value (guarded in BloomBuild)
    import s.implicits._
    val bloom = dimKeys.as[Long]
      .select(BloomBuild.aggregator(numWords = 1 << 12, numHashes = 5).toColumn)
      .head()

    val fact = Tables.lineitem(s, dir)
    val pruned = fact.filter(GraftColumnBridge.column(
      BloomMightContain(GraftColumnBridge.expression(col("l_orderkey").cast("long")),
        bloom.words, 5)))

    pruned
      .join(dimKeys, pruned("l_orderkey") === dimKeys("k"), "left_semi")
      .groupBy(col("l_linestatus").as("status"))
      .agg(count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"),
        min(col("l_orderkey")).cast("long").as("min_key"),
        max(col("l_orderkey")).cast("long").as("max_key"))
  }
}

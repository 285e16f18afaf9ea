package graft.ops

import graft.{SparkEntry, SparkSpec}
import graft.catalyst.{BloomBuild, BloomKernel, BloomMightContain}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.functions._

/** Pins what the q158 oracle cannot see: that the bloom filter actually
  * prunes (and how much), that it never drops a true match, and that the
  * probe runs as a native codegen predicate.
  */
class RuntimeFilterSpec extends SparkSpec {
  import spark.implicits._

  private val numWords = 1 << 10 // 64k bits
  private val k = 5

  test("kernel: no false negatives, bounded false positives") {
    val words = new Array[Long](numWords)
    val members = (0L until 2000L).map(_ * 7919L)
    members.foreach(BloomKernel.set(words, k, _))
    assert(members.forall(BloomKernel.mightContain(words, k, _)))
    // ~2000 keys in 65536 bits at k=5 → theoretical fp ≈ (1-e^(-5*2000/65536))^5 ≈ 0.05%
    val probes = (1L to 100000L).filterNot(v => v % 7919L == 0)
    val fp = probes.count(BloomKernel.mightContain(words, k, _))
    assert(fp < probes.size / 200, s"false-positive count $fp too high")
  }

  test("distributed build equals sequential build (OR-merge associativity)") {
    val keys = (0L until 5000L).map(v => v * v + 3)
    val seq = new Array[Long](numWords)
    keys.foreach(BloomKernel.set(seq, k, _))
    val dist = keys.toDF("k").repartition(7).as[Long]
      .select(BloomBuild.aggregator(numWords, k).toColumn).head()
    assert(dist.words.toSeq === seq.toSeq)
  }

  test("bloom pre-filter is a sound superset and prunes the fact side") {
    val fact = spark.range(100000L).select(col("id").as("key"))
    val dimKeys = (0L until 100000L by 1000L).toArray // 100 members
    val words = new Array[Long](numWords)
    dimKeys.foreach(BloomKernel.set(words, k, _))
    val pruned = fact.filter(GraftColumnBridge.column(
      BloomMightContain(GraftColumnBridge.expression(col("key")), words, k)))
    val survivors = pruned.count()
    // sandwich: every true member survives; false positives stay rare
    assert(survivors >= dimKeys.length)
    assert(survivors < dimKeys.length + 100000L / 100,
      s"$survivors survivors — pruning did not engage")
    val kept = pruned.as[Long].collect().toSet
    assert(dimKeys.forall(kept.contains), "a true member was dropped")
  }

  test("probe runs inside whole-stage codegen") {
    val words = new Array[Long](numWords)
    BloomKernel.set(words, k, 42L)
    val pruned = spark.range(1000L).select(col("id").as("key"))
      .filter(GraftColumnBridge.column(
        BloomMightContain(GraftColumnBridge.expression(col("key")), words, k)))
    val plan = pruned.queryExecution.executedPlan.toString
    // `*(n)` is the WholeStageCodegen marker in the compact plan string —
    // the filter must carry it (a non-codegen expression would force the
    // Filter out of the fused stage)
    assert("""\*\(\d+\) Filter bloom_might_contain""".r.findFirstIn(plan).isDefined, plan)
    assert(pruned.as[Long].collect().contains(42L))
  }

  test("q158 matches the plain semi-join it accelerates") {
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q158_bloom_join")(spark, dir)
      .orderBy("status").collect().map(_.toSeq)
    val plain = {
      val dim = Tables.orders(spark, dir)
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("k"))
      val l = Tables.lineitem(spark, dir)
      l.join(dim, l("l_orderkey") === dim("k"), "left_semi")
        .groupBy(col("l_linestatus").as("status"))
        .agg(count(lit(1)).as("n"),
          RelationalOps.dsum(col("l_quantity")).as("sum_qty"),
          min(col("l_orderkey")).cast("long").as("min_key"),
          max(col("l_orderkey")).cast("long").as("max_key"))
        .orderBy("status").collect().map(_.toSeq)
    }
    assert(got.toSeq === plain.toSeq)
  }
}

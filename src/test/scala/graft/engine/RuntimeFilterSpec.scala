package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning (Catalyst `InjectRuntimeFilter`):
  * when one join side carries a selective filter, Spark builds a Bloom
  * filter over its join keys and pushes a `might_contain` probe into the
  * other side's scan — rows that cannot match are dropped BEFORE the
  * shuffle. This is the claims⋈policies-chain pruning path at 100 TB.
  *
  * The feature is on by default; its size thresholds
  * (`creationSideThreshold` 10 MB, `applicationSideScanSizeThreshold`
  * 10 GB) are scale-gates — at test SFs they suppress injection, at
  * cluster scale they admit it. The spec lowers them to prove the
  * mechanism and the result-identity, and pins that the default config
  * leaves the feature ENABLED so the scale path needs no opt-in.
  */
class RuntimeFilterSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("runtime bloom filter is enabled by default (scale path needs no opt-in)") {
    assert(spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled") == "true")
  }

  test("selective-side bloom filter is injected and preserves results") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
    val saved = keys.map(k => k -> conf.get(k))
    // disable broadcast so the join actually shuffles (the scale shape —
    // bloom pruning matters exactly when the join is NOT broadcastable)
    val savedBc = conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      conf.set(keys(0), "0")
      conf.set(keys(1), "64MB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
      val orders = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderpriority") === "1-URGENT")
      val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("BloomFilter"),
        s"expected a bloom-filter probe in the plan:\n$plan")

      // result identity vs the un-filtered plan
      conf.set(keys(0), saved(0)._2) // restore → no injection
      val expected = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
        .count()
      conf.set(keys(0), "0")
      assert(joined.count() == expected)
    } finally {
      saved.foreach { case (k, v) => conf.set(k, v) }
      conf.set("spark.sql.autoBroadcastJoinThreshold", savedBc)
    }
  }
}

package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Evidence for the SCALE.md claim: silver tables written bucketed by
  * their join key make gold joins co-located — no shuffle exchange on
  * either side of the sort-merge join.
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-by-PK tables join with zero shuffle exchanges") {
    import spark.implicits._

    val policies = (1 to 1000)
      .map(i => (s"P$i", s"C${i % 100}", 100.0 + i)).toDF(
        "policy_id", "customer_id", "premium_amount")
    val claims = (1 to 5000)
      .map(i => (s"CL$i", s"P${i % 1000 + 1}", 10.0 * i)).toDF(
        "claim_id", "policy_id", "claim_amount")

    spark.sql("DROP TABLE IF EXISTS policies_bkt")
    spark.sql("DROP TABLE IF EXISTS claims_bkt")
    // the in-memory catalog forgets tables between JVM runs but leaves
    // their directories behind — clear them or CTAS refuses the location
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("policies_bkt", "claims_bkt").foreach { t =>
      val dir = new java.io.File(wh, t)
      if (dir.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(dir)
      }
    }
    policies.write.bucketBy(8, "policy_id").sortBy("policy_id")
      .mode("overwrite").saveAsTable("policies_bkt")
    claims.write.bucketBy(8, "policy_id").sortBy("policy_id")
      .mode("overwrite").saveAsTable("claims_bkt")

    val joined = spark.table("claims_bkt")
      .join(spark.table("policies_bkt"), Seq("policy_id"))
      .groupBy("customer_id")
      .agg(sum("claim_amount").as("total_claimed"))

    val plan = joined.queryExecution.executedPlan.toString
    // the join itself must not introduce a shuffle: only the final
    // groupBy aggregation may exchange
    val exchanges = "Exchange hashpartitioning".r
      .findAllMatchIn(plan).size
    assert(exchanges <= 1, s"expected at most the aggregation exchange:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"),
      s"unexpected join strategy:\n$plan")
    assert(joined.count() === 100)
  }
}

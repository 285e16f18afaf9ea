package graft.engine

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Evidence for the partitioned-sink claim: a month filter over a
  * hive-partitioned mart prunes to that partition's files at planning
  * time (no data read from other months).
  */
class PartitionPruningSpec extends SparkSpec {

  test("month filter on a partitioned mart shows partition pruning") {
    import spark.implicits._
    val out = java.nio.file.Files.createTempDirectory("graft-part").toString
    val mart = Seq(
      ("2024-01", "auto", 10L), ("2024-01", "home", 5L),
      ("2024-02", "auto", 7L), ("2024-03", "life", 3L))
      .toDF("policy_month", "policy_type", "policy_count")
    Sink.Parquet(out, partitions = Map("m" -> Seq("policy_month")))
      .write("gold", "m", mart)

    val filtered = spark.read.parquet(s"$out/gold/m")
      .filter(col("policy_month") === "2024-01")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"), plan)
    // only the 2024-01 partition's rows are read
    assert(filtered.count() === 2)
    val scanned = filtered.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(scanned.forall(_.contains("policy_month=2024-01")), scanned.toSeq)
  }
}

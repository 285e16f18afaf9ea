package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("sources").toString

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("amount", DoubleType)))

  test("csv reader: explicit schema, malformed rows rescued not dropped") {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,name,amount\n1,alpha,10.5\n2,beta,oops-not-a-number\n3,gamma,7.25\n"
        .getBytes("UTF-8"))
    // Spark disallows querying only the corrupt column straight off raw
    // files — cache the parsed result first (documented restriction)
    val df = Sources.csv(spark, s"$dir/data.csv", schema).cache()
    assert(df.count() === 3)
    val rescued = df.filter(col(Sources.CorruptColumn).isNotNull)
    assert(rescued.count() === 1)
    assert(rescued.head().getAs[Long]("id") === 2L)
    // well-formed rows parse fully typed
    assert(df.filter(col("id") === 3).head().getAs[Double]("amount") === 7.25)
  }

  test("json-lines reader: explicit schema round-trips and rescues bad rows") {
    val dir = tmp()
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/data.jsonl"),
      ("""{"id":1,"name":"alpha","amount":10.5}""" + "\n" +
        """not json at all""" + "\n" +
        """{"id":2,"name":"beta","amount":3.75}""" + "\n").getBytes("UTF-8"))
    val df = Sources.jsonLines(spark, s"$dir/data.jsonl", schema).cache()
    assert(df.count() === 3)
    assert(df.filter(col(Sources.CorruptColumn).isNotNull).count() === 1)
    assert(df.filter(col("id").isNotNull).count() === 2)
  }

  test("orc round-trip: schema-enforced read, filter pushdown reaches the scan") {
    val dir = tmp()
    Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", 3.5))
      .toDF("id", "name", "amount")
      .write.mode("overwrite").orc(s"$dir/orc")
    val df = Sources.orc(spark, s"$dir/orc", schema)
    assert(df.schema === schema)
    assert(df.count() === 3)
    val filtered = df.filter(col("id") > 1)
    assert(filtered.count() === 2)
    // ORC scans get the same pushdown class as parquet
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [") && plan.contains("GreaterThan"),
      plan.take(600))
  }

  test("partitioned writer lands hive layout and reads prune partitions") {
    val dir = tmp()
    val df = Seq((1L, "a", "2024-01"), (2L, "b", "2024-02"), (3L, "c", "2024-02"))
      .toDF("id", "v", "month")
    Sources.writePartitioned(df, s"$dir/t", Seq("month"))
    assert(new java.io.File(s"$dir/t/month=2024-02").isDirectory)
    val read = spark.read.parquet(s"$dir/t").filter(col("month") === "2024-02")
    assert(read.count() === 2)
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(month"),
      s"expected partition pruning in:\n$plan")
  }
}

package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSv2 write-side completion: filter overwrite (SupportsOverwrite) and
  * dynamic partition overwrite (SupportsDynamicOverwrite) on graft-sink,
  * exercised END-TO-END through Catalyst — SQL DDL/DML against a
  * [[graft.sources.v2.GraftCatalog]] table and the DataFrameWriterV2
  * `overwrite(condition)` API — not by poking connector internals.
  *
  * What the tests pin beyond row-level results:
  *   - file-granular pruning: an overwrite of one cluster key must leave
  *     files whose manifest range excludes the key UNTOUCHED on disk
  *     (same names) — the metadata-only planning step that matters at
  *     100 TB;
  *   - copy-on-write: a file holding replaced AND surviving keys is
  *     rewritten, survivors intact;
  *   - manifest consistency after every commit: sum(manifest rows) ==
  *     readable rows, every manifest file exists, no stray data files.
  */
class ClusteredSinkOverwriteSpec extends SparkSpec {
  import spark.implicits._

  private val warehouse = Files.createTempDirectory("graft_cat_spec").toString
  private val cat = "graft_cat_test"

  private def ensureCatalog(): Unit = {
    spark.conf.set(s"spark.sql.catalog.$cat",
      classOf[graft.sources.v2.GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
  }

  private def freshTable(name: String): String = {
    ensureCatalog()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.db")
    spark.sql(s"DROP TABLE IF EXISTS $cat.db.$name")
    spark.sql(s"""CREATE TABLE $cat.db.$name
      (key BIGINT, bucket BIGINT, payload STRING) PARTITIONED BY (bucket)""")
    s"$cat.db.$name"
  }

  private def tableDir(name: String): String =
    Paths.get(warehouse, "db", name).toString

  private def rows(pairs: (Long, Long, String)*): DataFrame =
    pairs.toDF("key", "bucket", "payload")

  private def readBack(name: String): DataFrame =
    spark.read.schema("key LONG, bucket LONG, payload STRING")
      .json(tableDir(name) + "/data")

  private def manifest(name: String): Seq[(String, Long)] =
    Files.readAllLines(Paths.get(tableDir(name), "_manifest.jsonl")).asScala
      .filter(_.nonEmpty).map { ln =>
        val n = new com.fasterxml.jackson.databind.ObjectMapper().readTree(ln)
        (n.get("file").asText, n.get("rows").asLong)
      }.toSeq

  private def dataFiles(name: String): Set[String] =
    Files.list(Paths.get(tableDir(name), "data")).iterator.asScala
      .map(_.getFileName.toString).toSet

  private def checkManifestConsistent(name: String): Unit = {
    val m = manifest(name)
    assert(m.map(_._2).sum === readBack(name).count(),
      "manifest row total != readable rows")
    assert(m.map(_._1).toSet === dataFiles(name),
      "manifest files != files on disk")
  }

  test("SQL INSERT INTO appends; INSERT OVERWRITE (static) truncates") {
    val t = freshTable("t_static")
    spark.sql(s"INSERT INTO $t VALUES (1, 10, 'a'), (2, 20, 'b')")
    spark.sql(s"INSERT INTO $t VALUES (3, 30, 'c')")
    assert(readBack("t_static").count() === 3)
    spark.sql(s"INSERT OVERWRITE $t VALUES (9, 90, 'z')")
    val back = readBack("t_static").as[(Long, Long, String)].collect().toSet
    assert(back === Set((9L, 90L, "z")))
    checkManifestConsistent("t_static")
  }

  test("writeTo.overwrite(condition) replaces only the matching keys and " +
    "leaves non-overlapping files untouched on disk") {
    val t = freshTable("t_filter")
    // two appends => two file generations with disjoint key ranges
    rows((1, 1, "a"), (2, 1, "b"), (3, 2, "c")).writeTo(t).append()
    rows((4, 50, "d"), (5, 60, "e")).writeTo(t).append()
    val filesBefore = dataFiles("t_filter")
    rows((10, 1, "A"), (11, 2, "B")).writeTo(t).overwrite(col("bucket") <= 2)
    val back = readBack("t_filter").as[(Long, Long, String)].collect().toSet
    assert(back === Set((10L, 1L, "A"), (11L, 2L, "B"),
      (4L, 50L, "d"), (5L, 60L, "e")))
    // the bucket-50/60 file(s) from the second append must still be the
    // SAME files — pruned by manifest range, never opened or rewritten
    val survivors = dataFiles("t_filter")
    val highBucketFiles = filesBefore.intersect(survivors)
    assert(highBucketFiles.nonEmpty,
      s"expected untouched high-bucket files; before=$filesBefore after=$survivors")
    checkManifestConsistent("t_filter")
  }

  test("copy-on-write: a file holding replaced AND surviving buckets keeps " +
    "the survivors") {
    val t = freshTable("t_cow")
    // partitions=1 => ONE file holding buckets 1,2,3
    rows((1, 1, "a"), (2, 2, "b"), (3, 3, "c"))
      .coalesce(1).writeTo(t).append()
    rows((20, 2, "B2")).writeTo(t).overwrite(col("bucket") === 2)
    val back = readBack("t_cow").as[(Long, Long, String)].collect().toSet
    assert(back === Set((1L, 1L, "a"), (20L, 2L, "B2"), (3L, 3L, "c")))
    checkManifestConsistent("t_cow")
  }

  test("SQL INSERT OVERWRITE under dynamic partitionOverwriteMode replaces " +
    "exactly the incoming buckets") {
    val t = freshTable("t_dyn")
    rows((1, 1, "a"), (2, 2, "b"), (3, 3, "c"), (4, 4, "d")).writeTo(t).append()
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      spark.sql(s"INSERT OVERWRITE $t VALUES " +
        "(20, 2, 'B'), (21, 2, 'BB'), (40, 4, 'D')")
    } finally prev match {
      case Some(p) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", p)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
    val back = readBack("t_dyn").as[(Long, Long, String)].collect().toSet
    assert(back === Set((1L, 1L, "a"), (3L, 3L, "c"),
      (20L, 2L, "B"), (21L, 2L, "BB"), (40L, 4L, "D")))
    checkManifestConsistent("t_dyn")
  }

  test("overwrite on a non-cluster column fails analysis loudly") {
    val t = freshTable("t_bad")
    rows((1, 1, "a")).writeTo(t).append()
    val e = intercept[Exception] {
      rows((2, 1, "b")).writeTo(t).overwrite(col("key") === 1)
    }
    assert(e.getMessage.contains("cluster-key") ||
      Option(e.getCause).exists(_.getMessage.contains("cluster-key")),
      s"unexpected error: ${e.getMessage}")
  }

  test("null cluster keys survive a value-predicate overwrite (3-valued " +
    "logic) and IS NULL overwrite removes exactly them") {
    val t = freshTable("t_null")
    Seq((1L, Some(1L), "a"), (2L, None: Option[Long], "n1"),
      (3L, Some(2L), "c"))
      .toDF("key", "bucket", "payload").coalesce(1).writeTo(t).append()
    // bucket=1 overwrite must NOT touch the null-bucket row
    rows((10, 1, "A")).writeTo(t).overwrite(col("bucket") === 1)
    val back1 = readBack("t_null").select("key").as[Long].collect().toSet
    assert(back1 === Set(10L, 2L, 3L))
    // IS NULL overwrite removes only the null-key row
    Seq((20L, Some(5L), "nn")).toDF("key", "bucket", "payload")
      .writeTo(t).overwrite(col("bucket").isNull)
    val back2 = readBack("t_null").select("key").as[Long].collect().toSet
    assert(back2 === Set(10L, 3L, 20L))
    checkManifestConsistent("t_null")
  }

  test("catalog surface: list/drop/rename/exists behave") {
    ensureCatalog()
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.meta")
    spark.sql(s"DROP TABLE IF EXISTS $cat.meta.t1")
    spark.sql(s"DROP TABLE IF EXISTS $cat.meta.t2")
    spark.sql(s"CREATE TABLE $cat.meta.t1 (key BIGINT, bucket BIGINT, " +
      "payload STRING) PARTITIONED BY (bucket)")
    spark.sql(s"ALTER TABLE $cat.meta.t1 RENAME TO meta.t2")
    val listed = spark.sql(s"SHOW TABLES IN $cat.meta").collect()
      .map(_.getString(1)).toSet
    assert(listed === Set("t2"))
    spark.sql(s"DROP TABLE $cat.meta.t2")
    assert(spark.sql(s"SHOW TABLES IN $cat.meta").collect().isEmpty)
  }
}

package graft.engine

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import scala.collection.mutable

/** One node of the pipeline DAG — the Spark-native analogue of a dbt model
  * (reference: dbt manifest / `{{ ref(...) }}` graph, SURVEY.md §3).
  *
  * @param build upstream model outputs by name → this model's DataFrame
  *              (a lazy logical plan; the DAG runner decides materialization)
  */
final case class Model(
    name: String,
    layer: String, // bronze | silver | gold
    deps: Seq[String],
    build: Map[String, DataFrame] => DataFrame)

/** Where materialized model outputs go — the dbt `+materialized: table`
  * full-refresh sink (dbt_project.yml:28-43). */
trait Sink {
  /** Persist and return a re-readable DataFrame of what was written
    * (the audit hook must count the *written* table, not the pre-write
    * plan — models/bronze/customers_bronze.sql:16-17). */
  def write(layer: String, name: String, df: DataFrame): DataFrame
}

object Sink {
  /** Parquet full-refresh sink: `<root>/<layer>/<name>`. Models listed in
    * `partitions` are written partitioned by those columns (hive-style
    * directories → partition pruning for downstream readers at scale). */
  final case class Parquet(root: String,
      partitions: Map[String, Seq[String]] = Map.empty) extends Sink {
    def write(layer: String, name: String, df: DataFrame): DataFrame = {
      val path = s"$root/$layer/$name"
      val writer = df.write.mode("overwrite")
      partitions.get(name).filter(_.nonEmpty)
        .fold(writer)(cols => writer.partitionBy(cols: _*))
        .parquet(path)
      df.sparkSession.read.parquet(path)
    }
  }

  /** In-memory sink (tests / interactive): caches instead of writing. */
  final case class Cached() extends Sink {
    def write(layer: String, name: String, df: DataFrame): DataFrame = {
      df.cache()
      df.count() // materialize now, mirroring CREATE TABLE AS SELECT
      df
    }
  }

  /** Metastore sink: full-refresh `saveAsTable` into `<schema>_<layer>.
    * <model>` — the reference's catalog-table materialization
    * (`+schema: bronze|silver|gold` appended to the target schema,
    * dbt_project.yml:32,37,42 + profiles.yml:7), so a downstream SQL user
    * can `spark.table("insurance_gold.gold_customer_360")` exactly like
    * the warehouse consumers of the reference. Models in `partitions`
    * are written partitioned (catalog-tracked partition pruning).
    *
    * Catalog writes are serialized on a process-wide lock: models at the
    * same DAG level materialize from concurrent threads, and embedded
    * catalogs (Derby-backed Hive, in-memory) do not take kindly to
    * concurrent CREATE DATABASE / CREATE TABLE. Local-mode concession:
    * against a production metastore (the deployment this sink models),
    * narrow the lock to the DDL and let the CTAS data writes overlap
    * like dbt's `threads: 4` does (profiles.yml:12).
    */
  final case class Table(schema: String, format: String = "parquet",
      partitions: Map[String, Seq[String]] = Map.empty) extends Sink {
    def write(layer: String, name: String, df: DataFrame): DataFrame = {
      val spark = df.sparkSession
      val db = s"${schema}_$layer"
      val fqn = s"$db.$name"
      Sink.ddlLock.synchronized {
        spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
        val writer = df.write.mode("overwrite").format(format)
        partitions.get(name).filter(_.nonEmpty)
          .fold(writer)(cols => writer.partitionBy(cols: _*))
          .saveAsTable(fqn)
      }
      spark.table(fqn)
    }
  }

  private[engine] val ddlLock = new Object
}

/** Topological DAG runner with the per-model audit post-hook — replaces
  * dbt's run lifecycle (SURVEY.md §3): parse/compile collapses into Scala
  * function composition, execution is per-model `CREATE TABLE AS SELECT`
  * (here: Sink.write), each followed by the row-count reconciliation
  * INSERT (models/bronze/customers_bronze.sql:4-19).
  *
  * Scale note: models at the same depth are independent Spark jobs; the
  * scheduler can run them concurrently (dbt `threads: 4`,
  * profiles.yml:12). We submit them from a fixed thread pool so
  * independent stages overlap cluster utilization.
  */
final class Dag(models: Seq[Model], sink: Sink, clock: Clock = Clock.System,
    auditTable: Option[String] = None) {
  require(models.map(_.name).distinct.size == models.size, "duplicate model names")
  private val byName = models.map(m => m.name -> m).toMap

  /** Names in topological order (deps before dependents). */
  def topoOrder: Seq[String] = {
    val visiting = mutable.Set[String]()
    val done = mutable.LinkedHashSet[String]()
    def visit(n: String): Unit = {
      if (!done.contains(n)) {
        require(visiting.add(n), s"cycle at $n")
        byName(n).deps.filter(byName.contains).foreach(visit)
        visiting.remove(n)
        done.add(n)
      }
    }
    models.map(_.name).foreach(visit)
    done.toSeq
  }

  /** Run the whole DAG.
    *
    * @param inputs  source tables (dbt `{{ source(...) }}` targets)
    * @param parallelism concurrent model builds within the DAG
    * @return (materialized output per model, audit-log rows in run order)
    */
  def run(inputs: Map[String, DataFrame], parallelism: Int = 4)
      : (Map[String, DataFrame], DataFrame) = {
    val spark = inputs.values.headOption.map(_.sparkSession)
      .getOrElse(SparkSession.active)
    val outputs = mutable.Map[String, DataFrame]() ++ inputs
    val audit = mutable.ArrayBuffer[Row]()
    val lock = new Object

    // level-by-level: all models whose deps are satisfied run concurrently
    val pending = mutable.LinkedHashSet[String](topoOrder: _*)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      while (pending.nonEmpty) {
        val ready = pending.filter(n =>
          byName(n).deps.forall(d => lock.synchronized(outputs.contains(d)))).toSeq
        require(ready.nonEmpty, s"unsatisfiable deps among $pending")
        val futures = ready.map { n =>
          scala.concurrent.Future {
            val m = byName(n)
            val depMap = lock.synchronized(outputs.toMap)
            val written = sink.write(m.layer, m.name, m.build(depMap))
            // audit post-hook: source count = first dependency's row count,
            // target count = written table's row count, bad_records = 0
            val srcCount = m.deps.headOption
              .map(d => depMap(d).count()).getOrElse(0L)
            val tgtCount = written.count()
            lock.synchronized {
              outputs(n) = written
              // the injected clock — NOT the wall clock — so audit rows are
              // deterministic goldens under Clock.Fixed
              audit += Row(m.name, m.layer,
                java.sql.Timestamp.from(clock.instant),
                srcCount, tgtCount, 0L)
            }
          }
        }
        import scala.concurrent.duration._
        scala.concurrent.Await.result(
          scala.concurrent.Future.sequence(futures), 2.hours)
        pending --= ready
      }
    } finally pool.shutdown()

    // rows were appended by concurrently-finishing futures; re-establish
    // run (= topological) order so the audit log is deterministic across
    // runs, as documented
    val topoIndex = topoOrder.zipWithIndex.toMap
    val ordered = audit.toSeq.sortBy(r => topoIndex(r.getString(0)))
    val auditDf = spark.createDataFrame(
      spark.sparkContext.parallelize(ordered, 1), Schemas.auditLog)
    // durable audit: the reference post-hook INSERTs into ONE accumulating
    // logging table across runs (insurance_catalog.dbt_ykandi_logging
    // .dbt_logs, models/bronze/customers_bronze.sql:4-19); an appending
    // saveAsTable is the Spark-native equivalent
    auditTable.foreach { fqn =>
      Sink.ddlLock.synchronized {
        fqn.split('.') match {
          case Array(db, _) => spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
          case _ => ()
        }
        auditDf.write.mode("append").format("parquet").saveAsTable(fqn)
      }
    }
    (outputs.toMap -- inputs.keys, auditDf)
  }
}

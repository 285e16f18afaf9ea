package graft.streaming

import graft.engine.IncrementalGold
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The q218 incremental-gold maintainer bolted onto Structured
  * Streaming — the production deployment shape: an op-coded CDC stream
  * (Debezium-style JSON before/after images, both entities on one
  * topic) folds into the maintained state ONE MICRO-BATCH AT A TIME
  * via `foreachBatch`, and the refreshed executive-summary mart is
  * handed to the caller after every commit.
  *
  * State durability is the part `foreachBatch` makes the caller own,
  * so it is implemented for real here:
  *
  *   - after folding batch `id`, the three state tables land under
  *     `stateDir/<id>/` as parquet, then a `_COMMIT` marker makes the
  *     version visible — readers and restarts only ever see fully
  *     written state;
  *   - on (re)start the maintainer resumes from the highest committed
  *     version — combined with the streaming checkpoint this recovers
  *     a stop/kill mid-stream;
  *   - `foreachBatch` REPLAYS the in-flight batch after recovery; a
  *     batch whose id is already committed is skipped, which is
  *     exactly the idempotent-sink contract exactly-once foreachBatch
  *     pipelines rely on (GoldStreamSpec pins the double-fold no-op).
  *
  * At scale the state tables are |months| + |month × customers| rows
  * (see IncrementalGold) — the parquet round-trip per batch is
  * metadata-sized next to the CDC batch itself.
  */
object GoldMaintenanceStream {

  /** One CDC record: `entity` ∈ policy/claim, `op` ∈ I/U/D, full
    * before/after row images as JSON (null where the op has no image). */
  final case class GoldCdc(entity: String, op: String, before: String,
      after: String)

  private def signedOf(df: DataFrame, entity: String,
      schema: StructType): DataFrame =
    IncrementalGold.signedDelta(
      df.filter(col("entity") === entity)
        .select(col("op"),
          from_json(col("before"), schema).as("before"),
          from_json(col("after"), schema).as("after")))

  private def versionDir(stateDir: String, id: Long): java.nio.file.Path =
    java.nio.file.Paths.get(stateDir, id.toString)

  /** Highest committed state version under `stateDir`, if any. */
  def lastCommitted(stateDir: String): Option[Long] = {
    val root = java.nio.file.Paths.get(stateDir)
    if (!java.nio.file.Files.isDirectory(root)) None
    else {
      val s = java.nio.file.Files.list(root)
      try {
        import scala.jdk.CollectionConverters._
        s.iterator.asScala
          .filter(p => java.nio.file.Files.exists(p.resolve("_COMMIT")))
          .flatMap(p => scala.util.Try(p.getFileName.toString.toLong).toOption)
          .foldLeft(Option.empty[Long])((a, b) => Some(a.fold(b)(math.max(_, b))))
      } finally s.close()
    }
  }

  def loadState(spark: org.apache.spark.sql.SparkSession, stateDir: String,
      id: Long): IncrementalGold.ExecState = {
    val d = versionDir(stateDir, id)
    IncrementalGold.ExecState(
      spark.read.parquet(d.resolve("polMonths").toString),
      spark.read.parquet(d.resolve("polCusts").toString),
      spark.read.parquet(d.resolve("clMonths").toString))
  }

  private def saveState(st: IncrementalGold.ExecState, stateDir: String,
      id: Long): Unit = {
    val d = versionDir(stateDir, id)
    st.polMonths.write.mode("overwrite").parquet(d.resolve("polMonths").toString)
    st.polCusts.write.mode("overwrite").parquet(d.resolve("polCusts").toString)
    st.clMonths.write.mode("overwrite").parquet(d.resolve("clMonths").toString)
    java.nio.file.Files.createFile(d.resolve("_COMMIT"))
    ()
  }

  /** Fold one CDC micro-batch into the durable state; no-op when `id`
    * is already committed (foreachBatch replay after recovery).
    * Exposed for GoldStreamSpec's idempotency pin. Returns the mart
    * refreshed from the state the batch left behind. */
  def foldBatch(df: DataFrame, id: Long, polSchema: StructType,
      clSchema: StructType, stateDir: String): Option[DataFrame] = {
    val spark = df.sparkSession
    val last = lastCommitted(stateDir)
    if (last.exists(_ >= id))
      Some(IncrementalGold.mart(loadState(spark, stateDir, last.get)))
    else if (df.isEmpty)
      // a no-data micro-batch must not mint a new state version (the
      // fold would copy every state table for nothing); the mart is
      // whatever the last committed state says — or absent before any
      last.map(l => IncrementalGold.mart(loadState(spark, stateDir, l)))
    else {
      val pol = IncrementalGold.narrowPolDelta(signedOf(df, "policy", polSchema))
      val cl = IncrementalGold.narrowClDelta(signedOf(df, "claim", clSchema))
      // lazy fold; the parquet write below IS the materialization
      val st = last match {
        case Some(l) => IncrementalGold.applyDelta(
          loadState(spark, stateDir, l), pol, cl, materialize = false)
        case None => IncrementalGold.init(pol, cl, materialize = false)
      }
      saveState(st, stateDir, id)
      Some(IncrementalGold.mart(loadState(spark, stateDir, id)))
    }
  }

  /** Wire the maintainer to a CDC stream. `onRefresh` receives the
    * refreshed mart after every committed batch. */
  def start(changes: Dataset[GoldCdc], polSchema: StructType,
      clSchema: StructType, stateDir: String, checkpoint: String,
      onRefresh: (Long, DataFrame) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: Dataset[GoldCdc], id: Long) =>
        foldBatch(df.toDF(), id, polSchema, clSchema, stateDir)
          .foreach(onRefresh(id, _))
      }
      .start()
}

package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Streaming serving path for the persisted IVF-PQ index
  * ([[SimilarityOps.startAnnProbeStream]]) — r15 verdict task 6, the
  * LLM-pipeline's online shape. Pins:
  *
  *   1. micro-batched stream probes, fed across a checkpointed RESTART,
  *      emit row-for-row the q215 gate's ranked frame (whose values the
  *      DuckDB oracle hash-verifies) — the online path serves exactly
  *      what the batch path serves;
  *   2. the stream never RETRAINS: the index builds (or reloads) once
  *      per JVM and every batch is probe-only ([[SimilarityOps
  *      .annBuilds]] stays flat across batches and the restart);
  *   3. a query landing in a batch by itself (no corpus co-residents in
  *      the batch) still gets full top-k — the index, not the batch, is
  *      the candidate source.
  */
class AnnStreamSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("stream probes == q215 ranked frame across a restart, no retrain") {
    // reference: the oracle-gated q215 output minus its audit column
    val expected = graft.SparkEntry.queries("q215_persisted_ivfpq")(spark, sf)
      .select("query_id", "rank", "vec_id", "adc_ppm")
    val expectedRows = expected.collect().map(_.toSeq).toSet
    assert(expectedRows.size === SimilarityOps.NumQueries * SimilarityOps.TopK)

    val builds = SimilarityOps.annBuilds.get()
    val inDir = java.nio.file.Files.createTempDirectory("ann_in").toString
    val ckpt = java.nio.file.Files.createTempDirectory("ann_ckpt").toString
    val results = scala.collection.mutable.ArrayBuffer[Seq[Any]]()

    val queries = graft.ops.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < SimilarityOps.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val schema = queries.schema

    def feed(name: String, filter: org.apache.spark.sql.Column): Unit =
      queries.filter(filter).coalesce(1).write.mode("append")
        .parquet(s"$inDir/$name")

    def start() = SimilarityOps.startAnnProbeStream(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$inDir/*"),
      sf, ckpt,
      (_, ranked) => results.synchronized {
        results ++= ranked.collect().map(_.toSeq)
      })

    // first half, including query 7 ALONE in its own file (pin 3)
    feed("b1", col("query_id") < 5)
    feed("b2", col("query_id") === 7)
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // restart, then the rest
    feed("b3", col("query_id") >= 5 && col("query_id") =!= 7)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    assert(results.size === expectedRows.size,
      s"stream emitted ${results.size} rows, batch has ${expectedRows.size}")
    assert(results.toSet === expectedRows,
      "streamed probe results diverged from the q215 gate")
    // `builds` was captured AFTER the q215 reference ran (so the index
    // already exists); the stream must not have added a single train
    assert(SimilarityOps.annBuilds.get() === builds,
      "the stream retrained the index")
  }
}

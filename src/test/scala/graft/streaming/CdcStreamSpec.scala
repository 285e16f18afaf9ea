package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming CDC apply ([[StructuredStreams.CdcProcessor]]): q200's
  * last-writer-wins contract held incrementally across micro-batches —
  * tombstones, delete-then-resurrect, and LATE records (seq behind the
  * stored winner) ignored even when they arrive in a later batch.
  */
class CdcStreamSpec extends SparkSpec {

  test("per-key winner survives batches; late and stale records are ignored") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val input = MemoryStream[CdcRec]
    val query = StructuredStreams.cdcApplyStream(input.toDS())
      .writeStream.format("memory").queryName("cdc_apply")
      .outputMode("append").start()
    try {
      // batch 1: inserts + an update for key 1
      input.addData(
        CdcRec(1, "I", 1, 10.0), CdcRec(1, "U", 2, 11.0),
        CdcRec(2, "I", 1, 20.0), CdcRec(3, "I", 1, 30.0))
      query.processAllAvailable()
      // batch 2: delete key 2; LATE record for key 1 (seq 0 — must be
      // ignored against the stored seq-2 winner); update key 3
      input.addData(
        CdcRec(2, "D", 5, 0.0), CdcRec(1, "U", 0, 99.0),
        CdcRec(3, "U", 4, 33.0))
      query.processAllAvailable()
      // batch 3: resurrect key 2 after its delete; stale delete for 3
      input.addData(CdcRec(2, "U", 7, 22.0), CdcRec(3, "D", 2, 0.0))
      query.processAllAvailable()

      val emits = spark.table("cdc_apply").as[CdcRec].collect()
      // materialize: latest emit per key is current state; D = absent
      val current = emits.groupBy(_.key).map { case (k, es) =>
        k -> es.maxBy(_.seq)
      }
      assert(current(1L) === CdcRec(1, "U", 2, 11.0)) // late seq-0 ignored
      assert(current(2L) === CdcRec(2, "U", 7, 22.0)) // resurrected
      assert(current(3L) === CdcRec(3, "U", 4, 33.0)) // stale D ignored
      // the ignored records must not even have been EMITTED
      assert(!emits.contains(CdcRec(1, "U", 0, 99.0)))
      assert(!emits.contains(CdcRec(3, "D", 2, 0.0)))
      // the tombstone for key 2 was visible before the resurrect
      assert(emits.contains(CdcRec(2, "D", 5, 0.0)))
    } finally {
      query.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}

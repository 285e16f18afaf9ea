package graft.multimodal

import java.util.concurrent.atomic.AtomicInteger

import graft.SparkSpec
import graft.ops.PlanLint
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Pins the codec deployment contract `MultimodalOps.decodeFeatures`
  * documents:
  *   (a) `MediaCodec.open()` runs once per PARTITION (where a real codec
  *       amortizes native init), `decode` once per record;
  *   (b) the decode stage is the only stage that touches `payload`: its
  *       output schema carries no BinaryType, and no shuffle above the
  *       decode boundary moves media bytes;
  *   (c) swapping [[StubCodec]] for another [[MediaCodec]] changes no
  *       query code, no schema, and (for a semantics-preserving codec)
  *       no results — the seam is the trait, not the stub.
  */
class MultimodalCodecSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("open() is called once per partition, decode once per record") {
    CountingCodec.reset()
    val media = MultimodalOps.mediaFromDocuments(spark, sf).repartition(3)
    val n = MultimodalOps.decodeFeatures(media, CountingCodec).count()
    assert(n > 0)
    // opens counts per task ATTEMPT, and a retried or speculative task
    // would legitimately re-open (r6 ADVICE) — the contract is "exactly
    // one open per attempt", i.e. at least one per partition and never
    // one per record
    assert(CountingCodec.opens.get() >= 3,
      s"expected one open() per partition, got ${CountingCodec.opens.get()}")
    assert(CountingCodec.opens.get() < n,
      "open() must be per-partition, not per-record")
    assert(CountingCodec.perAttempt.size() === CountingCodec.opens.get(),
      "every open() must belong to exactly one task attempt")
    // retry slack bounded at task-attempt granularity (r7 ADVICE): each
    // attempt decodes its partition's rows exactly once per record — a
    // codec that double-decodes within an attempt fails here even
    // though whole-task replays (which re-open) still pass
    val partRows = media.groupBy(spark_partition_id().as("p"))
      .count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    import scala.jdk.CollectionConverters._
    CountingCodec.perAttempt.asScala.foreach { case (attempt, (pid, ctr)) =>
      assert(ctr.get().toLong === partRows(pid),
        s"attempt $attempt decoded ${ctr.get()} records of partition " +
          s"$pid which holds ${partRows(pid)}")
    }
    assert(CountingCodec.decodes.get() >= n)
  }

  test("decode output schema matches featureSchema and carries no binary") {
    val media = MultimodalOps.mediaFromDocuments(spark, sf)
    val out = MultimodalOps.decodeFeatures(media)
    assert(out.schema === MultimodalOps.featureSchema)
    assert(!out.schema.exists(_.dataType == BinaryType))
  }

  test("no shuffle above the decode boundary moves BinaryType") {
    val media = MultimodalOps.mediaFromDocuments(spark, sf)
    // decode input is a map-only projection: zero exchanges below decode
    val decodeInput = media.select("media_id", "kind", "payload", "byte_len")
    assert(PlanLint.shuffleExchanges(decodeInput).isEmpty,
      "decode input must be map-only")
    // a downstream shuffle (groupBy over features) carries no media bytes
    val agg = MultimodalOps.decodeFeatures(media)
      .groupBy("kind").agg(sum("byte_len").as("bytes"), count(lit(1)).as("n"))
    agg.collect()
    val exchanges = PlanLint.shuffleExchanges(agg)
    assert(exchanges.nonEmpty)
    exchanges.foreach { e =>
      assert(!e.output.exists(_.dataType == BinaryType),
        s"shuffle carries BinaryType: ${e.output.map(_.dataType)}")
    }
  }

  test("swapping the codec changes no schema; a faithful codec changes no rows") {
    val media = MultimodalOps.mediaFromDocuments(spark, sf)
    val viaStub = MultimodalOps.decodeFeatures(media, StubCodec)
    val viaFake = MultimodalOps.decodeFeatures(media, DelegatingFakeCodec)
    assert(viaStub.schema === viaFake.schema)
    assert(viaStub.exceptAll(viaFake).count() === 0)
    assert(viaFake.exceptAll(viaStub).count() === 0)
  }

  test("the REAL header codec is a drop-in: same schema, same plumbing, " +
      "sentinel geometry for these non-image payloads") {
    // r7: ImageHeaderCodec parses genuine PNG/JPEG/GIF headers
    // (ImageHeaderCodecSpec covers true image bytes); run it through the
    // same seam on the synthetic corpus to pin that deploying the real
    // codec is JUST a constructor argument — schema and md5 column
    // identical, geometry falls back to the documented total-decode
    // sentinel because these payloads are text, not media.
    val media = MultimodalOps.mediaFromDocuments(spark, sf)
    val real = MultimodalOps.decodeFeatures(media, ImageHeaderCodec)
    val stub = MultimodalOps.decodeFeatures(media, StubCodec)
    assert(real.schema === stub.schema)
    assert(real.filter(col("width") =!= 0 || col("n_frames") =!= 0).count() === 0)
    val md5Mismatch = real.select("media_id", "payload_md5")
      .join(stub.select(col("media_id"), col("payload_md5").as("m2")), Seq("media_id"))
      .filter(col("payload_md5") =!= col("m2"))
    assert(md5Mismatch.count() === 0)
  }
}

/** Test codec that counts per-partition open() and per-record decode()
  * calls. Counters are JVM-static, which is exactly what local-mode
  * executors share; reset() before each use. */
object CountingCodec extends MediaCodec {
  val opens = new AtomicInteger(0)
  val decodes = new AtomicInteger(0)
  // taskAttemptId -> (partitionId, decodes in that attempt): lets the
  // spec bound retry slack to task-attempt granularity — each attempt
  // decodes its partition exactly once per record, never more (r7
  // ADVICE: a plain >= would tolerate double-decoding within a task)
  val perAttempt =
    new java.util.concurrent.ConcurrentHashMap[Long, (Int, AtomicInteger)]()
  def reset(): Unit = { opens.set(0); decodes.set(0); perAttempt.clear() }

  override def open(): MediaDecoder = {
    opens.incrementAndGet()
    val tc = org.apache.spark.TaskContext.get()
    val ctr = new AtomicInteger(0)
    if (tc != null) perAttempt.put(tc.taskAttemptId(), (tc.partitionId(), ctr))
    new MediaDecoder {
      def decode(kind: String, payload: Array[Byte]): MediaFeatures = {
        decodes.incrementAndGet()
        ctr.incrementAndGet()
        StubCodec.decode(kind, payload)
      }
    }
  }
}

/** A "real" codec stand-in that depends only on the trait layer
  * (MediaCodec/MediaDecoder/MediaFeatures — never StubCodec's type) and
  * happens to compute the same geometry, proving the swap contract. */
object DelegatingFakeCodec extends MediaCodec {
  override def open(): MediaDecoder = new MediaDecoder {
    private val inner: MediaDecoder = StubCodec.open()
    def decode(kind: String, payload: Array[Byte]): MediaFeatures =
      inner.decode(kind, payload)
  }
}

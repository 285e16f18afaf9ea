package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q230/q231 audio-feature semantics beyond the oracle gate:
  * the exact-integer resample degenerates correctly at the identity
  * rate, the Haar split obeys Parseval exactly, and ZCR counts real
  * sign transitions.
  */
class AudioFeatureSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  test("identity-rate clips (16 kHz) resample to themselves: " +
      "n_out == n_frames and sum_num == dst * sum_v") {
    val stats = MultimodalOps.pcmStats(MultimodalOps.realAudio(spark, sf))
      .select(col("media_id"), col("channel"), col("n_frames"), col("sum_v"))
    val res = MultimodalOps.pcmResample(MultimodalOps.realAudio(spark, sf))
    // doc_id % 4 == 1 → 16 kHz (WavFixtures.Rates)
    val joined = res.join(stats, Seq("media_id", "channel"))
      .filter(col("media_id") % 4 === 1)
    assert(joined.count() > 0)
    assert(joined.filter(col("n_out") =!= col("n_frames")).count() === 0)
    assert(joined.filter(
      col("sum_num") =!= col("sum_v") * MultimodalOps.ResampleDst)
      .count() === 0, "identity resample must reproduce the input sum")
  }

  test("upsampled clips (8 kHz -> 16 kHz) double the output count") {
    val res = MultimodalOps.pcmResample(MultimodalOps.realAudio(spark, sf))
      .filter(col("media_id") % 4 === 0) // 8 kHz
    // nOut = 1 + (f-1)*16000/8000 = 2f - 1
    val stats = MultimodalOps.pcmStats(MultimodalOps.realAudio(spark, sf))
      .select(col("media_id"), col("channel"), col("n_frames"))
    val bad = res.join(stats, Seq("media_id", "channel"))
      .filter(col("n_out") =!= col("n_frames") * 2 - 1)
    assert(res.count() > 0 && bad.count() === 0)
  }

  test("Haar band split obeys Parseval EXACTLY: e_low + e_high == " +
      "2 * energy on every frame") {
    val f = MultimodalOps.pcmFrameFeatures(MultimodalOps.realAudio(spark, sf))
    assert(f.count() > 0)
    assert(f.filter(col("e_low") + col("e_high") =!= col("energy") * 2)
      .count() === 0)
  }

  test("ZCR counts sign transitions: a +/- alternating 16-bit clip has " +
      "63 crossings per frame; a constant-sign clip has none") {
    // hand-built PCM: one channel, 128 frames, 16-bit
    def clip(vals: Seq[Int]): Array[Byte] = {
      def le16(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      val fmt = "fmt ".getBytes("US-ASCII") ++
        Array[Byte](16, 0, 0, 0) ++
        le16(1) ++ le16(1) ++
        Array[Byte](0x80.toByte, 0x3e, 0, 0) ++ // 16000 Hz
        Array[Byte](0, 0x7d.toByte, 0, 0) ++    // byte rate 32000
        le16(2) ++ le16(16)
      val data = vals.flatMap(v => le16(if (v < 0) v + 65536 else v)).toArray
      val dataCk = "data".getBytes("US-ASCII") ++
        Array[Byte]((data.length & 0xff).toByte,
          ((data.length >> 8) & 0xff).toByte, 0, 0) ++ data
      val body = "WAVE".getBytes("US-ASCII") ++ fmt ++ dataCk
      "RIFF".getBytes("US-ASCII") ++
        Array[Byte]((body.length & 0xff).toByte,
          ((body.length >> 8) & 0xff).toByte, 0, 0) ++ body
    }
    val alternating = clip((0 until 128).map(i => if (i % 2 == 0) 100 else -100))
    val constant = clip(Seq.fill(128)(7))
    import spark.implicits._
    val media = Seq((1L, alternating), (2L, constant))
      .toDF("media_id", "payload")
    val f = MultimodalOps.pcmFrameFeatures(media).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    assert(f((1L, 0L)) === 63L && f((1L, 1L)) === 63L)
    assert(f((2L, 0L)) === 0L && f((2L, 1L)) === 0L)
  }
}

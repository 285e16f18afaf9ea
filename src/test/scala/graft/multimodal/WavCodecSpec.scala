package graft.multimodal

/** [[AudioHeaderCodec]] against genuine [[WavFixtures]] bytes: header
  * facts round-trip, the chunk walk handles odd-size padding and
  * unknown chunks, and malformed payloads degrade to None (total
  * function — the MediaCodec retry-idempotence contract).
  */
class WavCodecSpec extends org.scalatest.funsuite.AnyFunSuite {

  test("PCM header facts round-trip through real bytes") {
    for (rate <- WavFixtures.Rates; ch <- Seq(1, 2); bits <- Seq(8, 16);
         frames <- Seq(1, 7, 500); list <- Seq(false, true)) {
      val h = AudioHeaderCodec.decode(
        WavFixtures.wav(rate, ch, bits, frames, list))
        .getOrElse(fail(s"undecodable: $rate/$ch/$bits/$frames/$list"))
      assert(h.formatTag === 1)
      assert(h.sampleRate === rate)
      assert(h.channels === ch)
      assert(h.bitsPerSample === bits)
      assert(h.nFrames === frames.toLong)
    }
  }

  test("fixture payloads decode to the doc_id arithmetic the oracle uses") {
    for (docId <- 0L until 40L) {
      val h = AudioHeaderCodec.decode(WavFixtures.payloadFor(docId)).get
      assert(h.sampleRate === WavFixtures.Rates((docId % 4).toInt))
      assert(h.channels === (1 + docId % 2).toInt)
      assert(h.bitsPerSample === (if (docId % 3 == 0) 8 else 16))
      assert(h.nFrames === 1 + docId % 500)
    }
  }

  test("odd-sized LIST chunk is walked with its pad byte, not misaligned") {
    val withList = WavFixtures.wav(8000, 1, 8, 13, listChunk = true)
    val without = WavFixtures.wav(8000, 1, 8, 13, listChunk = false)
    assert(AudioHeaderCodec.decode(withList) === AudioHeaderCodec.decode(without))
    // the LIST payload here is odd-sized by construction: a 13-byte INAM
    // subchunk — misaligned walks would land mid-chunk and fail
    assert((withList.length - without.length) % 2 === 0)
  }

  test("malformed payloads are total: None, never a throw") {
    val good = WavFixtures.wav(8000, 1, 16, 5)
    assert(AudioHeaderCodec.decode(Array.empty[Byte]).isEmpty)
    assert(AudioHeaderCodec.decode("RIFFxxxxWAVE".getBytes("US-ASCII")).isEmpty)
    assert(AudioHeaderCodec.decode(good.take(20)).isEmpty) // truncated fmt
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    assert(AudioHeaderCodec.decode(badMagic).isEmpty)
    // data-chunk length pointing past the payload end
    val overrun = good.clone()
    val dataOff = {
      var o = 12
      while (new String(overrun, o, 4, "US-ASCII") != "data") {
        val len = (overrun(o + 4) & 0xff) | ((overrun(o + 5) & 0xff) << 8)
        o += 8 + len + (len % 2)
      }
      o
    }
    overrun(dataOff + 4) = 0xff.toByte; overrun(dataOff + 5) = 0xff.toByte
    assert(AudioHeaderCodec.decode(overrun).isEmpty)
  }
}

package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[WavPcmCodec]] unit pins (q205's decode kernel):
  *   1. round-trip: decoded samples equal the fixture's closed-form
  *      byte pattern for 8-bit (unsigned, 128-centered) and 16-bit
  *      (signed LE) clips, mono and stereo, with and without the
  *      odd-sized LIST chunk in the walk;
  *   2. malformed streams are REJECTED: truncated data chunk, ragged
  *      data size (not a whole number of blocks), non-PCM format tag,
  *      unsupported bit depth, bad magic.
  */
class WavPcmCodecSpec extends AnyFunSuite {

  /** The WavFixtures data pattern: byte i = (i·31 + nFrames) mod 256. */
  private def expected(docId: Long): Map[(Int, Int), Int] = {
    val ch = (1 + docId % 2).toInt
    val bits = if (docId % 3 == 0) 8 else 16
    val f = (1 + docId % 500).toInt
    (for (t <- 0 until f; c <- 0 until ch) yield {
      val k = t * ch + c
      val v =
        if (bits == 8) ((k * 31 + f) % 256) - 128
        else {
          val lo = (2 * k * 31 + f) % 256
          val hi = ((2 * k + 1) * 31 + f) % 256
          val raw = lo + 256 * hi
          if (raw >= 32768) raw - 65536 else raw
        }
      (c, t) -> v
    }).toMap
  }

  test("round-trip: decoded PCM matches the closed-form fixture pattern") {
    // ids covering 8/16-bit × mono/stereo × LIST-chunk-present
    for (docId <- Seq(0L, 1L, 2L, 3L, 5L, 10L, 499L, 1001L)) {
      val pcm = WavPcmCodec.decodePcm(WavFixtures.payloadFor(docId))
        .getOrElse(fail(s"decode failed for docId=$docId"))
      val exp = expected(docId)
      assert(pcm.channels === (1 + docId % 2).toInt)
      assert(pcm.bits === (if (docId % 3 == 0) 8 else 16))
      assert(pcm.nFrames === (1 + docId % 500).toInt)
      for (c <- 0 until pcm.channels; t <- 0 until pcm.nFrames)
        assert(pcm.samples(c)(t) === exp((c, t)),
          s"docId=$docId channel $c frame $t")
    }
  }

  test("malformed clips are rejected, not misdecoded") {
    val good = WavFixtures.wav(8000, 2, 16, 25)
    assert(WavPcmCodec.decodePcm(good).isDefined)
    // truncated mid-data
    assert(WavPcmCodec.decodePcm(good.dropRight(10)).isEmpty)
    // ragged data size: shave one byte off the data chunk AND its size
    // field would no longer be block-aligned — simulate by building a
    // 16-bit stereo clip then flipping its data length to an odd block
    val ragged = good.clone()
    // find the "data" tag and decrement its LE32 size by 1 (4 bytes/block)
    val idx = (0 until ragged.length - 4).find(i =>
      ragged(i) == 'd' && ragged(i + 1) == 'a' &&
        ragged(i + 2) == 't' && ragged(i + 3) == 'a').get
    ragged(idx + 4) = (ragged(idx + 4) - 1).toByte
    assert(WavPcmCodec.decodePcm(ragged).isEmpty,
      "data size not a whole number of blocks must be rejected")
    // non-PCM format tag (IEEE float = 3)
    val nonPcm = good.clone()
    val fidx = (0 until nonPcm.length - 4).find(i =>
      nonPcm(i) == 'f' && nonPcm(i + 1) == 'm' &&
        nonPcm(i + 2) == 't' && nonPcm(i + 3) == ' ').get
    nonPcm(fidx + 8) = 3
    assert(WavPcmCodec.decodePcm(nonPcm).isEmpty)
    // unsupported bit depth
    assert(WavPcmCodec.decodePcm(WavFixtures.wav(8000, 1, 24, 10)).isEmpty)
    // bad magic
    val bad = good.clone(); bad(0) = 'X'
    assert(WavPcmCodec.decodePcm(bad).isEmpty)
    assert(WavPcmCodec.decodePcm(Array.empty[Byte]).isEmpty)
  }
}

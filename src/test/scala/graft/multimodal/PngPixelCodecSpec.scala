package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[PngPixelCodec]] unit pins (q202's decode kernel):
  *   1. round-trip: decoded pixels equal the fixture's closed-form
  *      pattern for ids that cycle through every PNG filter type and
  *      the split-IDAT path;
  *   2. malformed streams are REJECTED, not misdecoded: truncated zlib
  *      trailer (r11 ADVICE — a stream whose end-of-stream marker never
  *      arrives must return None even when the byte count is exact),
  *      over-long stream, short stream, bad filter byte, wrong color
  *      type, corrupt signature.
  */
class PngPixelCodecSpec extends AnyFunSuite {

  private def expectedPixel(x: Int, y: Int, base: Int, ch: Int): Int = ch match {
    case 0 => (x + y + base) & 0xff
    case 1 => (2 * x + base) & 0xff
    case _ => (3 * y + base) & 0xff
  }

  test("round-trip: decoded pixels match the closed-form fixture pattern") {
    // ids chosen so heights ≥ 5 (all five filter types appear) and both
    // the split-IDAT and single-IDAT paths execute
    for (docId <- Seq(3L, 12L, 47L, 100L, 255L, 1023L)) {
      val png = ImageFixtures.pixelPngFor(docId)
      val rgb = PngPixelCodec.decodeRgb(png)
        .getOrElse(fail(s"decode failed for docId=$docId"))
      val w = (1 + docId % 16).toInt
      val h = (1 + (docId * 7) % 16).toInt
      val base = (docId % 128).toInt
      assert(rgb.width === w && rgb.height === h)
      assert(rgb.pixels.length === 3 * w * h)
      for (y <- 0 until h; x <- 0 until w; ch <- 0 until 3) {
        val got = rgb.pixels(3 * (y * w + x) + ch) & 0xff
        assert(got === expectedPixel(x, y, base, ch),
          s"docId=$docId pixel ($x,$y) channel $ch")
      }
    }
  }

  /** Rebuild a PNG whose single IDAT holds `body` verbatim (CRC valid —
    * the corruption under test lives INSIDE the zlib stream). */
  private def withIdat(docId: Long, mutate: Array[Byte] => Array[Byte]): Array[Byte] = {
    val png = ImageFixtures.pixelPngFor(docId)
    // extract w/h and the concatenated IDAT payload by the same walk the
    // codec uses, then re-emit with a single mutated IDAT
    val idat = new java.io.ByteArrayOutputStream()
    var pos = 8
    var ihdrData = Array.empty[Byte]
    while (pos + 8 <= png.length) {
      val len = (((png(pos) & 0xff) << 24) | ((png(pos + 1) & 0xff) << 16) |
        ((png(pos + 2) & 0xff) << 8) | (png(pos + 3) & 0xff))
      val ctype = new String(png, pos + 4, 4, "US-ASCII")
      if (ctype == "IHDR") ihdrData = png.slice(pos + 8, pos + 8 + len)
      if (ctype == "IDAT") idat.write(png, pos + 8, len)
      pos += 12 + len
    }
    val body = mutate(idat.toByteArray)
    def chunk(t: String, d: Array[Byte]): Array[Byte] = {
      val crc = new java.util.zip.CRC32
      val tb = t.getBytes("US-ASCII")
      crc.update(tb); crc.update(d)
      val lenB = Array((d.length >>> 24).toByte, ((d.length >> 16) & 0xff).toByte,
        ((d.length >> 8) & 0xff).toByte, (d.length & 0xff).toByte)
      val c = crc.getValue.toInt
      lenB ++ tb ++ d ++ Array((c >>> 24).toByte, ((c >> 16) & 0xff).toByte,
        ((c >> 8) & 0xff).toByte, (c & 0xff).toByte)
    }
    png.take(8) ++ chunk("IHDR", ihdrData) ++ chunk("IDAT", body) ++
      chunk("IEND", Array.empty[Byte])
  }

  test("truncated zlib trailer is rejected (exact byte count, no end marker)") {
    // Dropping the 4-byte adler32 trailer (and the final block's end
    // marker lives just before it for these tiny streams) must yield
    // None: the inflater produces all outLen bytes but never finishes.
    val truncated = withIdat(47L, body => body.dropRight(4))
    assert(PngPixelCodec.decodeRgb(truncated).isEmpty,
      "a stream with a truncated trailer must be rejected")
    // sanity: the unmutated rebuild decodes fine (the harness itself is valid)
    val intact = withIdat(47L, identity)
    assert(PngPixelCodec.decodeRgb(intact).isDefined)
  }

  test("over-long stream (extra raw row appended) is rejected") {
    val png = ImageFixtures.pixelPngFor(12L)
    val w = (1 + 12L % 16).toInt
    // re-deflate the original raw bytes plus one extra filtered row
    val rgb = PngPixelCodec.decodeRgb(png).get
    val stride = 3 * w
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until rgb.height) {
      raw.write(0) // filter None
      raw.write(rgb.pixels, y * stride, stride)
    }
    raw.write(0); raw.write(new Array[Byte](stride)) // extra row
    val deflater = new java.util.zip.Deflater
    val rawB = raw.toByteArray
    deflater.setInput(rawB); deflater.finish()
    val buf = new Array[Byte](rawB.length + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val overlong = withIdat(12L, _ => buf.take(n))
    assert(PngPixelCodec.decodeRgb(overlong).isEmpty,
      "a stream longer than the IHDR-implied size must be rejected")
  }

  test("over-long stream by exactly ONE surplus byte is rejected (r12 ADVICE)") {
    // The full-extra-row case above leaves the probe inflate mid-stream
    // (finished() false) and never exercised the probe's RETURN VALUE; a
    // stream with exactly one surplus decompressed byte makes the probe
    // consume it AND flip finished() — the discarded-return edge where
    // the old code accepted a stream violating the exact-byte-count
    // contract.
    val png = ImageFixtures.pixelPngFor(12L)
    val rgb = PngPixelCodec.decodeRgb(png).get
    val w = (1 + 12L % 16).toInt
    val stride = 3 * w
    val raw = new java.io.ByteArrayOutputStream()
    for (y <- 0 until rgb.height) {
      raw.write(0)
      raw.write(rgb.pixels, y * stride, stride)
    }
    raw.write(0x7f) // ONE surplus byte past the IHDR-implied count
    val deflater = new java.util.zip.Deflater
    val rawB = raw.toByteArray
    deflater.setInput(rawB); deflater.finish()
    val buf = new Array[Byte](rawB.length + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val overByOne = withIdat(12L, _ => buf.take(n))
    assert(PngPixelCodec.decodeRgb(overByOne).isEmpty,
      "a stream with one surplus decompressed byte must be rejected")
  }

  test("short stream, bad signature, unsupported color type are rejected") {
    assert(PngPixelCodec.decodeRgb(
      withIdat(3L, body => body.take(body.length / 2))).isEmpty)
    val png = ImageFixtures.pixelPngFor(3L)
    val badSig = png.clone(); badSig(0) = 0x00
    assert(PngPixelCodec.decodeRgb(badSig).isEmpty)
    assert(PngPixelCodec.decodeRgb(Array.empty[Byte]).isEmpty)
    // the plain truecolor builder (all-zero pixels) stays in scope
    assert(PngPixelCodec.decodeRgb(ImageFixtures.png(4, 4)).isDefined)
    // flip IHDR's color type to 0 (grayscale) — declared out of scope,
    // must reject rather than misdecode (CRC recomputed via the rebuild)
    val gray = {
      val png = ImageFixtures.pixelPngFor(3L)
      var pos = 8
      val len = (((png(pos) & 0xff) << 24) | ((png(pos + 1) & 0xff) << 16) |
        ((png(pos + 2) & 0xff) << 8) | (png(pos + 3) & 0xff))
      val ihdr = png.slice(pos + 8, pos + 8 + len)
      ihdr(9) = 0 // color type byte
      val crc = new java.util.zip.CRC32
      crc.update("IHDR".getBytes("US-ASCII")); crc.update(ihdr)
      val out = png.clone()
      System.arraycopy(ihdr, 0, out, pos + 8, len)
      val c = crc.getValue.toInt
      out(pos + 8 + len) = (c >>> 24).toByte
      out(pos + 9 + len) = ((c >> 16) & 0xff).toByte
      out(pos + 10 + len) = ((c >> 8) & 0xff).toByte
      out(pos + 11 + len) = (c & 0xff).toByte
      out
    }
    assert(PngPixelCodec.decodeRgb(gray).isEmpty)
  }
}

package graft.multimodal

/** Real pure-JVM media codec: parses genuine image container headers —
  * no external libraries, just the public file-format layouts — and
  * extracts true geometry from payload bytes:
  *
  *   - PNG: 8-byte signature, then the IHDR chunk's big-endian
  *     width/height; an APNG `acTL` chunk (if present before IDAT)
  *     supplies the real frame count.
  *   - JPEG: SOI then a marker walk to the first frame header
  *     (SOF0/SOF2 and the other SOFn, skipping DHT/DAC/RSTn), whose
  *     big-endian height/width fields are the image geometry.
  *   - GIF: GIF87a/GIF89a logical screen descriptor's little-endian
  *     width/height; frames counted by walking the block stream
  *     (0x2C image descriptors, skipping extension and data sub-blocks).
  *
  * Anything else — including this repo's synthetic text payloads — maps
  * to the TOTAL-decode sentinel `MediaFeatures(0, 0, 0, md5)` rather
  * than throwing, per the [[MediaCodec]] contract (corrupt payloads
  * must decode deterministically so task retries are idempotent).
  *
  * Since r10 this codec is what EVERY oracle-gated multimodal query
  * (q34/q72/q73/q194) runs — each synthesizes genuine containers via
  * [[ImageFixtures]] and the oracle recomputes the geometry closed-form,
  * so a mis-parse of any header field diverges. [[StubCodec]] survives
  * only as MultimodalCodecSpec's test double, which runs BOTH codecs
  * through `decodeFeatures` to pin that a codec swap changes no schema,
  * no plan shape, and no plumbing.
  */
object ImageHeaderCodec extends MediaCodec with MediaDecoder {
  override def open(): MediaDecoder = this

  override def decode(kind: String, payload: Array[Byte]): MediaFeatures = {
    val md5 = java.security.MessageDigest.getInstance("MD5").digest(payload)
      .map("%02x".format(_)).mkString
    val parsed =
      try {
        if (isPng(payload)) parsePng(payload).map(t => (t, "none"))
        else if (isJpeg(payload)) parseJpeg(payload).map { case (w, h, f, m) =>
          ((w, h, f), scanClass(m)) }
        else if (isGif(payload)) parseGif(payload).map(t => (t, "none"))
        else None
      } catch { case _: RuntimeException => None } // truncated/corrupt
    parsed match {
      case Some(((w, h, frames), scan)) => MediaFeatures(w, h, frames, md5, scan)
      case None => MediaFeatures(0, 0, 0, md5) // total-decode sentinel
    }
  }

  /** Entropy-scan class of a JPEG SOFn marker (r16 advice: progressive
    * files are common in web crawls; the class is header-cheap to read
    * even where the scan itself is not decoded). */
  private def scanClass(marker: Int): String = marker match {
    case 0xc0 => "baseline"
    case 0xc1 => "extended"
    case 0xc2 => "progressive"
    case 0xc3 => "lossless"
    case 0xc9 => "arithmetic"
    case 0xca => "progressive_arithmetic"
    case 0xcb => "lossless_arithmetic"
    case m if m >= 0xc5 && m <= 0xc7 => "differential"
    case m if m >= 0xcd && m <= 0xcf => "differential_arithmetic"
    case _ => "other"
  }

  // unsigned accessors — image formats store unsigned fields
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xff
  private def be16(b: Array[Byte], i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def le16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def be32(b: Array[Byte], i: Int): Long =
    (u8(b, i).toLong << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)

  private val PngSig =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def isPng(b: Array[Byte]): Boolean =
    b.length >= 24 && b.take(8).sameElements(PngSig)

  /** PNG: IHDR is required to be the first chunk (offset 8: len, "IHDR",
    * 13-byte body). Frame count: 1, unless an APNG `acTL` chunk appears
    * before the first IDAT — its first field is the animation's
    * num_frames. Chunk walk is bounded by the payload length. */
  private def parsePng(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (!(b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R'))
      return None
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0 || w > Int.MaxValue || h > Int.MaxValue) return None
    var frames = 1
    // chunk walk: [len:4][type:4][data:len][crc:4], starting after IHDR
    var i = 8 + 12 + 13
    var done = false
    while (!done && i + 8 <= b.length) {
      val len = be32(b, i)
      val ctype = new String(b, i + 4, 4, "US-ASCII")
      if (ctype == "IDAT" || ctype == "IEND") done = true
      else if (ctype == "acTL" && len >= 8 && i + 8 + 8 <= b.length)
        frames = be32(b, i + 8).toInt.max(1)
      if (len < 0 || len > Int.MaxValue - 12) done = true
      else i += 12 + len.toInt
    }
    Some((w.toInt, h.toInt, frames))
  }

  private def isJpeg(b: Array[Byte]): Boolean =
    b.length >= 4 && u8(b, 0) == 0xff && u8(b, 1) == 0xd8

  /** JPEG: walk the marker stream from SOI to the first frame header.
    * Frame markers are 0xC0–0xCF except DHT (C4), JPG (C8), DAC (CC);
    * their payload is [len:2][precision:1][height:2][width:2]. Fill
    * bytes (repeated 0xFF) and standalone markers (RSTn, TEM) are
    * skipped; SOS/EOI without a preceding SOF means no geometry. The
    * fourth tuple element is the SOFn MARKER byte (scan class). */
  private def parseJpeg(b: Array[Byte]): Option[(Int, Int, Int, Int)] = {
    var i = 2
    while (i + 4 <= b.length) {
      if (u8(b, i) != 0xff) return None // desynced marker stream
      var j = i
      while (j + 1 < b.length && u8(b, j + 1) == 0xff) j += 1 // fill bytes
      val marker = u8(b, j + 1)
      i = j + 2
      marker match {
        case m if m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc =>
          if (i + 7 > b.length) return None
          val h = be16(b, i + 3)
          val w = be16(b, i + 5)
          return if (w > 0 && h > 0) Some((w, h, 1, m)) else None
        case 0xd9 | 0xda => return None // EOI / SOS before any SOF
        case m if m == 0x01 || (m >= 0xd0 && m <= 0xd7) => // standalone
        case _ =>
          if (i + 2 > b.length) return None
          val len = be16(b, i)
          if (len < 2) return None
          i += len
      }
    }
    None
  }

  private def isGif(b: Array[Byte]): Boolean =
    b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  /** GIF: logical screen descriptor carries LE16 width/height; frames =
    * number of image descriptors (0x2C blocks) found walking the block
    * stream, skipping the global/local color tables and the
    * length-prefixed data sub-block chains. */
  private def parseGif(b: Array[Byte]): Option[(Int, Int, Int)] = {
    val w = le16(b, 6)
    val h = le16(b, 8)
    if (w <= 0 || h <= 0) return None
    val flags = u8(b, 10)
    var i = 13
    if ((flags & 0x80) != 0) i += 3 * (1 << ((flags & 0x07) + 1)) // GCT
    var frames = 0

    def skipSubBlocks(): Boolean = {
      while (i < b.length && u8(b, i) != 0) {
        i += 1 + u8(b, i)
        if (i > b.length) return false
      }
      i += 1 // block terminator
      i <= b.length
    }

    var done = false
    while (!done && i < b.length) {
      u8(b, i) match {
        case 0x2c => // image descriptor
          if (i + 10 > b.length) done = true
          else {
            frames += 1
            val lflags = u8(b, i + 9)
            i += 10
            if ((lflags & 0x80) != 0) i += 3 * (1 << ((lflags & 0x07) + 1))
            i += 1 // LZW minimum code size
            if (!skipSubBlocks()) done = true
          }
        case 0x21 => // extension: introducer + label, then sub-blocks
          i += 2
          if (!skipSubBlocks()) done = true
        case 0x3b => done = true // trailer
        case _ => done = true // unknown block: stop, keep what we have
      }
    }
    Some((w, h, frames.max(1)))
  }
}

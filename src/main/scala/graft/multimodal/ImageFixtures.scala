package graft.multimodal

import java.util.zip.{CRC32, Deflater}

/** Genuine image containers built byte-by-byte to the PUBLIC format
  * specs (PNG RFC 2083 / APNG, JPEG/JFIF ITU T.81, GIF89a) — real
  * signatures, real chunk CRCs, real deflate streams, real marker
  * segments — so [[ImageHeaderCodec]] is exercised against true payload
  * bytes, not hand-waved stubs. The 1×1 GIF is the canonical 43-byte
  * file every tracking pixel on the web ships.
  *
  * Main scope (moved from ImageHeaderCodecSpec in r8) because
  * q194_image_header_decode uses these builders to synthesize a real
  * media corpus at query time; the spec keeps using the same object.
  */
object ImageFixtures {

  private def u8s(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def be16(v: Int) = u8s(v >> 8, v & 0xff)
  private def le16(v: Int) = u8s(v & 0xff, v >> 8)
  private def be32(v: Int) = u8s(v >>> 24, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)

  private def pngChunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val crc = new CRC32
    val t = ctype.getBytes("US-ASCII")
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** Fully valid truecolor PNG (correct CRCs, decodable deflate stream);
    * with frames > 1, an APNG acTL chunk precedes IDAT. */
  def png(w: Int, h: Int, frames: Int = 1): Array[Byte] = {
    val sig = u8s(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = pngChunk("IHDR", be32(w) ++ be32(h) ++ u8s(8, 2, 0, 0, 0))
    val actl = if (frames > 1) pngChunk("acTL", be32(frames) ++ be32(0))
               else Array.empty[Byte]
    val raw = Array.fill(h * (1 + 3 * w))(0.toByte) // filter byte + RGB rows
    val deflater = new Deflater
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val idat = pngChunk("IDAT", buf.take(n))
    val iend = pngChunk("IEND", Array.empty)
    sig ++ ihdr ++ actl ++ idat ++ iend
  }

  /** Structurally valid JFIF: SOI, APP0, DQT, SOF0 (or SOF2 when
    * progressive), DHT, SOS, entropy byte, EOI. */
  def jpeg(w: Int, h: Int, progressive: Boolean = false): Array[Byte] = {
    val soi = u8s(0xff, 0xd8)
    val app0 = u8s(0xff, 0xe0) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII") ++ u8s(0, 1, 1, 0) ++ be16(1) ++ be16(1) ++ u8s(0, 0)
    val dqt = u8s(0xff, 0xdb) ++ be16(67) ++ u8s(0) ++ Array.fill(64)(16.toByte)
    val sofMarker = if (progressive) 0xc2 else 0xc0
    val sof = u8s(0xff, sofMarker) ++ be16(11) ++ u8s(8) ++ be16(h) ++ be16(w) ++
      u8s(1, 1, 0x11, 0)
    val dht = u8s(0xff, 0xc4) ++ be16(20) ++ u8s(0) ++
      (u8s(1) ++ Array.fill(15)(0.toByte)) ++ u8s(0)
    val sos = u8s(0xff, 0xda) ++ be16(8) ++ u8s(1, 1, 0x00, 0, 63, 0)
    soi ++ app0 ++ dqt ++ sof ++ dht ++ sos ++ u8s(0x7f) ++ u8s(0xff, 0xd9)
  }

  /** The canonical 43-byte 1×1 GIF89a (2-color global table, graphic
    * control extension, one image descriptor, valid LZW stream). */
  val onePixelGif: Array[Byte] = u8s(
    0x47, 0x49, 0x46, 0x38, 0x39, 0x61, // "GIF89a"
    0x01, 0x00, 0x01, 0x00, 0x80, 0x00, 0x00, // LSD 1×1, GCT of 2
    0x00, 0x00, 0x00, 0xff, 0xff, 0xff, // global color table
    0x21, 0xf9, 0x04, 0x01, 0x00, 0x00, 0x00, 0x00, // GCE
    0x2c, 0x00, 0x00, 0x00, 0x00, 0x01, 0x00, 0x01, 0x00, 0x00, // image desc
    0x02, 0x02, 0x44, 0x01, 0x00, // LZW min 2, 2-byte block, terminator
    0x3b) // trailer

  /** Multi-frame GIF89a: `frames` image descriptors over one canvas. */
  def gif(w: Int, h: Int, frames: Int): Array[Byte] = {
    val header = "GIF89a".getBytes("US-ASCII") ++ le16(w) ++ le16(h) ++
      u8s(0x80, 0, 0) ++ u8s(0, 0, 0, 0xff, 0xff, 0xff)
    val frame = u8s(0x2c) ++ le16(0) ++ le16(0) ++ le16(w) ++ le16(h) ++
      u8s(0) ++ u8s(0x02, 0x02, 0x44, 0x01, 0x00)
    header ++ Array.fill(frames)(frame).flatten ++ u8s(0x3b)
  }

  /** PNG Paeth predictor (RFC 2083 §6.6) — shared by the fixture
    * encoder and [[PngPixelCodec]]'s decoder. */
  def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Truecolor 8-bit PNG whose PIXELS are a closed-form pattern (the
    * q202 fixture): R(x,y)=x+y+b, G(x,y)=2x+b, B(x,y)=3y+b with
    * b = docId mod 128 and w,h ≤ 16 — no byte ever wraps 255, so the
    * per-image channel sums/extrema are polynomial in (w,h,b) and the
    * DuckDB oracle states them closed-form. Row y is encoded with
    * filter type (y + docId) mod 5, so one image of height ≥ 5
    * exercises EVERY filter in the PNG spec (None/Sub/Up/Average/
    * Paeth) — a decoder that shortcuts any defilter path diverges. */
  def pixelPngFor(docId: Long): Array[Byte] = {
    val w = (1 + docId % 16).toInt
    val h = (1 + (docId * 7) % 16).toInt
    val base = (docId % 128).toInt
    val bpp = 3
    val stride = w * bpp
    val prev = new Array[Byte](stride) // zero row above the first
    val filtered = new java.io.ByteArrayOutputStream(h * (1 + stride))
    val cur = new Array[Byte](stride)
    for (y <- 0 until h) {
      var x = 0
      while (x < w) {
        cur(x * 3) = (x + y + base).toByte
        cur(x * 3 + 1) = (2 * x + base).toByte
        cur(x * 3 + 2) = (3 * y + base).toByte
        x += 1
      }
      val ft = ((y + docId) % 5).toInt
      filtered.write(ft)
      var i = 0
      while (i < stride) {
        val raw = cur(i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) & 0xff else 0
        val b = prev(i) & 0xff
        val c = if (i >= bpp) prev(i - bpp) & 0xff else 0
        val f = ft match {
          case 0 => raw
          case 1 => raw - a
          case 2 => raw - b
          case 3 => raw - ((a + b) >> 1)
          case _ => raw - paeth(a, b, c)
        }
        filtered.write(f & 0xff)
        i += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
    }
    val rawBytes = filtered.toByteArray
    val deflater = new Deflater
    deflater.setInput(rawBytes); deflater.finish()
    val buf = new Array[Byte](rawBytes.length + 64)
    val n = deflater.deflate(buf)
    deflater.end()
    val sig = u8s(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = pngChunk("IHDR", be32(w) ++ be32(h) ++ u8s(8, 2, 0, 0, 0))
    // split the deflate stream across TWO IDAT chunks when possible —
    // the spec allows it and a decoder that inflates only the first
    // chunk diverges
    val split = n / 2
    val idats =
      if (split > 0 && n - split > 0)
        pngChunk("IDAT", buf.slice(0, split)) ++
          pngChunk("IDAT", buf.slice(split, n))
      else pngChunk("IDAT", buf.take(n))
    val iend = pngChunk("IEND", Array.empty)
    sig ++ ihdr ++ idats ++ iend
  }

  /** Deterministic real-container payload for q194: doc_id picks the
    * container (0→PNG incl. APNG, 1→JPEG alternating baseline/
    * progressive, 2→multi-frame GIF) and the geometry, via the same
    * arithmetic the DuckDB oracle recomputes — so matching parsed
    * features prove the codec reads the genuine headers correctly.
    * Dimensions are kept ≤64×48 so the PNG deflate body stays tiny. */
  def payloadFor(docId: Long): Array[Byte] = {
    val w = (1 + docId % 64).toInt
    val h = (1 + (docId * 7) % 48).toInt
    (docId % 3) match {
      case 0 => png(w, h, frames = (1 + docId % 11).toInt)
      case 1 => jpeg(w, h, progressive = docId % 2 == 0)
      case _ => gif(w, h, frames = (1 + docId % 7).toInt)
    }
  }
}

package graft.multimodal

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Genuine image containers built byte-by-byte to the PUBLIC format
  * specs (PNG RFC 2083 / APNG, JPEG/JFIF ITU T.81, GIF89a) — real
  * signatures, real chunk CRCs, real deflate streams, real marker
  * segments — so [[ImageHeaderCodec]] is tested against true payload
  * bytes, not hand-waved stubs. The 1×1 GIF is the canonical 43-byte
  * file every tracking pixel on the web ships. */
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
}

class ImageHeaderCodecSpec extends SparkSpec {
  import ImageFixtures._

  private def md5hex(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("MD5").digest(b)
      .map("%02x".format(_)).mkString

  test("PNG IHDR: true width/height from real chunk bytes; APNG acTL frames") {
    val still = ImageHeaderCodec.decode("image", png(320, 200))
    assert(still === MediaFeatures(320, 200, 1, md5hex(png(320, 200))))
    val anim = ImageHeaderCodec.decode("image", png(64, 48, frames = 5))
    assert((anim.width, anim.height, anim.nFrames) === ((64, 48, 5)))
  }

  test("JPEG SOF0 and SOF2 (progressive): dims from the marker walk") {
    val base = ImageHeaderCodec.decode("image", jpeg(640, 480))
    assert((base.width, base.height, base.nFrames) === ((640, 480, 1)))
    val prog = ImageHeaderCodec.decode("image", jpeg(1920, 1080, progressive = true))
    assert((prog.width, prog.height) === ((1920, 1080)))
  }

  test("GIF: canonical 1x1 tracking pixel and multi-frame block walk") {
    val px = ImageHeaderCodec.decode("image", onePixelGif)
    assert((px.width, px.height, px.nFrames) === ((1, 1, 1)))
    val multi = ImageHeaderCodec.decode("image", gif(10, 20, frames = 3))
    assert((multi.width, multi.height, multi.nFrames) === ((10, 20, 3)))
  }

  test("non-image and corrupt payloads map to the total-decode sentinel") {
    val text = "not an image at all".getBytes("UTF-8")
    assert(ImageHeaderCodec.decode("image", text) ===
      MediaFeatures(0, 0, 0, md5hex(text)))
    // genuine signature, truncated body: must not throw (retry idempotence)
    val truncated = png(320, 200).take(20)
    val f = ImageHeaderCodec.decode("image", truncated)
    assert((f.width, f.height, f.nFrames) === ((0, 0, 0)))
    assert(ImageHeaderCodec.decode("image", Array.empty[Byte]).nFrames === 0)
    val desyncJpeg = jpeg(10, 10).take(6) ++ Array.fill(10)(0x55.toByte)
    assert(ImageHeaderCodec.decode("image", desyncJpeg).width === 0)
  }

  test("real codec through decodeFeatures: same schema, true geometry, " +
      "payload bytes stay out of the output") {
    val payloads = Seq(
      (1L, "image", png(320, 200)),
      (2L, "image", jpeg(640, 480)),
      (3L, "image", gif(10, 20, 3)),
      (4L, "image", onePixelGif),
      (5L, "image", "plain text".getBytes("UTF-8")))
    val rows = payloads.map { case (id, kind, bytes) =>
      Row(id, kind, bytes, "fixture", bytes.length.toLong)
    }
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), MultimodalOps.mediaSchema)
    val out = MultimodalOps.decodeFeatures(media, ImageHeaderCodec)
    assert(out.schema === MultimodalOps.featureSchema)
    val got = out.orderBy("media_id")
      .select("media_id", "width", "height", "n_frames")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(got.toSeq === Seq(
      (1L, 320, 200, 1), (2L, 640, 480, 1), (3L, 10, 20, 3),
      (4L, 1, 1, 1), (5L, 0, 0, 0)))
    // md5 matches an independent computation on the original payloads
    val md5s = out.orderBy("media_id").select("payload_md5")
      .collect().map(_.getString(0))
    assert(md5s.toSeq === payloads.map(p => md5hex(p._3)))
  }
}

package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** [[ImageFixtures]] (main scope since r8 — q194 builds its corpus with
  * it) provides the genuine container bytes these tests decode. */
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

  test("JPEG SOF0 and SOF2 (progressive): dims from the marker walk, " +
      "scan class from the SOFn byte (r16 ADVICE)") {
    val base = ImageHeaderCodec.decode("image", jpeg(640, 480))
    assert((base.width, base.height, base.nFrames) === ((640, 480, 1)))
    assert(base.scanType === "baseline")
    val prog = ImageHeaderCodec.decode("image", jpeg(1920, 1080, progressive = true))
    assert((prog.width, prog.height) === ((1920, 1080)))
    assert(prog.scanType === "progressive")
    // non-JPEG containers and the sentinel stay "none"
    assert(ImageHeaderCodec.decode("image", png(8, 8)).scanType === "none")
    assert(ImageHeaderCodec.decode("image",
      "junk".getBytes("UTF-8")).scanType === "none")
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

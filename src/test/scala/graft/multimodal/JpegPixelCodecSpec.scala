package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[JpegPixelCodec]] against three independent references:
  *
  *   1. closed form — DC-only fixtures decode to exactly dc + 128 per
  *     block (the q219 oracle's arithmetic), across size classes,
  *     restart intervals, and random DC patterns;
  *   2. the JDK's libjpeg-backed ImageIO decoder — random grayscale
  *     images round-tripped through ImageIO's ENCODER (standard
  *     tables, real AC coefficients, non-multiple-of-8 dimensions)
  *     must decode within the T.81 accuracy budget of ImageIO's own
  *     pixels (libjpeg uses a scaled-integer IDCT; ±2 absorbs it);
  *   3. rejection — color scans, progressive streams, and truncated
  *     data return None instead of wrong pixels.
  */
class JpegPixelCodecSpec extends AnyFunSuite {

  test("DC-only fixtures decode to exact closed-form flat blocks") {
    (0L until 64L).foreach { d =>
      val bytes = JpegFixtures.pixelJpegFor(d)
      val img = JpegPixelCodec.decodeGray(bytes)
        .getOrElse(fail(s"undecodable fixture for doc $d"))
      val wb = 1 + (d % 3).toInt
      val hb = 1 + ((d * 7) % 4).toInt
      assert(img.width === 8 * wb)
      assert(img.height === 8 * hb)
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val bi = (y / 8) * wb + (x / 8)
          val expect = ((d * 13 + 31L * bi) % 256).toInt
          val got = img.pixels(y * img.width + x) & 0xff
          assert(got === expect, s"doc $d pixel ($x,$y)")
          x += 1
        }
        y += 1
      }
    }
  }

  test("random DC patterns round-trip exactly, with and without restarts") {
    val rnd = new scala.util.Random(42)
    (0 until 20).foreach { trial =>
      val wb = 1 + rnd.nextInt(5)
      val hb = 1 + rnd.nextInt(5)
      val dcs = Array.fill(wb * hb)(rnd.nextInt(256) - 128)
      val dri = if (trial % 2 == 0) 0 else 1 + rnd.nextInt(4)
      val bytes = JpegFixtures.encodeDcOnlyGray(8 * wb, 8 * hb, dcs(_), dri)
      val img = JpegPixelCodec.decodeGray(bytes)
        .getOrElse(fail(s"undecodable (trial $trial, dri $dri)"))
      (0 until wb * hb).foreach { bi =>
        val got = img.pixels((bi / wb) * 8 * img.width + (bi % wb) * 8) & 0xff
        assert(got === dcs(bi) + 128, s"trial $trial block $bi (dri $dri)")
      }
    }
  }

  test("general AC streams match ImageIO within the T.81 budget") {
    val rnd = new scala.util.Random(7)
    // non-multiple-of-8 dims exercise SOF-dims trim on edge blocks
    Seq((24, 24), (17, 13), (40, 9), (8, 8)).foreach { case (w, h) =>
      val src = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val v = rnd.nextInt(256)
          src.getRaster.setSample(x, y, 0, v)
        }
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(src, "jpg", bos))
      val bytes = bos.toByteArray
      val ours = JpegPixelCodec.decodeGray(bytes)
        .getOrElse(fail(s"undecodable ImageIO jpeg ${w}x$h"))
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(ours.width === w && ours.height === h)
      var worst = 0
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val a = ours.pixels(y * w + x) & 0xff
          val b = ref.getRaster.getSample(x, y, 0)
          worst = math.max(worst, math.abs(a - b))
        }
      }
      assert(worst <= 2,
        s"${w}x$h: worst per-pixel delta $worst vs ImageIO (budget 2)")
    }
  }

  test("color streams gray-reject; progressive and truncated streams are " +
      "rejected, not misdecoded") {
    // a 3-component scan is not a GRAYSCALE image — decodeGray refuses
    val color = JpegFixtures.colorJpegFor(9L)
    assert(JpegPixelCodec.decodeGray(color).isEmpty)
    // truncated entropy data
    val ok = JpegFixtures.pixelJpegFor(5L)
    assert(JpegPixelCodec.decodeGray(ok.dropRight(8)).isEmpty)
    assert(JpegPixelCodec.decodeRgb(ok.dropRight(8)).isEmpty)
    // a BASELINE-shaped scan mislabeled SOF2 is invalid progressive
    // (its SOS says Ss=0, Se=63 — a progressive DC scan carries only
    // coefficient 0) — rejected, not misdecoded
    val prog = ok.clone()
    val sofAt = prog.indices.dropRight(1).find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(JpegPixelCodec.decodeGray(prog).isEmpty)
    // not a JPEG at all
    assert(JpegPixelCodec.decodeGray(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("PROGRESSIVE streams decode (r17): three-scan SOF2 fixtures " +
      "(DC first pass at Al=1, DC refinement, EOBn-run AC scan) yield " +
      "pixels IDENTICAL to their baseline twins; truncation rejects") {
    for (docId <- Seq(0L, 1L, 2L, 5L, 7L, 11L, 13L)) {
      val base = JpegPixelCodec
        .decodeGray(JpegFixtures.pixelJpegFor(docId)).get
      val prog = JpegPixelCodec
        .decodeGray(JpegFixtures.progressivePixelJpegFor(docId)).get
      assert((prog.width, prog.height) === ((base.width, base.height)))
      assert(prog.pixels.toSeq === base.pixels.toSeq,
        s"doc $docId progressive != baseline")
    }
    // truncated mid-scan: total rejection, never a partial image
    val p = JpegFixtures.progressivePixelJpegFor(5L)
    assert(JpegPixelCodec.decodeGray(p.dropRight(6)).isEmpty)
  }

  test("ImageIO-written PROGRESSIVE streams (the JDK's default scan " +
      "script, including AC successive-approximation REFINEMENT scans) " +
      "decode within the T.81 budget") {
    val rnd = new scala.util.Random(11)
    Seq((24, 24), (17, 13), (8, 8), (40, 9)).foreach { case (w, h) =>
      val src = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          src.getRaster.setSample(x, y, 0, rnd.nextInt(256))
        }
      }
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(src, null, null), param)
      writer.dispose(); ios.close()
      val bytes = bos.toByteArray
      // it must ACTUALLY be SOF2, or this test pins nothing
      assert(bytes.indices.dropRight(1).exists(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc2),
        "ImageIO did not produce a progressive stream")
      val ours = JpegPixelCodec.decodeGray(bytes)
        .getOrElse(fail(s"undecodable progressive jpeg ${w}x$h"))
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(ours.width === w && ours.height === h)
      var worst = 0
      (0 until h).foreach { y =>
        (0 until w).foreach { x =>
          val a = ours.pixels(y * w + x) & 0xff
          val b = ref.getRaster.getSample(x, y, 0)
          worst = math.max(worst, math.abs(a - b))
        }
      }
      assert(worst <= 2,
        s"${w}x$h progressive: worst per-pixel delta $worst vs ImageIO")
    }
  }

  test("COLOR progressive (4:2:0 SOF2, interleaved DC scan + " +
      "per-component AC scans) decodes pixel-identical to the " +
      "baseline color twin") {
    for (docId <- Seq(0L, 1L, 2L, 3L, 6L, 9L)) {
      val base = JpegPixelCodec
        .decodeRgb(JpegFixtures.colorJpegFor(docId)).get
      val prog = JpegPixelCodec
        .decodeRgb(JpegFixtures.progressiveColorJpegFor(docId)).get
      assert((prog.width, prog.height) === ((base.width, base.height)))
      assert(prog.pixels.toSeq === base.pixels.toSeq,
        s"doc $docId color progressive != baseline")
    }
  }

  test("0xFF fill bytes before markers parse; a stream cut at a bare " +
      "trailing 0xFF rejects") {
    // T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker.
    // Pad the first post-SOI marker with two and expect identical pixels.
    val ok = JpegFixtures.pixelJpegFor(5L)
    val ref = JpegPixelCodec.decodeGray(ok)
      .getOrElse(fail("baseline fixture undecodable"))
    val padded = (ok.take(2) :+ 0xff.toByte :+ 0xff.toByte) ++ ok.drop(2)
    val got = JpegPixelCodec.decodeGray(padded)
      .getOrElse(fail("legally fill-padded stream rejected"))
    assert(got.width === ref.width && got.height === ref.height)
    assert(java.util.Arrays.equals(got.pixels, ref.pixels))

    // a buffer whose FINAL byte is 0xFF mid-entropy (the truncated half
    // of a stuffed FF00 pair) must reject, not decode the 0xFF as data.
    // Hunt the random-DC fixture space for a stream with a stuffed pair
    // inside its entropy segment and cut right after the 0xFF.
    val rnd = new scala.util.Random(11)
    val cutStream = Iterator.continually {
      // ImageIO-encoded random noise: real AC coefficients make a
      // stuffed FF00 pair near-certain (DC-only fixtures never emit one)
      val w = 8 + rnd.nextInt(32)
      val h = 8 + rnd.nextInt(32)
      val src = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      (0 until h).foreach(y => (0 until w).foreach(x =>
        src.getRaster.setSample(x, y, 0, rnd.nextInt(256))))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(src, "jpg", bos)
      bos.toByteArray
    }.take(200).flatMap { b =>
      val sos = b.indices.dropRight(1).find(i =>
        (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xda).get
      val entStart = sos + 2 + (((b(sos + 2) & 0xff) << 8) | (b(sos + 3) & 0xff))
      (entStart until b.length - 2).find(j =>
        (b(j) & 0xff) == 0xff && b(j + 1) == 0).map(j => b.take(j + 1))
    }.take(1).toSeq
    assert(cutStream.nonEmpty,
      "no fixture with a stuffed FF00 pair found in 200 trials")
    assert(JpegPixelCodec.decodeGray(cutStream.head).isEmpty,
      "stream ending in a bare 0xFF must reject, not decode it as entropy")
  }

  test("4:2:0 color DC-only fixtures decode to exact closed-form flat blocks") {
    (0L until 64L).foreach { d =>
      val img = JpegPixelCodec.decodeRgb(JpegFixtures.colorJpegFor(d))
        .getOrElse(fail(s"undecodable color fixture for doc $d"))
      val (wm, hm) = JpegFixtures.colorGeom(d)
      assert(img.width === 16 * wm)
      assert(img.height === 16 * hm)
      def expect(x: Int, y: Int): (Int, Int, Int) = {
        val mi = (y / 16) * wm + (x / 16)
        val ybi = mi * 4 + ((y % 16) / 8) * 2 + ((x % 16) / 8)
        val yv = JpegFixtures.colorY(d, ybi).toDouble
        val cb = JpegFixtures.colorCb(d, mi) - 128.0
        val cr = JpegFixtures.colorCr(d, mi) - 128.0
        def cl(v: Double): Int =
          math.min(255, math.max(0, math.round(v).toInt))
        (cl(yv + 1.402 * cr),
          cl(yv - 0.344136 * cb - 0.714136 * cr),
          cl(yv + 1.772 * cb))
      }
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val o = (y * img.width + x) * 3
          val got = (img.pixels(o) & 0xff, img.pixels(o + 1) & 0xff,
            img.pixels(o + 2) & 0xff)
          assert(got === expect(x, y), s"doc $d pixel ($x,$y)")
          x += 1
        }
        y += 1
      }
    }
  }

  test("4:2:2 and 4:4:0 DC-only fixtures decode to exact closed-form " +
      "flat blocks") {
    def cl(v: Double): Int = math.min(255, math.max(0, math.round(v).toInt))
    (0L until 64L).foreach { d =>
      // horizontal 4:2:2 — MCU 16x8, Y blocks side by side
      val img = JpegPixelCodec.decodeRgb(JpegFixtures.color422JpegFor(d))
        .getOrElse(fail(s"undecodable 4:2:2 fixture for doc $d"))
      val (wm, hm) = JpegFixtures.color422Geom(d)
      assert(img.width === 16 * wm)
      assert(img.height === 8 * hm)
      def expect(x: Int, y: Int): (Int, Int, Int) = {
        val mi = (y / 8) * wm + (x / 16)
        val ybi = mi * 2 + (x % 16) / 8
        val yv = JpegFixtures.c422Y(d, ybi).toDouble
        val cb = JpegFixtures.c422Cb(d, mi) - 128.0
        val cr = JpegFixtures.c422Cr(d, mi) - 128.0
        (cl(yv + 1.402 * cr), cl(yv - 0.344136 * cb - 0.714136 * cr),
          cl(yv + 1.772 * cb))
      }
      var y = 0
      while (y < img.height) {
        var x = 0
        while (x < img.width) {
          val o = (y * img.width + x) * 3
          val got = (img.pixels(o) & 0xff, img.pixels(o + 1) & 0xff,
            img.pixels(o + 2) & 0xff)
          assert(got === expect(x, y), s"doc $d 4:2:2 pixel ($x,$y)")
          x += 1
        }
        y += 1
      }
      // vertical 4:4:0 transpose — MCU 8x16, Y blocks stacked
      val imgV = JpegPixelCodec.decodeRgb(
        JpegFixtures.encodeDcOnlyColor422(wm, hm,
          ybi => JpegFixtures.c422Y(d, ybi) - 128,
          mi => JpegFixtures.c422Cb(d, mi) - 128,
          mi => JpegFixtures.c422Cr(d, mi) - 128, vertical = true))
        .getOrElse(fail(s"undecodable 4:4:0 fixture for doc $d"))
      assert(imgV.width === 8 * wm)
      assert(imgV.height === 16 * hm)
      def expectV(x: Int, y: Int): (Int, Int, Int) = {
        val mi = (y / 16) * wm + (x / 8)
        val ybi = mi * 2 + (y % 16) / 8
        val yv = JpegFixtures.c422Y(d, ybi).toDouble
        val cb = JpegFixtures.c422Cb(d, mi) - 128.0
        val cr = JpegFixtures.c422Cr(d, mi) - 128.0
        (cl(yv + 1.402 * cr), cl(yv - 0.344136 * cb - 0.714136 * cr),
          cl(yv + 1.772 * cb))
      }
      (0 until imgV.height).foreach { y =>
        (0 until imgV.width).foreach { x =>
          val o = (y * imgV.width + x) * 3
          val got = (imgV.pixels(o) & 0xff, imgV.pixels(o + 1) & 0xff,
            imgV.pixels(o + 2) & 0xff)
          assert(got === expectV(x, y), s"doc $d 4:4:0 pixel ($x,$y)")
        }
      }
    }
  }

  test("ImageIO decodes our encoded 4:2:2 streams to the same flat colors") {
    // single-MCU images for the same fancy-upsampling reason as the
    // 4:2:0 ImageIO test below
    (0L until 16L).foreach { d =>
      val bytes = JpegFixtures.encodeDcOnlyColor422(1, 1,
        ybi => JpegFixtures.c422Y(d, ybi) - 128,
        mi => JpegFixtures.c422Cb(d, mi) - 128,
        mi => JpegFixtures.c422Cr(d, mi) - 128)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"ImageIO rejected our 4:2:2 stream for doc $d")
      val ours = JpegPixelCodec.decodeRgb(bytes)
        .getOrElse(fail(s"our decoder rejected 4:2:2 doc $d"))
      assert(ours.width === ref.getWidth && ours.height === ref.getHeight)
      var worst = 0
      (0 until ours.height).foreach { y =>
        (0 until ours.width).foreach { x =>
          val rgb = ref.getRGB(x, y)
          val o = (y * ours.width + x) * 3
          worst = math.max(worst, math.abs(
            (ours.pixels(o) & 0xff) - ((rgb >> 16) & 0xff)))
          worst = math.max(worst, math.abs(
            (ours.pixels(o + 1) & 0xff) - ((rgb >> 8) & 0xff)))
          worst = math.max(worst, math.abs(
            (ours.pixels(o + 2) & 0xff) - (rgb & 0xff)))
        }
      }
      assert(worst <= 2, s"doc $d: worst 4:2:2 delta $worst vs ImageIO")
    }
  }

  test("ImageIO decodes our PROGRESSIVE gray and color fixture streams " +
      "(encoder legality check: a third-party decoder accepts the " +
      "multi-scan layout and agrees on the pixels)") {
    // gray: DC-only progressive == exact closed form, ImageIO-exact
    for (d <- Seq(0L, 5L, 13L)) {
      val bytes = JpegFixtures.progressivePixelJpegFor(d)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"ImageIO rejected our progressive stream $d")
      val ours = JpegPixelCodec.decodeGray(bytes).get
      assert(ref.getWidth === ours.width && ref.getHeight === ours.height)
      (0 until ours.height).foreach { y =>
        (0 until ours.width).foreach { x =>
          assert(math.abs(ref.getRaster.getSample(x, y, 0) -
            (ours.pixels(y * ours.width + x) & 0xff)) <= 1,
            s"doc $d progressive ($x,$y)")
        }
      }
    }
    // color: single-MCU (filter-free) progressive, flat colors
    for (d <- Seq(1L, 7L)) {
      val bytes = JpegFixtures.encodeDcOnlyColor420Progressive(1, 1,
        ybi => JpegFixtures.colorY(d, ybi) - 128,
        mi => JpegFixtures.colorCb(d, mi) - 128,
        mi => JpegFixtures.colorCr(d, mi) - 128)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"ImageIO rejected progressive color $d")
      val ours = JpegPixelCodec.decodeRgb(bytes).get
      var worst = 0
      (0 until ours.height).foreach { y =>
        (0 until ours.width).foreach { x =>
          val rgb = ref.getRGB(x, y)
          val o = (y * ours.width + x) * 3
          worst = math.max(worst, math.abs(((rgb >> 16) & 0xff) -
            (ours.pixels(o) & 0xff)))
          worst = math.max(worst, math.abs(((rgb >> 8) & 0xff) -
            (ours.pixels(o + 1) & 0xff)))
          worst = math.max(worst, math.abs((rgb & 0xff) -
            (ours.pixels(o + 2) & 0xff)))
        }
      }
      assert(worst <= 2, s"color progressive doc $d: worst $worst")
    }
  }

  test("ImageIO decodes our encoded color streams to the same flat colors") {
    // single-MCU images: libjpeg's fancy chroma upsampling interpolates
    // across MCU boundaries, so only the one-MCU case is filter-free;
    // multi-MCU exactness is pinned by the closed form above under the
    // documented nearest-replication contract
    (0L until 16L).foreach { d =>
      val wm = 1; val hm = 1
      val bytes = JpegFixtures.encodeDcOnlyColor420(wm, hm,
        ybi => JpegFixtures.colorY(d, ybi) - 128,
        mi => JpegFixtures.colorCb(d, mi) - 128,
        mi => JpegFixtures.colorCr(d, mi) - 128)
      val ref = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(ref != null, s"ImageIO rejected our color stream (doc $d)")
      val ours = JpegPixelCodec.decodeRgb(bytes).get
      assert(ref.getWidth === ours.width && ref.getHeight === ours.height)
      var worst = 0
      (0 until ours.height).foreach { y =>
        (0 until ours.width).foreach { x =>
          val rgb = ref.getRGB(x, y)
          val o = (y * ours.width + x) * 3
          worst = math.max(worst, math.abs(((rgb >> 16) & 0xff) -
            (ours.pixels(o) & 0xff)))
          worst = math.max(worst, math.abs(((rgb >> 8) & 0xff) -
            (ours.pixels(o + 1) & 0xff)))
          worst = math.max(worst, math.abs((rgb & 0xff) -
            (ours.pixels(o + 2) & 0xff)))
        }
      }
      assert(worst <= 2, s"doc $d: worst channel delta $worst vs ImageIO")
    }
  }

  test("ImageIO color jpegs (4:2:0, standard tables) decode with sane dims " +
      "and interior-exact chroma-flat regions") {
    // general validation that the interleaved-MCU walk handles real
    // libjpeg output: encode a color image that is FLAT (one color), so
    // subsampling and upsampling are filter-invariant everywhere
    val src = new java.awt.image.BufferedImage(
      40, 24, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val g2 = src.createGraphics()
    g2.setColor(new java.awt.Color(120, 200, 64))
    g2.fillRect(0, 0, 40, 24)
    g2.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "jpg", bos))
    val bytes = bos.toByteArray
    val ours = JpegPixelCodec.decodeRgb(bytes)
      .getOrElse(fail("undecodable ImageIO color jpeg"))
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(ours.width === 40 && ours.height === 24)
    var worst = 0
    (0 until 24).foreach { y =>
      (0 until 40).foreach { x =>
        val rgb = ref.getRGB(x, y)
        val o = (y * 40 + x) * 3
        worst = math.max(worst, math.abs(((rgb >> 16) & 0xff) - (ours.pixels(o) & 0xff)))
        worst = math.max(worst, math.abs(((rgb >> 8) & 0xff) - (ours.pixels(o + 1) & 0xff)))
        worst = math.max(worst, math.abs((rgb & 0xff) - (ours.pixels(o + 2) & 0xff)))
      }
    }
    assert(worst <= 2, s"flat color image: worst channel delta $worst")
  }
}

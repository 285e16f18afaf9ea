package graft.multimodal

/** Baseline JPEG pixel decoder (ITU-T T.81 sequential DCT, Huffman,
  * single component / grayscale), written from scratch for the q219
  * pixel-stats gate — the JPEG rung of the pixel ladder q202 built for
  * PNG (reference capability: media columns decoded IN the engine,
  * never driver-side).
  *
  * Implements the full baseline path, not just what the fixtures emit:
  * generic canonical Huffman tables from DHT (any BITS/HUFFVAL), 8-bit
  * DQT in zigzag order, DC prediction + ones-complement value
  * extension, AC run-length/ZRL/EOB, entropy-stream 0xFF00 byte
  * unstuffing, DRI/RSTn restart intervals with predictor reset, double
  * precision IDCT with level shift and clamp, and edge-block trimming
  * for dimensions that are not multiples of 8. Color scans (3
  * components, chroma subsampling) are an explicit boundary — see
  * COVERAGE.md — [[decodeGray]] returns None for them, as it does for
  * arithmetic-coded streams. PROGRESSIVE (SOF2) streams decode since
  * r17: multi-scan coefficient accumulation with DC successive
  * approximation (first pass + refinement bits), single-component
  * spectral-selection AC first passes with EOBRUN, and AC
  * successive-approximation REFINEMENT scans (T.81 G.1.2.3 correction
  * bits — pinned against ImageIO's default progressive scan script).
  *
  * JpegPixelCodecSpec pins DC-only streams bit-exactly against closed
  * forms and general AC streams against the JDK's libjpeg-backed
  * ImageIO decoder within the T.81 accuracy budget.
  */
object JpegPixelCodec {

  final case class Gray(width: Int, height: Int, pixels: Array[Byte])

  /** Zigzag index -> natural (row-major) index. */
  private[multimodal] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63)

  /** cosTable(x)(u) = C(u)/2 * cos((2x+1) u pi / 16) — the separable
    * half of (1/4) C(u) C(v) in the T.81 IDCT. */
  private val CosT: Array[Array[Double]] = Array.tabulate(8, 8) { (x, u) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    c / 2.0 * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    // canonical code assembly (T.81 C.2): mincode/maxcode/valptr per length
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) > 0) {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + (code - minCode(len))) & 0xff
  }

  /** Entropy-segment bit reader: unstuffs 0xFF00, stops at any other
    * marker (restart markers are consumed explicitly by the caller). */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0

    def atMarker: Boolean =
      pos + 1 < b.length && (b(pos) & 0xff) == 0xff && b(pos + 1) != 0

    /** Consume an expected RSTn marker and reset bit state. */
    def consumeRestart(): Boolean = {
      nbits = 0; acc = 0
      if (pos + 1 < b.length && (b(pos) & 0xff) == 0xff &&
          (b(pos + 1) & 0xf8) == 0xd0) { pos += 2; true }
      else false
    }

    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length || atMarker)
          throw new IllegalStateException("entropy data exhausted")
        val v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          // the stuffed 0x00 must actually exist: a 0xFF that ends the
          // buffer is a truncated stream, not an entropy byte
          if (pos >= b.length)
            throw new IllegalStateException("entropy data exhausted")
          pos += 1 // stuffed 0x00
        }
        acc = v
        nbits = 8
      }
      nbits -= 1
      (acc >> nbits) & 1
    }

    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }

    def decode(t: HuffTable): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (code <= t.maxCode(l)) return t.value(l, code)
        code = (code << 1) | bit()
        l += 1
      }
      throw new IllegalStateException("invalid Huffman code")
    }
  }

  /** T.81 F.2.2.1 EXTEND: map an s-bit ones-complement magnitude to a
    * signed coefficient. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  private def u16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  final case class Rgb(width: Int, height: Int, pixels: Array[Byte])

  /** One frame component: id, sampling factors, quant-table id, and the
    * scan's DC/AC Huffman table ids. */
  private final case class Comp(id: Int, hs: Int, vs: Int, tq: Int,
      var td: Int = 0, var ta: Int = 0)

  /** Decoded component planes at their NATIVE (subsampled) resolution,
    * plus the frame geometry needed to sample them. */
  private final case class Planes(w: Int, h: Int, comps: Seq[Comp],
      data: Seq[Array[Int]], planeW: Seq[Int])

  /** JFIF YCbCr → RGB. The oracle mirrors these literals and the
    * FLOOR(x + 0.5) rounding exactly (Math.round semantics). */
  private def clamp255(x: Double): Int = {
    val v = math.round(x).toInt
    if (v < 0) 0 else if (v > 255) 255 else v
  }

  def decodeGray(b: Array[Byte]): Option[Gray] =
    decodePlanes(b).flatMap { p =>
      if (p.comps.length != 1) None
      else {
        val out = new Array[Byte](p.w * p.h)
        val pw = p.planeW.head
        val plane = p.data.head
        var y = 0
        while (y < p.h) {
          var x = 0
          while (x < p.w) {
            out(y * p.w + x) = plane(y * pw + x).toByte
            x += 1
          }
          y += 1
        }
        Some(Gray(p.w, p.h, out))
      }
    }

  /** Color decode (3-component YCbCr, 4:4:4 or 4:2:0): interleaved-MCU
    * entropy decode per T.81 A.2.3, chroma replicated to full
    * resolution, JFIF color conversion. Returns pixels as 3
    * bytes/pixel RGB. Grayscale streams also decode (R=G=B=Y). */
  def decodeRgb(b: Array[Byte]): Option[Rgb] =
    decodePlanes(b).flatMap { p =>
      val out = new Array[Byte](p.w * p.h * 3)
      if (p.comps.length == 1) {
        val pw = p.planeW.head
        val plane = p.data.head
        var y = 0
        while (y < p.h) {
          var x = 0
          while (x < p.w) {
            val v = plane(y * pw + x).toByte
            val o = (y * p.w + x) * 3
            out(o) = v; out(o + 1) = v; out(o + 2) = v
            x += 1
          }
          y += 1
        }
        Some(Rgb(p.w, p.h, out))
      } else {
        val hmax = p.comps.map(_.hs).max
        val vmax = p.comps.map(_.vs).max
        def sample(ci: Int, x: Int, y: Int): Int = {
          val c = p.comps(ci)
          // nearest-neighbor chroma replication (h/v scale divides hmax)
          val sx = x * c.hs / hmax
          val sy = y * c.vs / vmax
          p.data(ci)(sy * p.planeW(ci) + sx)
        }
        var y = 0
        while (y < p.h) {
          var x = 0
          while (x < p.w) {
            val yy = sample(0, x, y).toDouble
            val cb = sample(1, x, y).toDouble - 128.0
            val cr = sample(2, x, y).toDouble - 128.0
            val o = (y * p.w + x) * 3
            out(o) = clamp255(yy + 1.402 * cr).toByte
            out(o + 1) = clamp255(yy - 0.344136 * cb - 0.714136 * cr).toByte
            out(o + 2) = clamp255(yy + 1.772 * cb).toByte
            x += 1
          }
          y += 1
        }
        Some(Rgb(p.w, p.h, out))
      }
    }

  private def decodePlanes(b: Array[Byte]): Option[Planes] = try {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      return None
    var pos = 2
    val qt = scala.collection.mutable.Map[Int, Array[Int]]()
    val dcT = scala.collection.mutable.Map[Int, HuffTable]()
    val acT = scala.collection.mutable.Map[Int, HuffTable]()
    var w = 0
    var h = 0
    var comps: Seq[Comp] = Nil
    var dri = 0
    var progressive = false

    def parseSof(seg: Int): Boolean = {
      if ((b(seg) & 0xff) != 8) return false
      h = u16(b, seg + 1)
      w = u16(b, seg + 3)
      val ncomp = b(seg + 5) & 0xff
      if (ncomp != 1 && ncomp != 3) return false
      comps = (0 until ncomp).map { i =>
        val o = seg + 6 + 3 * i
        Comp(b(o) & 0xff, (b(o + 1) & 0xf0) >> 4, b(o + 1) & 0x0f,
          b(o + 2) & 0xff)
      }
      // supported samplings: single comp 1x1; 3-component with 1x1
      // chroma and luma 1x1 (4:4:4), 2x2 (4:2:0), 2x1 (4:2:2), or
      // 1x2 (4:4:0) — the interleaved-MCU machinery below is
      // generic over (hs, vs), so these all share one code path.
      // Exotic factors (3x1, chroma > 1) stay a loud boundary.
      if (ncomp == 1) comps.head.hs == 1 && comps.head.vs == 1
      else comps.tail.forall(c => c.hs == 1 && c.vs == 1) &&
        Set((1, 1), (2, 2), (2, 1), (1, 2))
          .contains((comps.head.hs, comps.head.vs))
    }

    while (pos + 4 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      // T.81 B.1.1.2: markers may be preceded by any number of 0xFF
      // fill bytes — skip them so a legally padded stream parses
      while (pos + 4 <= b.length && (b(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 4 > b.length) return None
      val m = b(pos + 1) & 0xff
      if (m == 0xd9) return None // EOI before SOS
      val len = u16(b, pos + 2)
      val seg = pos + 4
      m match {
        case 0xdb => // DQT (possibly several tables)
          var p = seg
          while (p < seg + len - 2) {
            val pq = (b(p) & 0xf0) >> 4
            val tq = b(p) & 0x0f
            if (pq != 0) return None // 16-bit tables: not baseline
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(Zigzag(i)) = b(p + 1 + i) & 0xff; i += 1 }
            qt(tq) = t
            p += 65
          }
        case 0xc4 => // DHT (possibly several tables)
          var p = seg
          while (p < seg + len - 2) {
            val tc = (b(p) & 0xf0) >> 4
            val th = b(p) & 0x0f
            val bits = Array.tabulate(16)(i => b(p + 1 + i) & 0xff)
            val n = bits.sum
            val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + n)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
            p += 17 + n
          }
        case 0xc0 => // SOF0 baseline
          if (!parseSof(seg)) return None
        case 0xc2 => // SOF2 progressive (r16 verdict residual #2)
          if (!parseSof(seg)) return None
          progressive = true
        case x if x >= 0xc1 && x <= 0xcf && x != 0xc4 && x != 0xc8 && x != 0xcc =>
          return None // extended / lossless / arithmetic: unsupported
        case 0xdd => dri = u16(b, seg)
        case 0xda if progressive =>
          // the progressive driver owns the rest of the marker walk
          // (scans interleave with DHT/DQT/DRI segments until EOI)
          if (comps.isEmpty || w <= 0 || h <= 0) return None
          return decodeProgressiveScans(b, pos, w, h, comps, dcT, acT,
            qt, dri)
        case 0xda => // SOS — entropy data follows
          if (comps.isEmpty || w <= 0 || h <= 0) return None
          val ns = b(seg) & 0xff
          if (ns != comps.length) return None // single interleaved scan only
          (0 until ns).foreach { i =>
            val cs = b(seg + 1 + 2 * i) & 0xff
            val c = comps.find(_.id == cs).getOrElse(return None)
            c.td = (b(seg + 2 + 2 * i) & 0xf0) >> 4
            c.ta = b(seg + 2 + 2 * i) & 0x0f
          }
          return decodeScan(b, seg + len - 2, w, h, comps, dcT.toMap,
            acT.toMap, qt.toMap, dri)
        case _ => () // APPn / COM / others: skip
      }
      pos = pos + 2 + len
    }
    None
  } catch { case _: IllegalStateException | _: ArrayIndexOutOfBoundsException =>
    None
  }

  /** Progressive (SOF2) scan driver: owns the marker walk from the
    * first SOS to EOI, folding every scan into per-block COEFFICIENT
    * buffers (dequantize + IDCT happen once, at EOI — coefficients
    * accumulate across scans, successive-approximation shifts
    * included). Supports DC scans (first pass at any Al, plus Ah>0
    * refinement bits), single-component spectral-selection AC first
    * passes with EOBRUN/ZRL, AC refinement passes (correction bits per
    * T.81 G.1.2.3), DHT/DQT/DRI segments between scans, and restart
    * intervals. */
  private def decodeProgressiveScans(b: Array[Byte], sosPos: Int, w: Int,
      h: Int, comps: Seq[Comp],
      dcT: scala.collection.mutable.Map[Int, HuffTable],
      acT: scala.collection.mutable.Map[Int, HuffTable],
      qt: scala.collection.mutable.Map[Int, Array[Int]],
      dri0: Int): Option[Planes] = {
    val hmax = comps.map(_.hs).max
    val vmax = comps.map(_.vs).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // storage grids are interleaved-MCU padded (same layout the final
    // IDCT pass and the baseline path use)
    val blocksW = comps.map(c => mcusX * c.hs)
    val blocksH = comps.map(c => mcusY * c.vs)
    // raw coefficients in NATURAL order, per block, accumulated scans
    val coefs = comps.indices.map(i =>
      new Array[Int](blocksW(i) * blocksH(i) * 64))
    var dri = dri0
    var pos = sosPos
    var sawScan = false

    def finish(): Option[Planes] = {
      if (!sawScan) return None
      val planeW = comps.map(c => mcusX * c.hs * 8)
      val planes = comps.zipWithIndex.map { case (c, i) =>
        new Array[Int](planeW(i) * mcusY * c.vs * 8)
      }
      val block = new Array[Int](64)
      var ci = 0
      while (ci < comps.length) {
        val q = qt.getOrElse(comps(ci).tq, return None)
        val bw = blocksW(ci)
        var bi = 0
        while (bi < bw * blocksH(ci)) {
          var k = 0
          while (k < 64) { block(k) = coefs(ci)(bi * 64 + k) * q(k); k += 1 }
          idctBlock(block, planes(ci), planeW(ci), bi % bw, bi / bw)
          bi += 1
        }
        ci += 1
      }
      Some(Planes(w, h, comps, planes, planeW))
    }

    /** One scan's entropy data; returns the byte position AFTER it. */
    def scanEntropy(seg: Int, len: Int): Option[Int] = {
      val ns = b(seg) & 0xff
      if (ns < 1 || ns > comps.length) return None
      val scomps = (0 until ns).map { i =>
        val cs = b(seg + 1 + 2 * i) & 0xff
        val ci = comps.indexWhere(_.id == cs)
        if (ci < 0) return None
        comps(ci).td = (b(seg + 2 + 2 * i) & 0xf0) >> 4
        comps(ci).ta = b(seg + 2 + 2 * i) & 0x0f
        ci
      }
      val ss = b(seg + 1 + 2 * ns) & 0xff
      val se = b(seg + 2 + 2 * ns) & 0xff
      val ahal = b(seg + 3 + 2 * ns) & 0xff
      val ah = ahal >> 4
      val al = ahal & 15
      val r = new BitReader(b, seg + len - 2)
      val pred = new Array[Int](comps.length)
      var eobrun = 0
      var unit = 0 // MCU (interleaved) or block (single-comp) counter

      def maybeRestart(): Boolean = {
        if (dri > 0 && unit > 0 && unit % dri == 0) {
          if (!r.consumeRestart()) return false
          java.util.Arrays.fill(pred, 0)
          eobrun = 0
        }
        true
      }

      def dcBlock(ci: Int, storeIdx: Int): Boolean = {
        if (ah == 0) {
          val s = r.decode(dcT.getOrElse(comps(ci).td, return false))
          pred(ci) += extend(r.bits(s), s)
          coefs(ci)(storeIdx * 64) = pred(ci) << al
        } else {
          // successive-approximation refinement: one raw bit
          if (r.bit() != 0) coefs(ci)(storeIdx * 64) |= (1 << al)
        }
        true
      }

      if (ss == 0) {
        if (se != 0) return None // DC scans carry only coefficient 0
        if (ns > 1) {
          // interleaved DC scan in MCU order
          var my = 0
          while (my < mcusY) {
            var mx = 0
            while (mx < mcusX) {
              if (!maybeRestart()) return None
              var i = 0
              while (i < ns) {
                val ci = scomps(i)
                val c = comps(ci)
                var bv = 0
                while (bv < c.vs) {
                  var bh = 0
                  while (bh < c.hs) {
                    val idx = (my * c.vs + bv) * blocksW(ci) + mx * c.hs + bh
                    if (!dcBlock(ci, idx)) return None
                    bh += 1
                  }
                  bv += 1
                }
                i += 1
              }
              unit += 1
              mx += 1
            }
            my += 1
          }
        } else {
          // non-interleaved DC scan over the component's own grid
          val ci = scomps.head
          val c = comps(ci)
          val bw = (((w * c.hs + hmax - 1) / hmax) + 7) / 8
          val bh = (((h * c.vs + vmax - 1) / vmax) + 7) / 8
          var by = 0
          while (by < bh) {
            var bx = 0
            while (bx < bw) {
              if (!maybeRestart()) return None
              if (!dcBlock(ci, by * blocksW(ci) + bx)) return None
              unit += 1
              bx += 1
            }
            by += 1
          }
        }
      } else {
        // AC scan: T.81 restricts these to ONE component
        if (ns != 1 || se < ss || se > 63) return None
        val ci = scomps.head
        val c = comps(ci)
        val ac = acT.getOrElse(c.ta, return None)
        val bw = (((w * c.hs + hmax - 1) / hmax) + 7) / 8
        val bh = (((h * c.vs + vmax - 1) / vmax) + 7) / 8
        val p1 = 1 << al
        val m1 = -1 << al
        var by = 0
        while (by < bh) {
          var bx = 0
          while (bx < bw) {
            if (!maybeRestart()) return None
            val base = (by * blocksW(ci) + bx) * 64
            if (ah == 0) {
              // FIRST pass over this spectral band
              if (eobrun > 0) eobrun -= 1
              else {
                var k = ss
                while (k <= se) {
                  val rs = r.decode(ac)
                  val run = rs >> 4
                  val size = rs & 15
                  if (size == 0) {
                    if (run < 15) { // EOBn: run length 2^run + ext bits
                      eobrun = (1 << run) - 1 +
                        (if (run > 0) r.bits(run) else 0)
                      k = se + 1
                    } else k += 16 // ZRL
                  } else {
                    k += run
                    if (k > se) return None
                    coefs(ci)(base + Zigzag(k)) =
                      extend(r.bits(size), size) << al
                    k += 1
                  }
                }
              }
            } else {
              // REFINEMENT pass (T.81 G.1.2.3): the traversal crosses
              // already-nonzero coefficients handing each a correction
              // bit; the RUN counts only zero-history positions, whose
              // run-th one may receive a new ±(1<<Al). An EOBn leaves
              // the remaining nonzeros of the CURRENT block to the
              // end-of-band sweep below (and eobrun covers this block).
              var k = ss
              if (eobrun == 0) {
                var atEob = false
                while (!atEob && k <= se) {
                  val rs = r.decode(ac)
                  var run = rs >> 4
                  var sval = rs & 15
                  if (sval != 0) {
                    if (sval != 1) return None // only ±1 appears here
                    sval = if (r.bit() == 1) p1 else m1
                  } else if (run != 15) { // EOBn (ZRL keeps sval == 0)
                    eobrun = (1 << run) +
                      (if (run > 0) r.bits(run) else 0)
                    atEob = true
                  }
                  if (!atEob) {
                    var break2 = false
                    while (!break2 && k <= se) {
                      val idx = base + Zigzag(k)
                      if (coefs(ci)(idx) != 0) {
                        if (r.bit() == 1 && (coefs(ci)(idx) & p1) == 0)
                          coefs(ci)(idx) +=
                            (if (coefs(ci)(idx) >= 0) p1 else m1)
                        k += 1
                      } else {
                        run -= 1
                        if (run < 0) break2 = true // the target zero slot
                        else k += 1
                      }
                    }
                    if (sval != 0 && k <= se)
                      coefs(ci)(base + Zigzag(k)) = sval
                    k += 1
                  }
                }
              }
              if (eobrun > 0) {
                // end-of-band: correction bits for every remaining
                // nonzero coefficient from where the traversal stopped
                while (k <= se) {
                  val idx = base + Zigzag(k)
                  if (coefs(ci)(idx) != 0) {
                    if (r.bit() == 1 && (coefs(ci)(idx) & p1) == 0)
                      coefs(ci)(idx) +=
                        (if (coefs(ci)(idx) >= 0) p1 else m1)
                  }
                  k += 1
                }
                eobrun -= 1
              }
            }
            unit += 1
            bx += 1
          }
          by += 1
        }
      }
      // skip any 1-fill padding bits, land on the next marker boundary
      var p = r.pos
      while (p + 1 < b.length &&
        !((b(p) & 0xff) == 0xff && b(p + 1) != 0)) p += 1
      Some(p)
    }

    // the walk must reach the bare 2-byte EOI marker, so the loop
    // bound is pos+2 (len is only read after the EOI check)
    while (pos + 2 <= b.length) {
      if ((b(pos) & 0xff) != 0xff) return None
      while (pos + 2 <= b.length && (b(pos + 1) & 0xff) == 0xff) pos += 1
      if (pos + 2 > b.length) return None
      val m = b(pos + 1) & 0xff
      if (m == 0xd9) return finish() // EOI
      if (pos + 4 > b.length) return None
      val len = u16(b, pos + 2)
      val seg = pos + 4
      m match {
        case 0xc4 =>
          var p = seg
          while (p < seg + len - 2) {
            val tc = (b(p) & 0xf0) >> 4
            val th = b(p) & 0x0f
            val bits = Array.tabulate(16)(i => b(p + 1 + i) & 0xff)
            val n = bits.sum
            val vals = java.util.Arrays.copyOfRange(b, p + 17, p + 17 + n)
            val t = new HuffTable(bits, vals)
            if (tc == 0) dcT(th) = t else acT(th) = t
            p += 17 + n
          }
          pos = pos + 2 + len
        case 0xdb =>
          var p = seg
          while (p < seg + len - 2) {
            val pq = (b(p) & 0xf0) >> 4
            val tq = b(p) & 0x0f
            if (pq != 0) return None
            val t = new Array[Int](64)
            var i = 0
            while (i < 64) { t(Zigzag(i)) = b(p + 1 + i) & 0xff; i += 1 }
            qt(tq) = t
            p += 65
          }
          pos = pos + 2 + len
        case 0xdd =>
          dri = u16(b, seg)
          pos = pos + 2 + len
        case 0xda =>
          pos = scanEntropy(seg, len).getOrElse(return None)
          sawScan = true
        case _ =>
          pos = pos + 2 + len
      }
    }
    None
  }

  private def decodeScan(b: Array[Byte], start: Int, w: Int, h: Int,
      comps: Seq[Comp], dcT: Map[Int, HuffTable], acT: Map[Int, HuffTable],
      qt: Map[Int, Array[Int]], dri: Int): Option[Planes] = {
    val hmax = comps.map(_.hs).max
    val vmax = comps.map(_.vs).max
    val mcuW = 8 * hmax
    val mcuH = 8 * vmax
    val mcusX = (w + mcuW - 1) / mcuW
    val mcusY = (h + mcuH - 1) / mcuH
    // per-component plane at native resolution, padded to whole MCUs
    val planeW = comps.map(c => mcusX * c.hs * 8)
    val planes = comps.zipWithIndex.map { case (c, i) =>
      new Array[Int](planeW(i) * mcusY * c.vs * 8)
    }
    val dc = comps.map(c => dcT.getOrElse(c.td, return None))
    val ac = comps.map(c => acT.getOrElse(c.ta, return None))
    val q = comps.map(c => qt.getOrElse(c.tq, return None))
    val r = new BitReader(b, start)
    val coef = new Array[Int](64)
    val pred = new Array[Int](comps.length)
    var mcu = 0
    var my = 0
    while (my < mcusY) {
      var mx = 0
      while (mx < mcusX) {
        if (dri > 0 && mcu > 0 && mcu % dri == 0) {
          if (!r.consumeRestart()) return None
          java.util.Arrays.fill(pred, 0)
        }
        var ci = 0
        while (ci < comps.length) {
          val c = comps(ci)
          var bv = 0
          while (bv < c.vs) {
            var bh = 0
            while (bh < c.hs) {
              java.util.Arrays.fill(coef, 0)
              val s = r.decode(dc(ci))
              pred(ci) += extend(r.bits(s), s)
              coef(0) = pred(ci) * q(ci)(0)
              var k = 1
              var done = false
              while (!done && k <= 63) {
                val rs = r.decode(ac(ci))
                val run = rs >> 4
                val size = rs & 15
                if (size == 0) {
                  if (run == 15) k += 16 // ZRL
                  else done = true // EOB
                } else {
                  k += run
                  if (k > 63) return None
                  coef(Zigzag(k)) = extend(r.bits(size), size) * q(ci)(Zigzag(k))
                  k += 1
                }
              }
              idctBlock(coef, planes(ci), planeW(ci),
                mx * c.hs + bh, my * c.vs + bv)
              bh += 1
            }
            bv += 1
          }
          ci += 1
        }
        mcu += 1
        mx += 1
      }
      my += 1
    }
    Some(Planes(w, h, comps, planes, planeW))
  }

  /** IDCT one block into an Int plane at block position (bx, by) —
    * planes are whole-MCU padded, so no edge trim happens here (the
    * consumer samples only [0,w)×[0,h)). */
  private def idctBlock(coef: Array[Int], out: Array[Int], planeWidth: Int,
      bx: Int, by: Int): Unit = {
    // separable: tmp(u, y) = sum_v cosT(y)(v) F(u, v), then
    // f(x, y) = sum_u cosT(x)(u) tmp(u, y)
    val tmp = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += CosT(y)(v) * coef(u * 8 + v); v += 1 }
        tmp(u * 8 + y) = acc
        y += 1
      }
      u += 1
    }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var uu = 0
        // coefficient layout: coef(r*8+c) holds F(row=r, col=c) with
        // row = vertical frequency; tmp(r*8+x) already folded columns.
        while (uu < 8) { acc += CosT(y)(uu) * tmp(uu * 8 + x); uu += 1 }
        val px = math.round(acc + 128.0).toInt
        val clamped = if (px < 0) 0 else if (px > 255) 255 else px
        out((by * 8 + y) * planeWidth + bx * 8 + x) = clamped
        x += 1
      }
      y += 1
    }
  }
}

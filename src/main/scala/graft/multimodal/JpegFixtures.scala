package graft.multimodal

/** From-scratch baseline JPEG ENCODER for the q219 gate fixtures — the
  * ImageFixtures discipline (genuine container bytes built per row, so
  * the codec under test decodes real streams, not mocks) applied to
  * JPEG's entropy layer: SOI/APP0/DQT/SOF0/DHT/SOS segments, canonical
  * Huffman assembly (T.81 C.2), DC prediction with ones-complement
  * magnitudes, EOB per block, 1-fill byte alignment and 0xFF00 byte
  * stuffing.
  *
  * The gate fixtures are DC-ONLY with Q(0,0) = 8: a block whose only
  * coefficient is DC decodes to 64 identical pixels at exactly
  * dc + 128 (IDCT of a DC-only block is F(0,0)/8 = dc·Q00/8 = dc; the
  * ~1e-13 of floating noise in (1/√2)² is absorbed by the per-pixel
  * round), so every per-image pixel stat is CLOSED-FORM in doc_id and
  * the DuckDB oracle states it from arithmetic alone — while the
  * decoder still runs the full baseline path (real Huffman tables, DC
  * diffs across size classes 0..8, stuffed bytes whenever a code
  * sequence lands on 0xFF). The general-AC path is pinned separately
  * against ImageIO in JpegPixelCodecSpec.
  */
object JpegFixtures {

  /** Per-block flat pixel value of the q219 fixture for `docId`:
    * p(bi) = (docId·13 + 31·bi) mod 256, block index row-major. Width
    * is 1 + docId%3 blocks, height 1 + (docId·7)%4 blocks — the oracle
    * mirrors all of this in SQL. */
  def pixelJpegFor(docId: Long): Array[Byte] = {
    val wb = 1 + (docId % 3).toInt
    val hb = 1 + ((docId * 7) % 4).toInt
    encodeDcOnlyGray(8 * wb, 8 * hb,
      bi => (((docId * 13 + 31L * bi) % 256).toInt) - 128)
  }

  /** Annex K luminance DC table (public T.81 table K.3). */
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray

  /** Canonical code assignment (T.81 C.2): value -> (code, length). */
  private def canonical(bits: Array[Int], vals: Array[Int])
      : Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = Map.newBuilder[Int, (Int, Int)]
    var l = 1
    while (l <= 16) {
      var i = 0
      while (i < bits(l - 1)) {
        out += vals(k) -> (code, l)
        code += 1
        k += 1
        i += 1
      }
      code <<= 1
      l += 1
    }
    out.result()
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var n = 0
    def put(v: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flushOnes(): Unit = while (n != 0) put(1, 1)
  }

  /** Encode a grayscale baseline JPEG whose block (bi, row-major) holds
    * only the DC coefficient `dcOf(bi)` (range −128..127; pixel value =
    * dc + 128). Dimensions must be multiples of 8. `restartInterval`
    * > 0 emits a DRI segment and RSTn markers every that many blocks
    * (with the T.81 predictor reset + byte alignment). */
  def encodeDcOnlyGray(w: Int, h: Int, dcOf: Int => Int,
      restartInterval: Int = 0): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "DC-only fixture needs whole blocks")
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(v => out.write(v & 0xff))
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // DQT id 0: Q(0,0)=8 so a DC step is exactly one gray level; the
    // remaining (unused) AC quantizers are 16
    seg(0xdb, 0x00 +: (8 +: Array.fill(63)(16)))
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0))
    seg(0xc4, 0x00 +: (DcBits ++ DcVals))
    // minimal legal AC table: ONE code (EOB) at length 1 — the decoder
    // builds tables generically, so nothing here is special-cased
    seg(0xc4, 0x10 +: ((1 +: Array.fill(15)(0)) :+ 0x00))
    if (restartInterval > 0)
      seg(0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    seg(0xda, Array(1, 1, 0x00, 0, 63, 0))
    val dcCode = canonical(DcBits, DcVals)
    var bw = new BitWriter(out)
    var pred = 0
    var rst = 0
    val nb = (w / 8) * (h / 8)
    var bi = 0
    while (bi < nb) {
      if (restartInterval > 0 && bi > 0 && bi % restartInterval == 0) {
        bw.flushOnes()
        out.write(0xff); out.write(0xd0 + rst)
        rst = (rst + 1) % 8
        pred = 0
        bw = new BitWriter(out)
      }
      val dc = dcOf(bi)
      require(dc >= -128 && dc <= 127, s"DC out of gray range: $dc")
      val diff = dc - pred
      pred = dc
      val s = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c, l) = dcCode(s)
      bw.put(c, l)
      if (s > 0)
        bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      bw.put(0, 1) // EOB (the single AC code: '0')
      bi += 1
    }
    bw.flushOnes()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Progressive twin of [[pixelJpegFor]] (q232): IDENTICAL pixels,
    * encoded as SOF2 with three scans — DC first pass at Al=1 (codes
    * arithmetic-shifted diffs), a DC successive-approximation
    * refinement scan (Ah=1→Al=0, one raw bit per block), and a
    * spectral-selection AC scan (Ss=1..63) whose all-zero blocks end
    * through REAL EOBn run codes (not per-block EOBs), so the
    * decoder's eobrun arithmetic is load-bearing. */
  def progressivePixelJpegFor(docId: Long): Array[Byte] = {
    val wb = 1 + (docId % 3).toInt
    val hb = 1 + ((docId * 7) % 4).toInt
    encodeDcOnlyGrayProgressive(8 * wb, 8 * hb,
      bi => (((docId * 13 + 31L * bi) % 256).toInt) - 128)
  }

  def encodeDcOnlyGrayProgressive(w: Int, h: Int, dcOf: Int => Int)
      : Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "DC-only fixture needs whole blocks")
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(v => out.write(v & 0xff))
    }
    out.write(0xff); out.write(0xd8) // SOI
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, 0x00 +: (8 +: Array.fill(63)(16)))
    seg(0xc2, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 1, 1, 0x11, 0))
    seg(0xc4, 0x00 +: (DcBits ++ DcVals))
    val dcCode = canonical(DcBits, DcVals)
    val nb = (w / 8) * (h / 8)

    // scan 1: DC first pass, Al=1 — the T.81 point transform is an
    // arithmetic shift, so diffs chain over (dc >> 1); the decoder's
    // ((dc >> 1) << 1) | lsb reconstruction is exact for negatives too
    seg(0xda, Array(1, 1, 0x00, 0, 0, 0x01))
    var bw = new BitWriter(out)
    var pred = 0
    var bi = 0
    while (bi < nb) {
      val d = dcOf(bi) >> 1
      val diff = d - pred
      pred = d
      val s = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c, l) = dcCode(s)
      bw.put(c, l)
      if (s > 0)
        bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      bi += 1
    }
    bw.flushOnes()

    // scan 2: DC refinement (Ah=1, Al=0): one raw LSB per block
    seg(0xda, Array(1, 1, 0x00, 0, 0, 0x10))
    bw = new BitWriter(out)
    bi = 0
    while (bi < nb) { bw.put(dcOf(bi) & 1, 1); bi += 1 }
    bw.flushOnes()

    // AC table for the spectral scan: EOBn symbols EOB0..EOB14, one
    // per code length 1..15 (canonical; the all-ones fill pattern is
    // never a code)
    val acBits = Array.fill(15)(1) :+ 0
    val acVals = (0 to 14).map(_ << 4).toArray
    seg(0xc4, 0x10 +: (acBits ++ acVals))
    val acCode = canonical(acBits, acVals)

    // scan 3: AC first pass Ss=1..63, Al=0 — all-zero blocks end via
    // greedy EOBn runs (value m ∈ [2^r, 2^(r+1)-1], r ext bits)
    seg(0xda, Array(1, 1, 0x00, 1, 63, 0x00))
    bw = new BitWriter(out)
    var n = nb
    while (n > 0) {
      val r = math.min(14, 31 - Integer.numberOfLeadingZeros(n))
      val m = math.min(n, (1 << (r + 1)) - 1)
      val (c, l) = acCode(r << 4)
      bw.put(c, l)
      if (r > 0) bw.put(m - (1 << r), r)
      n -= m
    }
    bw.flushOnes()
    out.write(0xff); out.write(0xd9) // EOI
    out.toByteArray
  }

  /** Progressive twin of [[colorJpegFor]] (q234): identical pixels,
    * encoded as a 4:2:0 SOF2 stream with four scans — one INTERLEAVED
    * DC scan over all three components (per-component predictors, MCU
    * order Y00 Y01 Y10 Y11 Cb Cr) and three single-component
    * spectral-selection AC scans (T.81 restricts progressive AC scans
    * to one component), each ended by EOBn runs over the component's
    * own non-interleaved block grid. */
  def progressiveColorJpegFor(docId: Long): Array[Byte] = {
    val (wm, hm) = colorGeom(docId)
    encodeDcOnlyColor420Progressive(wm, hm,
      ybi => colorY(docId, ybi) - 128,
      mi => colorCb(docId, mi) - 128,
      mi => colorCr(docId, mi) - 128)
  }

  def encodeDcOnlyColor420Progressive(wm: Int, hm: Int, yDc: Int => Int,
      cbDc: Int => Int, crDc: Int => Int): Array[Byte] = {
    val w = 16 * wm
    val h = 16 * hm
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(v => out.write(v & 0xff))
    }
    out.write(0xff); out.write(0xd8)
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, 0x00 +: (8 +: Array.fill(63)(16)))
    seg(0xdb, 0x01 +: (8 +: Array.fill(63)(16)))
    seg(0xc2, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(0xc4, 0x00 +: (DcBits ++ DcVals)) // DC table 0 (luma)
    seg(0xc4, 0x01 +: (DcBits ++ DcVals)) // DC table 1 (chroma)
    val dcCode = canonical(DcBits, DcVals)

    // scan 1: interleaved DC over all three components (Ah=Al=0)
    seg(0xda, Array(3, 1, 0x00, 2, 0x10, 3, 0x10, 0, 0, 0x00))
    var bw = new BitWriter(out)
    val pred = Array(0, 0, 0)
    def emitDc(comp: Int, dc: Int): Unit = {
      require(dc >= -128 && dc <= 127, s"DC out of range: $dc")
      val diff = dc - pred(comp)
      pred(comp) = dc
      val s = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c, l) = dcCode(s)
      bw.put(c, l)
      if (s > 0)
        bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
    }
    var my = 0
    while (my < hm) {
      var mx = 0
      while (mx < wm) {
        val mi = my * wm + mx
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) { emitDc(0, yDc(mi * 4 + by * 2 + bx)); bx += 1 }
          by += 1
        }
        emitDc(1, cbDc(mi))
        emitDc(2, crDc(mi))
        mx += 1
      }
      my += 1
    }
    bw.flushOnes()

    // EOBn AC table (one symbol per length, as the gray twin)
    val acBits = Array.fill(15)(1) :+ 0
    val acVals = (0 to 14).map(_ << 4).toArray
    seg(0xc4, 0x10 +: (acBits ++ acVals))
    val acCode = canonical(acBits, acVals)
    def acScan(compId: Int, blocks: Int): Unit = {
      seg(0xda, Array(1, compId, 0x00, 1, 63, 0x00))
      bw = new BitWriter(out)
      var n = blocks
      while (n > 0) {
        val r = math.min(14, 31 - Integer.numberOfLeadingZeros(n))
        val m = math.min(n, (1 << (r + 1)) - 1)
        val (c, l) = acCode(r << 4)
        bw.put(c, l)
        if (r > 0) bw.put(m - (1 << r), r)
        n -= m
      }
      bw.flushOnes()
    }
    // per-component AC scans over the NON-INTERLEAVED block grids
    acScan(1, 4 * wm * hm) // Y: 2wm × 2hm blocks
    acScan(2, wm * hm)     // Cb
    acScan(3, wm * hm)     // Cr
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  /** Per-image geometry + flat block values of the q220 COLOR fixture:
    * wm × hm MCUs (16×16 px each); Y flat per 8×8 block (global index
    * ybi = mi·4 + by·2 + bx), Cb/Cr flat per MCU. The oracle mirrors
    * this arithmetic and the decoder's JFIF conversion exactly. */
  def colorGeom(docId: Long): (Int, Int) =
    (1 + (docId % 2).toInt, 1 + ((docId * 3) % 2).toInt)
  def colorY(docId: Long, ybi: Int): Int = ((docId * 11 + 17L * ybi) % 256).toInt
  def colorCb(docId: Long, mi: Int): Int = ((docId * 5 + 29L * mi) % 256).toInt
  def colorCr(docId: Long, mi: Int): Int = ((docId * 3 + 37L * mi) % 256).toInt

  def colorJpegFor(docId: Long): Array[Byte] = {
    val (wm, hm) = colorGeom(docId)
    encodeDcOnlyColor420(wm, hm,
      ybi => colorY(docId, ybi) - 128,
      mi => colorCb(docId, mi) - 128,
      mi => colorCr(docId, mi) - 128)
  }

  /** Encode a 4:2:0 YCbCr baseline JPEG of wm × hm MCUs whose Y blocks
    * (global row-major-in-MCU index ybi = mi·4 + by·2 + bx) and per-MCU
    * chroma blocks hold only DC coefficients. Interleaved MCU order
    * Y00 Y01 Y10 Y11 Cb Cr with per-component DC predictors — the
    * T.81 A.2.3 layout the decoder walks. */
  def encodeDcOnlyColor420(wm: Int, hm: Int, yDc: Int => Int,
      cbDc: Int => Int, crDc: Int => Int): Array[Byte] = {
    val w = 16 * wm
    val h = 16 * hm
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(v => out.write(v & 0xff))
    }
    out.write(0xff); out.write(0xd8)
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    // two quant tables (luma id 0, chroma id 1), both DC step = 1 px
    seg(0xdb, 0x00 +: (8 +: Array.fill(63)(16)))
    seg(0xdb, 0x01 +: (8 +: Array.fill(63)(16)))
    // SOF0: Y id 1 sampling 2x2 q0; Cb id 2 1x1 q1; Cr id 3 1x1 q1
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3,
      1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(0xc4, 0x00 +: (DcBits ++ DcVals)) // DC table 0 (luma)
    seg(0xc4, 0x01 +: (DcBits ++ DcVals)) // DC table 1 (chroma)
    seg(0xc4, 0x10 +: ((1 +: Array.fill(15)(0)) :+ 0x00)) // AC 0: EOB only
    seg(0xc4, 0x11 +: ((1 +: Array.fill(15)(0)) :+ 0x00)) // AC 1: EOB only
    // SOS: Y tables (0,0); Cb/Cr tables (1,1)
    seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val dcCode = canonical(DcBits, DcVals)
    val bw = new BitWriter(out)
    val pred = Array(0, 0, 0)
    def emit(comp: Int, dc: Int): Unit = {
      require(dc >= -128 && dc <= 127, s"DC out of range: $dc")
      val diff = dc - pred(comp)
      pred(comp) = dc
      val s = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c, l) = dcCode(s)
      bw.put(c, l)
      if (s > 0)
        bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      bw.put(0, 1) // EOB
    }
    var my = 0
    while (my < hm) {
      var mx = 0
      while (mx < wm) {
        val mi = my * wm + mx
        var by = 0
        while (by < 2) {
          var bx = 0
          while (bx < 2) {
            emit(0, yDc(mi * 4 + by * 2 + bx))
            bx += 1
          }
          by += 1
        }
        emit(1, cbDc(mi))
        emit(2, crDc(mi))
        mx += 1
      }
      my += 1
    }
    bw.flushOnes()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  /** DC-only 4:2:2 (or, with `vertical`, 4:4:0) color stream: MCU =
    * two Y blocks side by side (stacked when vertical) + one Cb + one
    * Cr. `wm × hm` MCUs; image is 16×8 (8×16 vertical) per MCU. Y DCs
    * indexed `mi * 2 + b` in MCU scan order; chroma per MCU. */
  def encodeDcOnlyColor422(wm: Int, hm: Int, yDc: Int => Int,
      cbDc: Int => Int, crDc: Int => Int,
      vertical: Boolean = false): Array[Byte] = {
    val w = (if (vertical) 8 else 16) * wm
    val h = (if (vertical) 16 else 8) * hm
    val sampling = if (vertical) 0x12 else 0x21
    val out = new java.io.ByteArrayOutputStream()
    def seg(marker: Int, payload: Array[Int]): Unit = {
      out.write(0xff); out.write(marker)
      val len = payload.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      payload.foreach(v => out.write(v & 0xff))
    }
    out.write(0xff); out.write(0xd8)
    seg(0xe0, Array('J', 'F', 'I', 'F', 0, 1, 1, 0, 0, 1, 0, 1, 0, 0))
    seg(0xdb, 0x00 +: (8 +: Array.fill(63)(16)))
    seg(0xdb, 0x01 +: (8 +: Array.fill(63)(16)))
    seg(0xc0, Array(8, h >> 8, h & 0xff, w >> 8, w & 0xff, 3,
      1, sampling, 0, 2, 0x11, 1, 3, 0x11, 1))
    seg(0xc4, 0x00 +: (DcBits ++ DcVals))
    seg(0xc4, 0x01 +: (DcBits ++ DcVals))
    seg(0xc4, 0x10 +: ((1 +: Array.fill(15)(0)) :+ 0x00))
    seg(0xc4, 0x11 +: ((1 +: Array.fill(15)(0)) :+ 0x00))
    seg(0xda, Array(3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0))
    val dcCode = canonical(DcBits, DcVals)
    val bw = new BitWriter(out)
    val pred = Array(0, 0, 0)
    def emit(comp: Int, dc: Int): Unit = {
      require(dc >= -128 && dc <= 127, s"DC out of range: $dc")
      val diff = dc - pred(comp)
      pred(comp) = dc
      val s = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (c, l) = dcCode(s)
      bw.put(c, l)
      if (s > 0)
        bw.put(if (diff < 0) diff + (1 << s) - 1 else diff, s)
      bw.put(0, 1) // EOB
    }
    var my = 0
    while (my < hm) {
      var mx = 0
      while (mx < wm) {
        val mi = my * wm + mx
        emit(0, yDc(mi * 2))
        emit(0, yDc(mi * 2 + 1))
        emit(1, cbDc(mi))
        emit(2, crDc(mi))
        mx += 1
      }
      my += 1
    }
    bw.flushOnes()
    out.write(0xff); out.write(0xd9)
    out.toByteArray
  }

  def color422Geom(docId: Long): (Int, Int) =
    (1 + (docId % 2).toInt, 1 + ((docId * 5) % 3).toInt)
  def c422Y(docId: Long, ybi: Int): Int = ((docId * 7 + 19L * ybi) % 256).toInt
  def c422Cb(docId: Long, mi: Int): Int = ((docId * 13 + 23L * mi) % 256).toInt
  def c422Cr(docId: Long, mi: Int): Int = ((docId * 17 + 41L * mi) % 256).toInt

  /** Deterministic 4:2:2 color stream for a document row (q225). */
  def color422JpegFor(docId: Long): Array[Byte] = {
    val (wm, hm) = color422Geom(docId)
    encodeDcOnlyColor422(wm, hm,
      ybi => c422Y(docId, ybi) - 128,
      mi => c422Cb(docId, mi) - 128,
      mi => c422Cr(docId, mi) - 128)
  }
}

package graft.multimodal

/** WAV PCM SAMPLE decode — the audio modality's pixel rung (r11 verdict
  * task 7, the [[PngPixelCodec]] contract applied to RIFF/WAVE): walk
  * the chunk list to `fmt ` and `data`, then reconstruct the actual
  * sample values from the PCM frames — 8-bit unsigned (centered by the
  * spec's 128 bias) or 16-bit signed little-endian, interleaved by
  * channel. Scope: formatTag 1 (integer PCM), 8/16 bits, any channel
  * count; anything else returns None rather than guessing.
  *
  * Scale shape mirrors the image family: decode is per-row map work,
  * the payload never reaches a shuffle, and memory is bounded by one
  * clip's frame count per call. A data chunk whose size is not a whole
  * number of blocks is rejected (truncated stream), not rounded.
  */
object WavPcmCodec {

  /** Decoded clip: per-channel samples, `samples(c)(t)` = channel c,
    * frame t, already sign-centered (8-bit: value − 128; 16-bit: signed). */
  final case class Pcm(channels: Int, bits: Int, sampleRate: Int,
      nFrames: Int, samples: Array[Array[Int]])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  def decodePcm(payload: Array[Byte]): Option[Pcm] = {
    if (payload.length < 12 || tag(payload, 0) != "RIFF" ||
        tag(payload, 8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int, Int)] = None // tag, ch, rate, align, bits
    var dataOff = -1
    var dataLen = -1L
    while (off + 8 <= payload.length && (fmt.isEmpty || dataOff < 0)) {
      val id = tag(payload, off)
      val len = le32(payload, off + 4)
      val body = off + 8
      if (len < 0 || body + len > payload.length) return None
      id match {
        case "fmt " if len >= 16 =>
          fmt = Some((le16(payload, body), le16(payload, body + 2),
            le32(payload, body + 4).toInt,
            le16(payload, body + 12), le16(payload, body + 14)))
        case "data" => dataOff = body; dataLen = len
        case _ => // unknown chunk (LIST/INFO/...): skip
      }
      off = body + len.toInt + (len.toInt % 2) // odd chunks carry a pad byte
    }
    fmt match {
      case Some((1, ch, rate, align, bits))
          if dataOff >= 0 && ch > 0 && rate > 0 &&
            (bits == 8 || bits == 16) &&
            align == ch * bits / 8 && dataLen % align == 0 &&
            dataLen / align <= Int.MaxValue =>
        val nFrames = (dataLen / align).toInt
        val out = Array.ofDim[Int](ch, nFrames)
        var t = 0
        while (t < nFrames) {
          var c = 0
          while (c < ch) {
            out(c)(t) =
              if (bits == 8) (payload(dataOff + t * ch + c) & 0xff) - 128
              else {
                val raw = le16(payload, dataOff + 2 * (t * ch + c))
                if (raw >= 32768) raw - 65536 else raw
              }
            c += 1
          }
          t += 1
        }
        Some(Pcm(ch, bits, rate, nFrames, out))
      case _ => None
    }
  }
}

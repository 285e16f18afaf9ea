package graft.multimodal

/** From-scratch RIFF/WAVE header parser (PUBLIC spec: RIFF 1991, WAVE
  * PCM) — the audio-modality sibling of [[ImageHeaderCodec]]. Reads the
  * container magic, then WALKS the chunk list (skipping unknown chunks
  * with the spec's odd-size pad byte) to the `fmt ` and `data` chunks:
  *
  *   - `fmt `: audio format tag, channel count, sample rate, block
  *     align, bits per sample (all little-endian);
  *   - `data`: payload size, which with block align gives the exact
  *     sample-frame count (and therefore duration) without decoding a
  *     single sample.
  *
  * Total function: malformed payloads (bad magic, truncated chunk,
  * zero block align, missing fmt/data) return None — the caller maps
  * that to a sentinel row, keeping retry idempotence (the
  * [[MediaCodec]] deployment contract).
  */
object AudioHeaderCodec {

  /** Parsed WAV header facts. */
  final case class WavHeader(
      formatTag: Int, channels: Int, sampleRate: Int,
      bitsPerSample: Int, nFrames: Long)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  def decode(payload: Array[Byte]): Option[WavHeader] = {
    if (payload.length < 12 || tag(payload, 0) != "RIFF" ||
        tag(payload, 8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int, Int)] = None // tag,ch,rate,align,bits
    var dataLen = -1L
    while (off + 8 <= payload.length && (fmt.isEmpty || dataLen < 0)) {
      val id = tag(payload, off)
      val len = le32(payload, off + 4)
      val body = off + 8
      if (len < 0 || body + len > payload.length) return None
      id match {
        case "fmt " if len >= 16 =>
          fmt = Some((le16(payload, body), le16(payload, body + 2),
            le32(payload, body + 4).toInt, le16(payload, body + 12),
            le16(payload, body + 14)))
        case "data" => dataLen = len
        case _ => // unknown chunk (LIST/INFO/...): skip
      }
      off = body + len.toInt + (len.toInt % 2) // odd chunks carry a pad byte
    }
    fmt match {
      case Some((ftag, ch, rate, align, bits))
          if dataLen >= 0 && align > 0 && ch > 0 && rate > 0 =>
        Some(WavHeader(ftag, ch, rate, bits, dataLen / align))
      case _ => None
    }
  }
}

package graft.multimodal

/** Genuine RIFF/WAVE containers built byte-by-byte to the PUBLIC
  * format spec (RIFF 1991 / WAVE PCM) — real "RIFF"/"WAVE" magic, a
  * real little-endian `fmt ` chunk, interleaved chunk walks with the
  * spec's word-alignment padding, and a `data` chunk sized by the
  * sample geometry — so [[AudioHeaderCodec]] is exercised against true
  * payload bytes (the q194 contract, extended to the audio modality).
  */
object WavFixtures {

  private def u8s(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
  private def le16(v: Int) = u8s(v & 0xff, (v >> 8) & 0xff)
  private def le32(v: Int) =
    u8s(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, (v >>> 24) & 0xff)

  private def chunk(id: String, data: Array[Byte]): Array[Byte] = {
    // RIFF: chunks with ODD payload size carry one trailing pad byte
    // that is NOT counted in the size field — parsers must re-align
    val pad = if (data.length % 2 == 1) u8s(0) else Array.empty[Byte]
    id.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
  }

  /** Fully valid PCM WAV: sampleRate Hz, `channels` channels,
    * `bits` bits/sample, `nFrames` sample frames of deterministic
    * content. With `listChunk`, an odd-sized LIST/INFO chunk precedes
    * `fmt ` so the codec's chunk walk (and its padding arithmetic)
    * is load-bearing, not a fixed-offset read. */
  def wav(sampleRate: Int, channels: Int, bits: Int, nFrames: Int,
      listChunk: Boolean = false): Array[Byte] = {
    val blockAlign = channels * bits / 8
    val byteRate = sampleRate * blockAlign
    val fmt = chunk("fmt ", le16(1) ++ le16(channels) ++ le32(sampleRate) ++
      le32(byteRate) ++ le16(blockAlign) ++ le16(bits))
    val samples = Array.tabulate(nFrames * blockAlign)(i =>
      ((i * 31 + nFrames) & 0xff).toByte)
    val data = chunk("data", samples)
    val list = if (listChunk)
      chunk("LIST", "INFO".getBytes("US-ASCII") ++
        chunk("INAM", "graft".getBytes("US-ASCII"))) // 13-byte INAM → padded
    else Array.empty[Byte]
    val body = "WAVE".getBytes("US-ASCII") ++ list ++ fmt ++ data
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** Deterministic real-container payload for q199, geometry chosen by
    * the same doc_id arithmetic the DuckDB oracle recomputes:
    * matching parsed features prove the codec walked genuine RIFF
    * chunks. Every 5th doc carries the odd-sized LIST chunk. */
  val Rates: Seq[Int] = Seq(8000, 16000, 22050, 44100)

  def payloadFor(docId: Long): Array[Byte] = {
    val rate = Rates(((docId % 4) + 4).toInt % 4)
    val channels = (1 + docId % 2).toInt
    val bits = if (docId % 3 == 0) 8 else 16
    val nFrames = (1 + docId % 500).toInt
    wav(rate, channels, bits, nFrames, listChunk = docId % 5 == 0)
  }
}

package graft.operators

import java.io.ByteArrayOutputStream

/** Pure-JVM audio header codec: parse (and, for fixtures, emit) the
  * metadata-bearing prefix of WAV (RIFF/WAVE) streams — the audio
  * sibling of [[ImageHeaders]], no codec libraries, no native deps.
  *
  * WAV layout (public spec, Microsoft/IBM RIFF): 'RIFF' + u32 LE riff
  * size + 'WAVE', then a chunk chain of (4-byte id, u32 LE size,
  * payload, odd sizes padded to even). The 'fmt ' chunk carries
  * format tag, channels (u16 LE), sample rate (u32 LE), byte rate,
  * block align, bits per sample; the 'data' chunk's size gives the
  * sample count. The walker must hop unknown chunks (LIST, cue, fact,
  * ...) by size — exactly the discipline the JPEG segment walk
  * exercises big-endian, here little-endian.
  *
  * A curation pipeline runs this on every audio blob: filter by sample
  * rate / channels / duration BEFORE paying for PCM decode on the
  * survivors. Decode failures return None — one corrupt blob must not
  * kill a corpus-scale pass.
  */
object AudioHeaders {

  /** Decoded WAV metadata. `nSamples` = data bytes / block align;
    * duration derives as nSamples / sampleRate at the caller. */
  final case class WavMeta(channels: Int, sampleRate: Int,
      bitsPerSample: Int, nSamples: Long)

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xff).toLong | ((b(i + 1) & 0xff).toLong << 8) |
      ((b(i + 2) & 0xff).toLong << 16) | ((b(i + 3) & 0xff).toLong << 24)
  private def tag(b: Array[Byte], i: Int): String =
    new String(b, i, 4, "US-ASCII")

  def decodeWav(b: Array[Byte]): Option[WavMeta] = {
    if (b == null || b.length < 12) return None
    if (tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    var off = 12
    var fmt: Option[(Int, Int, Int, Int)] = None // ch, rate, bits, block
    var dataBytes: Option[Long] = None
    while (off + 8 <= b.length && (fmt.isEmpty || dataBytes.isEmpty)) {
      val id = tag(b, off)
      val size = u32le(b, off + 4)
      if (size < 0) return None
      if (id == "fmt ") {
        if (size < 16 || off + 8 + 16 > b.length) return None
        val ch = u16le(b, off + 10)
        val rate = u32le(b, off + 12)
        val block = u16le(b, off + 20)
        val bits = u16le(b, off + 22)
        if (ch <= 0 || rate <= 0 || rate > Int.MaxValue || block <= 0)
          return None
        fmt = Some((ch, rate.toInt, bits, block))
      } else if (id == "data") {
        dataBytes = Some(size)
      }
      // chunk payloads pad to even length per RIFF; Long math — a
      // declared size near u32 max would overflow an Int offset into
      // negative territory (index crash, not a clean end-of-walk), and
      // a chunk DECLARING more bytes than the buffer carries (our
      // header-only data chunk, or a truncated stream) simply ends the
      // walk at the buffer edge
      val next = off.toLong + 8L + size + (size & 1L)
      off = if (next > b.length) b.length else next.toInt
    }
    for ((ch, rate, bits, block) <- fmt; db <- dataBytes)
      yield WavMeta(ch, rate, bits, db / block)
  }

  /** Minimal structurally-valid WAV header stream: RIFF/WAVE, a LIST
    * chunk carrying `note` (variable length — the walker must hop it),
    * fmt (PCM), and a data chunk DECLARING `nSamples` frames without
    * carrying them (header-only, which is all the decoder reads —
    * byte-count formulas stay exact for the oracle). */
  def encodeWav(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nSamples: Long, note: Array[Byte]): Array[Byte] = {
    val block = channels * (bitsPerSample / 8)
    // u32 size fields: a declared data size past u32 max would silently
    // truncate and corrupt the decode — fail loudly at encode time
    require(block > 0, s"need positive block align, got $block")
    require(nSamples >= 0 && nSamples * block <= 0xffffffffL,
      s"data chunk size ${nSamples * block} exceeds u32")
    val out = new ByteArrayOutputStream(note.length + 64)
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"), 0, 4)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    // a LIST payload starts with a mandatory 4-byte list-type ('INFO');
    // omitting it is nonstandard RIFF that third-party tools reject even
    // though a hop-by-size walker tolerates it. Payload = type + note.
    val listPayload = 4 + note.length
    val noteChunk = 8 + listPayload + (listPayload & 1)
    val riffSize = 4 + noteChunk + (8 + 16) + 8 // WAVE + LIST + fmt + data hdr
    ascii("RIFF"); le32(riffSize); ascii("WAVE")
    ascii("LIST"); le32(listPayload)
    ascii("INFO")
    out.write(note, 0, note.length)
    if ((listPayload & 1) == 1) out.write(0) // RIFF even padding
    ascii("fmt "); le32(16)
    le16(1) // PCM
    le16(channels)
    le32(sampleRate)
    le32(sampleRate.toLong * block) // byte rate
    le16(block)
    le16(bitsPerSample)
    ascii("data"); le32(nSamples * block) // declared, not carried
    out.toByteArray
  }
}

package graft.operators

import java.io.ByteArrayOutputStream

/** TIFF/PDF-variant LZW codec (MSB-first, ClearCode 256, EOD 257,
  * 9→12-bit code widths) — the scheme behind LZW-compressed TIFF
  * strips (TIFF 6.0 §13) and the PDF LZWDecode filter (ISO 32000-1
  * 7.4.4). NOT the GIF variant ([[Pixels]] has that one): codes pack
  * most-significant-bit first and the width bump happens one code
  * EARLY when EarlyChange=1 (the TIFF behavior and the PDF default).
  *
  * Refereed against the JDK's ImageIO TIFF plugin (it writes
  * LZW-compressed strips this decoder must reproduce, and reads
  * strips this encoder produces — TiffLzwSpec) and CPython's PDF-free
  * reimplementation is not needed: the PDF filter chain in Pdf.scala
  * composes this with the python-refereed ASCII85 layer. Corrupt
  * codes, references past the table, and a stream that ends without
  * EOD → None.
  */
object Lzw {

  private val Clear = 256
  private val Eod = 257

  /** Decode a TIFF/PDF LZW stream. `earlyChange = 1` (default) bumps
    * the code width one entry early. */
  def lzwDecode(b: Array[Byte], maxOut: Int = 1 << 26,
      earlyChange: Int = 1): Option[Array[Byte]] = {
    if (b == null || b.isEmpty) return None
    val out = new ByteArrayOutputStream(math.min(b.length * 4, 1 << 16))
    // entries 0-255 are single bytes; dynamic entries from 258
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    var next = 258
    var width = 9
    var bitPos = 0L
    val nBits = b.length.toLong * 8

    def read(): Int = {
      if (bitPos + width > nBits) return -1
      var v = 0
      var k = 0
      while (k < width) {
        val at = bitPos + k
        v = (v << 1) | ((b((at >>> 3).toInt) >>> (7 - (at & 7).toInt)) & 1)
        k += 1
      }
      bitPos += width
      v
    }

    // entries always reference strictly smaller codes -> no cycles
    def firstByteOf(code0: Int): Byte = {
      var c = code0
      while (c >= 258) c = prefix(c)
      c.toByte
    }

    def emit(code0: Int): Unit = {
      var sp = 0
      var c = code0
      while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
      out.write(c)
      while (sp > 0) { sp -= 1; out.write(stack(sp)) }
    }

    var prev = -1
    var done = false
    var ok = true
    while (!done && ok) {
      val code = read()
      if (code < 0) ok = false // bits ran out before EOD
      else if (code == Eod) done = true
      else if (code == Clear) {
        next = 258
        width = 9
        prev = -1
      } else if (prev < 0) {
        // first code after a clear: must be a literal
        if (code > 255) ok = false
        else { out.write(code); prev = code }
      } else if (code < 256 || (code >= 258 && code <= next)) {
        if (next >= 4096 && code == next) ok = false
        else {
          // add entry prev + firstByte(this code's string); for the
          // KwKwK case (code == next) the first byte is prev's own
          val first =
            if (code == next) firstByteOf(prev) else firstByteOf(code)
          if (next < 4096) {
            prefix(next) = prev
            suffix(next) = first
            next += 1
          }
          emit(code)
          if (out.size > maxOut) ok = false
          prev = code
          if (next + earlyChange >= (1 << width) && width < 12) width += 1
        }
      } else ok = false // 256/257 handled above; anything else invalid
    }
    if (ok && done) Some(out.toByteArray) else None
  }

  /** Encode (leads with Clear, ends with EOD, resets the dictionary
    * on overflow). The code-width schedule SIMULATES the decoder's
    * table — the decoder adds its entry one code later than the
    * encoder does, so widths are driven off that mirrored count. */
  def lzwEncode(data: Array[Byte], earlyChange: Int = 1): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length / 2 + 16)
    var acc = 0L
    var nAcc = 0
    var width = 9
    var decNext = 258 // the decoder's table size, mirrored
    var firstSinceClear = true
    def rawWrite(code: Int): Unit = {
      acc = (acc << width) | code
      nAcc += width
      while (nAcc >= 8) {
        out.write(((acc >>> (nAcc - 8)) & 0xff).toInt)
        nAcc -= 8
      }
    }
    def writeSym(code: Int): Unit = {
      rawWrite(code)
      if (!firstSinceClear && decNext < 4096) decNext += 1
      firstSinceClear = false
      if (decNext + earlyChange >= (1 << width) && width < 12) width += 1
    }
    val dict = new java.util.HashMap[Long, Integer]()
    var next = 258
    rawWrite(Clear)
    var cur = -1
    var i = 0
    while (i < data.length) {
      val c = data(i) & 0xff
      if (cur < 0) cur = c
      else {
        val key = (cur.toLong << 8) | c
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          writeSym(cur)
          if (next < 4096) { dict.put(key, Integer.valueOf(next)); next += 1 }
          cur = c
          if (next >= 4096) {
            // emit pending, clear, restart
            writeSym(cur)
            rawWrite(Clear)
            dict.clear()
            next = 258
            decNext = 258
            width = 9
            firstSinceClear = true
            cur = -1
          }
        }
      }
      i += 1
    }
    if (cur >= 0) writeSym(cur)
    rawWrite(Eod)
    if (nAcc > 0) { out.write(((acc << (8 - nAcc)) & 0xff).toInt); nAcc = 0 }
    out.toByteArray
  }
}

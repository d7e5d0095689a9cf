package graft.operators

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater, Inflater}

/** gzip (RFC 1952) member codec — crawl blobs and WARC records arrive
  * gzip-wrapped, so the ingestion path needs the header walk (what is
  * this member, how big does it claim to be) BEFORE spending inflate
  * on the survivors, and a REAL inflate for the records that pass.
  * Pure JDK (java.util.zip) — no external libs.
  *
  * Member layout: 1F 8B, CM=8 (deflate), FLG, MTIME u32 LE, XFL, OS,
  * then optional fields in order: FEXTRA (u16 LE len + data), FNAME
  * (NUL-terminated), FCOMMENT (NUL-terminated), FHCRC (u16); then the
  * deflate stream; then CRC32 and ISIZE (uncompressed size mod 2^32),
  * both u32 LE. Decode failures return None — one corrupt blob must
  * not kill a corpus-scale pass.
  */
object Compression {

  /** Parsed gzip metadata. `isize` is the DECLARED uncompressed size
    * (mod 2^32) from the trailer; [[gunzip]] verifies it and the CRC
    * against the actual inflate. */
  final case class GzipMeta(mtime: Long, os: Int, fname: Option[String],
      fcomment: Option[String], isize: Long)

  private def u16le(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32le(b: Array[Byte], i: Int): Long =
    (b(i) & 0xff).toLong | ((b(i + 1) & 0xff).toLong << 8) |
      ((b(i + 2) & 0xff).toLong << 16) | ((b(i + 3) & 0xff).toLong << 24)

  /** Header + trailer walk of a SINGLE-member buffer, no inflate:
    * magic, flag-driven optional field hops, declared ISIZE off the
    * tail. Returns None for non-gzip, non-deflate, reserved flag
    * bits, or truncation. */
  def decodeGzipHeader(b: Array[Byte]): Option[GzipMeta] =
    parseHeader(b, 0).map { case (mtime, os, fn, fc, _) =>
      GzipMeta(mtime, os, fn, fc, u32le(b, b.length - 4))
    }

  /** Header fields + the offset where the deflate stream starts, for
    * the member at `off`. */
  private def parseHeader(b: Array[Byte], off0: Int): Option[
      (Long, Int, Option[String], Option[String], Int)] = {
    if (b == null || b.length - off0 < 18) return None // hdr 10 + tail 8
    if ((b(off0) & 0xff) != 0x1f || (b(off0 + 1) & 0xff) != 0x8b)
      return None
    if ((b(off0 + 2) & 0xff) != 8) return None // deflate is the only CM
    val flg = b(off0 + 3) & 0xff
    if ((flg & 0xe0) != 0) return None // reserved bits must be zero
    val mtime = u32le(b, off0 + 4)
    val os = b(off0 + 9) & 0xff
    var off = off0 + 10
    if ((flg & 0x04) != 0) { // FEXTRA
      if (off + 2 > b.length) return None
      val xlen = u16le(b, off)
      off += 2 + xlen
      if (off > b.length) return None
    }
    def zstr(from: Int): Option[(String, Int)] = {
      var i = from
      while (i < b.length && b(i) != 0) i += 1
      if (i >= b.length) None
      else Some((new String(b, from, i - from, "ISO-8859-1"), i + 1))
    }
    var fname: Option[String] = None
    if ((flg & 0x08) != 0) zstr(off) match {
      case Some((s, next)) => fname = Some(s); off = next
      case None => return None
    }
    var fcomment: Option[String] = None
    if ((flg & 0x10) != 0) zstr(off) match {
      case Some((s, next)) => fcomment = Some(s); off = next
      case None => return None
    }
    if ((flg & 0x02) != 0) off += 2 // FHCRC
    if (off + 8 > b.length) return None // room for a trailer at least
    Some((mtime, os, fname, fcomment, off))
  }

  /** Decode ONE member starting at `off`: the verified data, its
    * metadata (ISIZE from THIS member's trailer, found right after
    * the deflate stream via the inflater's consumed-byte count), and
    * the offset of the next member. None on any CRC/ISIZE mismatch,
    * inflate error, or truncation — a "successful" decode is a
    * VERIFIED one. */
  def gunzipMember(b: Array[Byte], off: Int): Option[
      (Array[Byte], GzipMeta, Int)] =
    parseHeader(b, off).flatMap { case (mtime, os, fn, fc, start) =>
      try {
        val inf = new Inflater(true) // raw deflate
        inf.setInput(b, start, b.length - 8 - start)
        val out = new ByteArrayOutputStream(64)
        val buf = new Array[Byte](8192)
        // documented Inflater quirk: nowrap mode needs one extra dummy
        // byte of input to finish; feed it ONCE — a second starvation
        // is a genuinely truncated stream
        var dummyFed = false
        while (!inf.finished()) {
          val n = inf.inflate(buf)
          if (n == 0 && inf.needsInput()) {
            if (dummyFed) throw new RuntimeException("trunc")
            inf.setInput(Array[Byte](0))
            dummyFed = true
          }
          out.write(buf, 0, n)
        }
        // deflate byte count = total consumed minus whatever came off
        // the dummy array (1 - its remaining)
        val dummyUsed = if (dummyFed) 1 - inf.getRemaining else 0
        val deflateLen = (inf.getBytesRead - dummyUsed).toInt
        inf.end()
        val trailer = start + deflateLen
        if (trailer + 8 > b.length) None
        else {
          val data = out.toByteArray
          val crc = new CRC32(); crc.update(data)
          val isize = u32le(b, trailer + 4)
          if (crc.getValue == u32le(b, trailer) &&
            (data.length.toLong & 0xffffffffL) == isize)
            Some((data, GzipMeta(mtime, os, fn, fc, isize), trailer + 8))
          else None
        }
      } catch { case scala.util.control.NonFatal(_) => None }
    }

  /** REAL single-member decode: inflate + verify, and the member must
    * span the whole buffer (trailing garbage = not one clean member). */
  def gunzip(b: Array[Byte]): Option[Array[Byte]] =
    gunzipMember(b, 0).collect {
      case (data, _, next) if next == b.length => data
    }

  /** Decode a CONCATENATION of gzip members — the Common Crawl
    * .warc.gz layout (one member per record, members back to back).
    * Each member is independently verified; a torn tail ends the walk
    * with the good prefix (one bad member must not discard a shard). */
  def gunzipMembers(b: Array[Byte]): Vector[Array[Byte]] = {
    if (b == null) return Vector.empty
    val out = Vector.newBuilder[Array[Byte]]
    var off = 0
    var ok = true
    while (ok && off < b.length) {
      gunzipMember(b, off) match {
        case Some((data, _, next)) if next > off =>
          out += data
          off = next
        case _ => ok = false
      }
    }
    out.result()
  }

  /** Fixture emitter: one byte-valid gzip member with explicit FNAME /
    * FCOMMENT fields (GZIPOutputStream cannot set them) and a real
    * deflate of `data` — round-trips through [[gunzip]] and any
    * standard gzip tool. */
  def encodeGzip(data: Array[Byte], mtime: Long, fname: Option[String],
      fcomment: Option[String]): Array[Byte] = {
    require(mtime >= 0 && mtime <= 0xffffffffL, "MTIME is u32")
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def le32(v: Long): Unit = { le16((v & 0xffff).toInt); le16(((v >> 16) & 0xffff).toInt) }
    out.write(0x1f); out.write(0x8b); out.write(8)
    out.write((if (fname.isDefined) 0x08 else 0) |
      (if (fcomment.isDefined) 0x10 else 0))
    le32(mtime)
    out.write(0); out.write(255) // XFL, OS=unknown
    fname.foreach { s =>
      out.write(s.getBytes("ISO-8859-1")); out.write(0)
    }
    fcomment.foreach { s =>
      out.write(s.getBytes("ISO-8859-1")); out.write(0)
    }
    val def8 = new Deflater(Deflater.DEFAULT_COMPRESSION, true)
    def8.setInput(data); def8.finish()
    val buf = new Array[Byte](8192)
    while (!def8.finished()) {
      val n = def8.deflate(buf)
      out.write(buf, 0, n)
    }
    def8.end()
    val crc = new CRC32(); crc.update(data)
    le32(crc.getValue)
    le32(data.length.toLong & 0xffffffffL)
    out.toByteArray
  }
}

package graft.operators

import java.io.ByteArrayOutputStream

/** Bencode / torrent-metainfo parsing (public spec: BitTorrent BEP-3).
  * Torrent files are how large public datasets get DISTRIBUTED, so a
  * crawl's dataset-discovery slice needs the metainfo skeleton:
  * announce URL, payload name, piece length, piece count, total size,
  * file count — all without touching the content the file describes.
  *
  * The grammar is four productions and every strictness rule the spec
  * states is enforced (they are what separates bencode from a lookalike
  * blob): integers `i...e` with no leading zeros and no `-0`, strings
  * `<len>:<bytes>` with the exact declared length present, dict keys
  * byte-sorted STRICTLY ascending, one top-level value with no
  * trailing bytes. The piece string must be a whole number of 20-byte
  * SHA-1 entries, and a multi-file info dict's sizes sum in Long.
  * Anything torn or out of order → None.
  */
object Bencode {

  sealed trait BVal
  final case class BInt(v: Long) extends BVal
  final case class BStr(v: Array[Byte]) extends BVal
  final case class BList(items: Seq[BVal]) extends BVal
  /** Keys kept in wire order; [[parse]] enforces the sorted-keys rule. */
  final case class BDict(entries: Seq[(String, BVal)]) extends BVal {
    def get(key: String): Option[BVal] =
      entries.collectFirst { case (k, v) if k == key => v }
  }

  /** Parse one bencoded value at `from`; (value, index after). */
  private def value(b: Array[Byte], from: Int,
      depth: Int): Option[(BVal, Int)] = {
    if (depth > 32 || from >= b.length) return None
    (b(from) & 0xff) match {
      case 'i' =>
        var i = from + 1
        val neg = i < b.length && b(i) == '-'
        if (neg) i += 1
        val ds = i
        while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
        if (i == ds || i >= b.length || b(i) != 'e') return None
        if (b(ds) == '0' && i - ds > 1) return None // leading zero
        if (neg && b(ds) == '0') return None // -0 and -0... invalid
        val s = new String(b, ds, i - ds, "US-ASCII")
        val v = try s.toLong catch { case _: Exception => return None }
        Some((BInt(if (neg) -v else v), i + 1))
      case c if c >= '0' && c <= '9' =>
        var i = from
        while (i < b.length && b(i) >= '0' && b(i) <= '9') i += 1
        if (i >= b.length || b(i) != ':') return None
        if (b(from) == '0' && i - from > 1) return None // 0-led length
        if (i - from > 10) return None // hostile length literal
        val len = new String(b, from, i - from, "US-ASCII").toLong
        if (len < 0 || i + 1 + len > b.length) return None
        Some((BStr(java.util.Arrays.copyOfRange(b, i + 1,
          (i + 1 + len).toInt)), (i + 1 + len).toInt))
      case 'l' =>
        val items = scala.collection.mutable.ArrayBuffer.empty[BVal]
        var i = from + 1
        while (i < b.length && b(i) != 'e') {
          val (v, next) = value(b, i, depth + 1).getOrElse(return None)
          items += v
          i = next
        }
        if (i >= b.length) return None
        Some((BList(items.toSeq), i + 1))
      case 'd' =>
        val entries =
          scala.collection.mutable.ArrayBuffer.empty[(String, BVal)]
        var prevKey: Array[Byte] = null
        var i = from + 1
        while (i < b.length && b(i) != 'e') {
          val (k, afterK) = value(b, i, depth + 1) match {
            case Some((BStr(kb), n)) => (kb, n)
            case _ => return None // dict keys must be strings
          }
          // keys strictly ascending in raw-byte order (BEP-3)
          if (prevKey != null &&
            java.util.Arrays.compareUnsigned(prevKey, k) >= 0) return None
          prevKey = k
          val (v, afterV) = value(b, afterK, depth + 1)
            .getOrElse(return None)
          entries += ((new String(k, "ISO-8859-1"), v))
          i = afterV
        }
        if (i >= b.length) return None
        Some((BDict(entries.toSeq), i + 1))
      case _ => None
    }
  }

  /** Parse a COMPLETE bencoded document (no trailing bytes). */
  def parse(b: Array[Byte]): Option[BVal] =
    try {
      if (b == null || b.length < 2) return None
      value(b, 0, 0) match {
        case Some((v, end)) if end == b.length => Some(v)
        case _ => None
      }
    } catch { case _: Exception => None }

  /** `nFiles` is 1 for the single-file form; `totalSize` the payload
    * byte count (single `length`, or the multi-file sum). */
  final case class TorrentMeta(announce: Option[String], name: String,
      pieceLength: Long, nPieces: Int, totalSize: Long, nFiles: Int)

  private def str(v: Option[BVal]): Option[String] =
    v.collect { case BStr(s) => new String(s, "UTF-8") }
  private def int(v: Option[BVal]): Option[Long] =
    v.collect { case BInt(i) => i }

  def decodeTorrent(b: Array[Byte]): Option[TorrentMeta] =
    try {
      val top = parse(b) match {
        case Some(d: BDict) => d
        case _ => return None
      }
      val info = top.get("info") match {
        case Some(d: BDict) => d
        case _ => return None
      }
      val announce = str(top.get("announce"))
      val name = str(info.get("name")).getOrElse(return None)
      val pieceLength = int(info.get("piece length")).getOrElse(return None)
      if (pieceLength < 1) return None
      val pieces = info.get("pieces") match {
        case Some(BStr(p)) => p
        case _ => return None
      }
      if (pieces.length % 20 != 0) return None // whole SHA-1 entries
      val (totalSize, nFiles) = (info.get("length"), info.get("files")) match {
        case (Some(BInt(len)), None) =>
          if (len < 0) return None
          (len, 1)
        case (None, Some(BList(files))) =>
          if (files.isEmpty) return None
          var sum = 0L
          files.foreach {
            case d: BDict =>
              val l = int(d.get("length")).getOrElse(return None)
              if (l < 0) return None
              sum = math.addExact(sum, l)
              d.get("path") match {
                case Some(BList(parts)) if parts.nonEmpty &&
                  parts.forall(_.isInstanceOf[BStr]) => ()
                case _ => return None
              }
            case _ => return None
          }
          (sum, files.length)
        case _ => return None // exactly one of length / files
      }
      // piece count must cover the payload exactly
      val expected = if (totalSize == 0) 0L
        else (totalSize + pieceLength - 1) / pieceLength
      if (pieces.length / 20 != expected) return None
      Some(TorrentMeta(announce, name, pieceLength,
        (pieces.length / 20).toInt, totalSize, nFiles))
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // fixture emitter
  // ------------------------------------------------------------------

  private def wStr(o: ByteArrayOutputStream, s: Array[Byte]): Unit = {
    o.write(s"${s.length}:".getBytes("US-ASCII"))
    o.write(s, 0, s.length)
  }
  private def wStr(o: ByteArrayOutputStream, s: String): Unit =
    wStr(o, s.getBytes("UTF-8"))
  private def wInt(o: ByteArrayOutputStream, v: Long): Unit =
    o.write(s"i${v}e".getBytes("US-ASCII"))

  /** Emit a structurally-valid metainfo: single-file when `fileSizes`
    * has one entry, multi-file otherwise (each with a two-component
    * path). `pieces` carries the exact ceil(total/pieceLength) count
    * of deterministic 20-byte entries derived from `seed`. Dict keys
    * are emitted in the spec's sorted order. */
  def encodeTorrent(announce: String, name: String, pieceLength: Long,
      fileSizes: Seq[Long], seed: Long): Array[Byte] = {
    require(pieceLength >= 1 && fileSizes.nonEmpty &&
      fileSizes.forall(_ >= 0), "sizes")
    val total = fileSizes.sum
    val nPieces = if (total == 0) 0L else (total + pieceLength - 1) / pieceLength
    val pieces = new Array[Byte]((nPieces * 20).toInt)
    var i = 0
    while (i < pieces.length) { // deterministic fake SHA-1 bytes
      pieces(i) = ((seed * 31 + i * 7 + 13) & 0xff).toByte
      i += 1
    }
    val o = new ByteArrayOutputStream(256 + pieces.length)
    o.write('d')
    wStr(o, "announce"); wStr(o, announce)
    wStr(o, "info")
    o.write('d')
    if (fileSizes.length > 1) {
      wStr(o, "files")
      o.write('l')
      fileSizes.zipWithIndex.foreach { case (sz, k) =>
        o.write('d')
        wStr(o, "length"); wInt(o, sz)
        wStr(o, "path")
        o.write('l'); wStr(o, s"dir$k"); wStr(o, s"part-$k.bin"); o.write('e')
        o.write('e')
      }
      o.write('e')
    } else {
      wStr(o, "length"); wInt(o, fileSizes.head)
    }
    wStr(o, "name"); wStr(o, name)
    wStr(o, "piece length"); wInt(o, pieceLength)
    wStr(o, "pieces"); wStr(o, pieces)
    o.write('e')
    o.write('e')
    o.toByteArray
  }
}

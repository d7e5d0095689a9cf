package graft.operators

import java.io.ByteArrayOutputStream

/** Pure-JVM PDF structure sniff: parse (and, for fixtures, emit) the
  * cross-reference skeleton of a classic-xref PDF (public spec, ISO
  * 32000-1) — no PDF libraries, no native deps.
  *
  * A document-heavy crawl is full of PDFs; the curation questions —
  * how many pages, is it encrypted, which spec version — are all
  * answerable from the xref skeleton without parsing content streams:
  *
  *  1. header comment `%PDF-M.m` → version;
  *  2. the end-of-file anchor: `startxref` + byte offset + `%%EOF`
  *     (scanned only in the file's final bytes — payload content can
  *     never alias it);
  *  3. the xref TABLE at that offset: `xref`, a `start count`
  *     subsection line, then fixed 20-byte entries
  *     (`nnnnnnnnnn ggggg n|f`) — offsets into the body;
  *  4. the trailer dict: /Size (object count incl. the free head),
  *     /Root (catalog ref), /Encrypt presence;
  *  5. the object walk the offsets exist for: fetch the catalog at its
  *     xref offset, follow /Pages, fetch the page-tree root, read
  *     /Count.
  *
  * Cross-reference STREAMS (PDF 1.5+ compressed xref) are out of scope
  * — they require inflate+predictor decode of a content stream; the
  * classic table remains valid and ubiquitous in crawl mixes. Decode
  * failures return None — one corrupt blob must not kill a
  * corpus-scale pass.
  */
object Pdf {

  /** Sniffed PDF skeleton. `nObjects` = /Size − 1 (the spec counts the
    * always-free object 0); `nPages` = the page-tree root's /Count. */
  final case class PdfMeta(version: String, nPages: Int, nObjects: Int,
      encrypted: Boolean)

  /** ASCII view helpers — PDF's skeleton is 7-bit by construction. */
  private def ascii(b: Array[Byte], from: Int, until: Int): String =
    new String(b, from, math.max(0, until - from), "ISO-8859-1")

  /** Parse the unsigned integer starting at `i` (after optional spaces/
    * newlines); returns (value, indexAfter) or None. */
  private def parseLong(b: Array[Byte], start: Int): Option[(Long, Int)] = {
    var i = start
    while (i < b.length && (b(i) == ' ' || b(i) == '\r' || b(i) == '\n' ||
      b(i) == '\t')) i += 1
    var v = 0L
    var any = false
    while (i < b.length && b(i) >= '0' && b(i) <= '9') {
      v = v * 10 + (b(i) - '0')
      if (v < 0) return None // overflow = hostile
      any = true
      i += 1
    }
    if (any) Some((v, i)) else None
  }

  /** Find the byte index of `needle` within [from, until), or -1. */
  private def indexOf(b: Array[Byte], needle: String, from: Int,
      until: Int): Int = {
    val n = needle.getBytes("ISO-8859-1")
    val end = math.min(until, b.length) - n.length
    var i = math.max(0, from)
    while (i <= end) {
      var j = 0
      while (j < n.length && b(i + j) == n(j)) j += 1
      if (j == n.length) return i
      i += 1
    }
    -1
  }

  /** Parse an object reference `k g R` after the given dict key within
    * [from, until): returns the object number. */
  private def refAfter(b: Array[Byte], key: String, from: Int,
      until: Int): Option[Long] = {
    val k = indexOf(b, key, from, until)
    if (k < 0) return None
    parseLong(b, k + key.length).map(_._1)
  }

  def decodePdf(b: Array[Byte]): Option[PdfMeta] = {
    if (b == null || b.length < 32) return None
    // 1. header: %PDF-M.m
    if (ascii(b, 0, 5) != "%PDF-") return None
    val nlIdx = indexOf(b, "\n", 5, math.min(b.length, 32))
    if (nlIdx < 0) return None
    val version = ascii(b, 5, nlIdx).trim
    if (!version.matches("\\d\\.\\d")) return None
    // 2. end anchor: startxref in the final bytes only
    val tailFrom = math.max(0, b.length - 128)
    val sx = indexOf(b, "startxref", tailFrom, b.length)
    if (sx < 0) return None
    val xrefOff = parseLong(b, sx + 9) match {
      case Some((v, _)) if v >= 0 && v < b.length => v.toInt
      case _ => return None
    }
    // 3. the xref table
    if (indexOf(b, "xref", xrefOff, xrefOff + 6) != xrefOff) return None
    val (start, after1) = parseLong(b, xrefOff + 4).getOrElse(return None)
    val (count, after2) = parseLong(b, after1).getOrElse(return None)
    if (start != 0 || count < 1 || count > 1000000) return None
    // entries begin after the subsection line's EOL; each is exactly 20
    // bytes (10-digit offset, space, 5-digit gen, space, n|f, 2-byte EOL)
    var e = after2
    while (e < b.length && (b(e) == '\r' || b(e) == '\n' || b(e) == ' '))
      e += 1
    if (e + 20L * count > b.length) return None
    val offsets = new Array[Long](count.toInt)
    var i = 0
    while (i < count) {
      val row = e + 20 * i
      val off = parseLong(b, row).getOrElse(return None)._1
      val kind = b(row + 17)
      if (i == 0 && kind != 'f') return None // object 0 is always free
      if (kind != 'n' && kind != 'f') return None
      offsets(i) = off
      i += 1
    }
    // 4. trailer dict
    val tr = indexOf(b, "trailer", e + 20 * count.toInt, b.length)
    if (tr < 0) return None
    val size = refAfter(b, "/Size", tr, sx).getOrElse(return None)
    if (size != count) return None
    val root = refAfter(b, "/Root", tr, sx).getOrElse(return None)
    val encrypted = indexOf(b, "/Encrypt", tr, sx) >= 0
    // 5. the object walk: catalog → /Pages → /Count
    def objSlice(num: Long): Option[(Int, Int)] = {
      if (num < 1 || num >= count) return None
      val off = offsets(num.toInt)
      if (off < 0 || off >= b.length) return None
      // sanity: the slice must open with "<num> <gen> obj"
      val hdr = parseLong(b, off.toInt).getOrElse(return None)
      if (hdr._1 != num) return None
      val end = indexOf(b, "endobj", off.toInt, b.length)
      if (end < 0) None else Some((off.toInt, end))
    }
    val (cFrom, cUntil) = objSlice(root).getOrElse(return None)
    if (indexOf(b, "/Type /Catalog", cFrom, cUntil) < 0 &&
      indexOf(b, "/Type/Catalog", cFrom, cUntil) < 0) return None
    val pagesRef = refAfter(b, "/Pages", cFrom, cUntil).getOrElse(return None)
    val (pFrom, pUntil) = objSlice(pagesRef).getOrElse(return None)
    val nPages = refAfter(b, "/Count", pFrom, pUntil).getOrElse(return None)
    if (nPages < 0 || nPages > Int.MaxValue) return None
    Some(PdfMeta(version, nPages.toInt, (count - 1).toInt, encrypted))
  }

  /** Fixture emitter: a structurally-valid classic-xref PDF — catalog,
    * page-tree root with `nPages` kids, the page objects, one content
    * stream carrying `payload` verbatim (its length varies every
    * object offset after it — the xref entries are REAL computed byte
    * offsets), an /Encrypt dict when asked, then the xref table,
    * trailer, and startxref anchor. */
  def encodePdf(version: String, nPages: Int, encrypted: Boolean,
      payload: Array[Byte]): Array[Byte] = {
    require(version.matches("\\d\\.\\d"), s"version is M.m: $version")
    require(nPages >= 1, "at least one page")
    val out = new ByteArrayOutputStream(payload.length + 512)
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer[Long](0L) // obj 0
    w(s"%PDF-$version\n")
    offsets += out.size()
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    offsets += out.size()
    val kids = (0 until nPages).map(k => s"${3 + k} 0 R").mkString(" ")
    w(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $nPages >> endobj\n")
    var k = 0
    while (k < nPages) {
      offsets += out.size()
      w(s"${3 + k} 0 obj << /Type /Page /Parent 2 0 R /Contents " +
        s"${3 + nPages} 0 R >> endobj\n")
      k += 1
    }
    offsets += out.size()
    w(s"${3 + nPages} 0 obj << /Length ${payload.length} >> stream\n")
    out.write(payload, 0, payload.length)
    w("\nendstream endobj\n")
    if (encrypted) {
      offsets += out.size()
      w(s"${4 + nPages} 0 obj << /Filter /Standard /V 2 >> endobj\n")
    }
    val size = offsets.length
    val xrefOff = out.size()
    w(s"xref\n0 $size\n")
    w("0000000000 65535 f \n")
    var j = 1
    while (j < size) {
      w(f"${offsets(j)}%010d 00000 n \n")
      j += 1
    }
    w(s"trailer << /Size $size /Root 1 0 R" +
      (if (encrypted) s" /Encrypt ${4 + nPages} 0 R" else "") +
      s" >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }
}

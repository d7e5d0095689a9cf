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

  // ------------------------------------------------------------------
  // content-stream text extraction (round 14)
  // ------------------------------------------------------------------

  /** Inflate a FlateDecode stream (JDK zlib). */
  private def inflate(b: Array[Byte], from: Int, until: Int)
      : Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater()
      inf.setInput(b, from, until - from)
      val out = new ByteArrayOutputStream(math.max(64, (until - from) * 3))
      val buf = new Array[Byte](4096)
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) return None // truncated
        out.write(buf, 0, n)
      }
      inf.end()
      Some(out.toByteArray)
    } catch { case _: Exception => None }

  /** One text-run tokenizer pass over a decoded content stream.
    * Model (deliberately deterministic, the standard-14 assumption —
    * no font programs, PDFDocEncoding read as Latin-1):
    *  - only BT..ET blocks produce text;
    *  - Tj, ' and " append their string to the current line (' and "
    *    move to the next line first, like the spec's T* semantics);
    *  - TJ appends each string element of its array (kerning numbers
    *    are positioning, not glyphs — ignored);
    *  - Td, TD, T* and Tm start a new line;
    *  - inline images (BI..EI) are skipped;
    *  - anything malformed (unterminated string, array or text block)
    *    aborts to None — corrupt blobs must not yield plausible text.
    * Returns the block's lines, empty lines dropped. */
  private def tokenizeText(s: Array[Byte]): Option[Seq[String]] = {
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder()
    var inText = false
    var i = 0
    val n = s.length
    def newline(): Unit = {
      if (cur.length() > 0) { lines += cur.toString; cur.setLength(0) }
    }
    // parse a literal string starting at '('; returns index after ')'
    def literal(start: Int): Option[(String, Int)] = {
      val sb = new java.lang.StringBuilder()
      var depth = 1
      var j = start + 1
      while (j < n && depth > 0) {
        (s(j) & 0xff) match {
          case '\\' =>
            if (j + 1 >= n) return None
            (s(j + 1) & 0xff) match {
              case 'n' => sb.append('\n'); j += 2
              case 'r' => sb.append('\r'); j += 2
              case 't' => sb.append('\t'); j += 2
              case 'b' => sb.append('\b'); j += 2
              case 'f' => sb.append('\f'); j += 2
              case '(' => sb.append('('); j += 2
              case ')' => sb.append(')'); j += 2
              case '\\' => sb.append('\\'); j += 2
              case '\r' => j += (if (j + 2 < n && s(j + 2) == '\n') 3 else 2)
              case '\n' => j += 2 // line continuation
              case d if d >= '0' && d <= '7' =>
                var v = 0; var k = j + 1; var cnt = 0
                while (k < n && cnt < 3 && s(k) >= '0' && s(k) <= '7') {
                  v = v * 8 + (s(k) - '0'); k += 1; cnt += 1
                }
                sb.append((v & 0xff).toChar); j = k
              case other => sb.append(other.toChar); j += 2 // \x -> x
            }
          case '(' => depth += 1; sb.append('('); j += 1
          case ')' =>
            depth -= 1
            if (depth > 0) sb.append(')')
            j += 1
          case c => sb.append(c.toChar); j += 1
        }
      }
      if (depth != 0) None else Some((sb.toString, j))
    }
    // parse a hex string starting at '<'; returns index after '>'
    def hexString(start: Int): Option[(String, Int)] = {
      val sb = new java.lang.StringBuilder()
      var j = start + 1
      var hi = -1
      while (j < n && s(j) != '>') {
        val c = s(j) & 0xff
        val d =
          if (c >= '0' && c <= '9') c - '0'
          else if (c >= 'A' && c <= 'F') c - 'A' + 10
          else if (c >= 'a' && c <= 'f') c - 'a' + 10
          else if (c == ' ' || c == '\r' || c == '\n' || c == '\t') -2
          else return None
        if (d >= 0) {
          if (hi < 0) hi = d
          else { sb.append(((hi << 4) | d).toChar); hi = -1 }
        }
        j += 1
      }
      if (j >= n) return None
      if (hi >= 0) sb.append((hi << 4).toChar) // odd digit: pad 0
      Some((sb.toString, j + 1))
    }
    var pendingStrings = scala.collection.mutable.ArrayBuffer.empty[String]
    var pendingArray: Seq[String] = null
    var inArray = false
    val arrayAcc = scala.collection.mutable.ArrayBuffer.empty[String]
    def isDelim(c: Int): Boolean =
      c == ' ' || c == '\r' || c == '\n' || c == '\t' || c == 0 || c == '\f'
    while (i < n) {
      val c = s(i) & 0xff
      if (isDelim(c)) i += 1
      else if (c == '%') { // comment to EOL
        while (i < n && s(i) != '\n' && s(i) != '\r') i += 1
      } else if (c == '(') {
        literal(i) match {
          case Some((str, j)) =>
            if (inArray) arrayAcc += str else pendingStrings += str
            i = j
          case None => return None
        }
      } else if (c == '<' && i + 1 < n && s(i + 1) == '<') {
        i += 2 // dict open — contents handled as ordinary tokens
      } else if (c == '>' && i + 1 < n && s(i + 1) == '>') {
        i += 2
      } else if (c == '<') {
        hexString(i) match {
          case Some((str, j)) =>
            if (inArray) arrayAcc += str else pendingStrings += str
            i = j
          case None => return None
        }
      } else if (c == '[') {
        inArray = true; arrayAcc.clear(); i += 1
      } else if (c == ']') {
        inArray = false; pendingArray = arrayAcc.toSeq; i += 1
      } else if (c == '/') { // name: skip token
        i += 1
        while (i < n && !isDelim(s(i) & 0xff) && s(i) != '/' && s(i) != '(' &&
          s(i) != '[' && s(i) != ']' && s(i) != '<' && s(i) != '>') i += 1
      } else {
        // number or operator token
        val start = i
        while (i < n && !isDelim(s(i) & 0xff) && s(i) != '/' && s(i) != '(' &&
          s(i) != '[' && s(i) != ']' && s(i) != '<' && s(i) != '>' &&
          s(i) != '%') i += 1
        val tok = new String(s, start, i - start, "ISO-8859-1")
        tok match {
          case "BT" =>
            if (inText) return None
            inText = true
          case "ET" =>
            if (!inText) return None
            newline()
            inText = false
          case "Tj" =>
            if (inText && pendingStrings.nonEmpty)
              cur.append(pendingStrings.last)
            pendingStrings.clear()
          case "'" =>
            newline()
            if (inText && pendingStrings.nonEmpty)
              cur.append(pendingStrings.last)
            pendingStrings.clear()
          case "\"" =>
            newline()
            if (inText && pendingStrings.nonEmpty)
              cur.append(pendingStrings.last)
            pendingStrings.clear()
          case "TJ" =>
            if (inText && pendingArray != null) pendingArray.foreach(cur.append)
            pendingArray = null
          case "Td" | "TD" | "T*" | "Tm" =>
            newline()
            pendingStrings.clear()
          case "BI" => // inline image: skip to EI
            val ei = indexOf(s, "EI", i, n)
            if (ei < 0) return None
            i = ei + 2
          case _ =>
            // any other operator consumes its operands
            if (!tok.matches("[-+.0-9]+")) { pendingStrings.clear(); pendingArray = null }
        }
      }
    }
    if (inText) None else Some(lines.toSeq)
  }

  /** Extract the text of every page, in page-tree order — the
    * standard-14 / classic-xref surface of the decodePdf sniff. Each
    * page contributes its lines (see tokenizeText); pages with no text
    * contribute nothing. Returns None when the skeleton or any
    * content stream is malformed. */
  def extractText(b: Array[Byte]): Option[Seq[String]] = {
    try {
      if (decodePdf(b).isEmpty) return None
      // re-walk the skeleton (cheap: offsets live in the tail)
      val tailFrom = math.max(0, b.length - 128)
      val sx = indexOf(b, "startxref", tailFrom, b.length)
      val xrefOff = parseLong(b, sx + 9).get._1.toInt
      val (_, after1) = parseLong(b, xrefOff + 4).get
      val (count, after2) = parseLong(b, after1).get
      var e = after2
      while (e < b.length && (b(e) == '\r' || b(e) == '\n' || b(e) == ' '))
        e += 1
      val offsets = Array.tabulate(count.toInt)(i =>
        parseLong(b, e + 20 * i).get._1)
      def objSlice(num: Long): Option[(Int, Int)] = {
        if (num < 1 || num >= count) return None
        val off = offsets(num.toInt)
        if (off < 0 || off >= b.length) return None
        if (parseLong(b, off.toInt).exists(_._1 != num)) return None
        val end = indexOf(b, "endobj", off.toInt, b.length)
        if (end < 0) None else Some((off.toInt, end))
      }
      val tr = indexOf(b, "trailer", e + 20 * count.toInt, b.length)
      val root = refAfter(b, "/Root", tr, sx).getOrElse(return None)
      val (cFrom, cUntil) = objSlice(root).getOrElse(return None)
      val pagesRef = refAfter(b, "/Pages", cFrom, cUntil).getOrElse(return None)
      val (pFrom, pUntil) = objSlice(pagesRef).getOrElse(return None)
      // kids list: refs inside /Kids [ ... ]
      val kidsAt = indexOf(b, "/Kids", pFrom, pUntil)
      if (kidsAt < 0) return None
      val open = indexOf(b, "[", kidsAt, pUntil)
      val close = indexOf(b, "]", open, pUntil)
      if (open < 0 || close < 0) return None
      val kids = scala.collection.mutable.ArrayBuffer.empty[Long]
      var k = open + 1
      while (k < close) {
        parseLong(b, k) match {
          case Some((num, after)) =>
            val afterGen = parseLong(b, after).map(_._2).getOrElse(return None)
            var r = afterGen
            while (r < close && (b(r) == ' ' || b(r) == '\r' || b(r) == '\n'))
              r += 1
            if (r >= close || b(r) != 'R') return None
            kids += num
            k = r + 1
          case None => k = close
        }
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      kids.foreach { kid =>
        val (kFrom, kUntil) = objSlice(kid).getOrElse(return None)
        refAfter(b, "/Contents", kFrom, kUntil).foreach { cs =>
          val (sFrom, sUntil) = objSlice(cs).getOrElse(return None)
          val kw = indexOf(b, "stream", sFrom, sUntil)
          if (kw < 0) return None
          var dataFrom = kw + 6
          if (dataFrom < b.length && b(dataFrom) == '\r') dataFrom += 1
          if (dataFrom < b.length && b(dataFrom) == '\n') dataFrom += 1
          // /Length: direct integer or indirect ref
          val lenAt = indexOf(b, "/Length", sFrom, kw)
          if (lenAt < 0) return None
          val (lv, lAfter) = parseLong(b, lenAt + 7).getOrElse(return None)
          var r = lAfter
          while (r < kw && (b(r) == ' ')) r += 1
          val dataLen =
            if (r + 1 < kw && b(r) >= '0' && b(r) <= '9' &&
              { val g = parseLong(b, r); g.exists(p => {
                var q = p._2
                while (q < kw && b(q) == ' ') q += 1
                q < kw && b(q) == 'R' }) }) {
              // indirect: resolve the length object
              val (lFrom, lUntil) = objSlice(lv).getOrElse(return None)
              val objKw = indexOf(b, "obj", lFrom, lUntil)
              parseLong(b, objKw + 3).getOrElse(return None)._1
            } else lv
          if (dataFrom + dataLen > sUntil) return None
          val raw = java.util.Arrays.copyOfRange(b, dataFrom,
            dataFrom + dataLen.toInt)
          val flate = indexOf(b, "/FlateDecode", sFrom, kw) >= 0
          val data =
            if (flate) inflate(raw, 0, raw.length).getOrElse(return None)
            else raw
          out ++= tokenizeText(data).getOrElse(return None)
        }
      }
      Some(out.toSeq)
    } catch { case _: Exception => None }
  }

  /** Escape a line for a PDF literal string. */
  private def escLiteral(s: String): String = {
    val sb = new java.lang.StringBuilder()
    s.foreach {
      case '\\' => sb.append("\\\\")
      case '(' => sb.append("\\(")
      case ')' => sb.append("\\)")
      case c if c < 32 || c > 126 =>
        sb.append(f"\\${c.toInt & 0xff}%03o")
      case c => sb.append(c)
    }
    sb.toString
  }

  private def hexLiteral(s: String): String =
    s.map(c => f"${c.toInt & 0xff}%02X").mkString

  /** Text-bearing fixture emitter: one content stream PER PAGE with a
    * real operator mix — Td+Tj literal, TD+Tj (escaped literal),
    * T*+TJ kerned array (the line split around a -250 position), and
    * Tm+Tj hex string — optionally FlateDecode'd, plus a standard-14
    * /Font resource. extractText() is the identity on `pages`' lines. */
  def encodeTextPdf(version: String, pages: Seq[Seq[String]],
      flate: Boolean): Array[Byte] = {
    require(version.matches("\\d\\.\\d"), s"version is M.m: $version")
    require(pages.nonEmpty, "at least one page")
    val n = pages.length
    val out = new ByteArrayOutputStream(1024)
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    val offsets = scala.collection.mutable.ArrayBuffer[Long](0L)
    w(s"%PDF-$version\n")
    offsets += out.size()
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    offsets += out.size()
    val kids = (0 until n).map(k => s"${3 + k} 0 R").mkString(" ")
    w(s"2 0 obj << /Type /Pages /Kids [$kids] /Count $n >> endobj\n")
    val fontObj = 3 + n
    var k = 0
    while (k < n) {
      offsets += out.size()
      w(s"${3 + k} 0 obj << /Type /Page /Parent 2 0 R " +
        s"/Resources << /Font << /F1 $fontObj 0 R >> >> " +
        s"/Contents ${fontObj + 1 + k} 0 R >> endobj\n")
      k += 1
    }
    offsets += out.size()
    w(s"$fontObj 0 obj << /Type /Font /Subtype /Type1 " +
      "/BaseFont /Helvetica >> endobj\n")
    k = 0
    while (k < n) {
      val ops = new java.lang.StringBuilder()
      ops.append("BT /F1 12 Tf ")
      pages(k).zipWithIndex.foreach { case (line, i) =>
        if (i == 0) ops.append(s"72 720 Td (${escLiteral(line)}) Tj ")
        else (i % 3) match {
          case 1 => ops.append(s"0 -14 TD (${escLiteral(line)}) Tj ")
          case 2 =>
            val cut = line.length / 2
            ops.append(s"T* [(${escLiteral(line.take(cut))}) -250 " +
              s"(${escLiteral(line.drop(cut))})] TJ ")
          case _ =>
            ops.append(s"1 0 0 1 72 600 Tm <${hexLiteral(line)}> Tj ")
        }
      }
      ops.append("ET")
      val raw = ops.toString.getBytes("ISO-8859-1")
      val data =
        if (flate) {
          val d = new java.util.zip.Deflater()
          d.setInput(raw); d.finish()
          val bos = new ByteArrayOutputStream(raw.length + 32)
          val buf = new Array[Byte](4096)
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          d.end()
          bos.toByteArray
        } else raw
      offsets += out.size()
      w(s"${fontObj + 1 + k} 0 obj << /Length ${data.length}" +
        (if (flate) " /Filter /FlateDecode" else "") + " >> stream\n")
      out.write(data, 0, data.length)
      w("\nendstream endobj\n")
      k += 1
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
    w(s"trailer << /Size $size /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
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

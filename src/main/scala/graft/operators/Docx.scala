package graft.operators

/** DOCX text + metadata extraction (public spec: ECMA-376 Office Open
  * XML, WordprocessingML). Office documents are one of the largest
  * text-bearing populations a crawl carries after HTML and PDF; the
  * container is plain ZIP (reused: [[Archive.zipEntries]] /
  * [[Archive.unzipEntry]]) and the text lives in the main document
  * part as `<w:p>` paragraphs of `<w:r>` runs whose visible text is
  * `<w:t>` elements.
  *
  * Fidelity points this decoder gets right (each one a classic naive-
  * extractor bug): the main part's PATH is resolved through the
  * package relationships (`_rels/.rels` officeDocument Target), never
  * hard-coded; one paragraph's text is the CONCATENATION of all its
  * runs (editors split mid-word on formatting changes); `<w:tab/>`
  * and `<w:br/>` inside runs render as tab / newline; self-closing
  * `<w:t/>` is empty; XML entities decode. Title/creator come from
  * the Dublin Core `docProps/core.xml` part (same shape as
  * [[Epub]]'s OPF metadata). A zip that is not a WordprocessingML
  * package (no [Content_Types].xml, no officeDocument relationship,
  * missing main part) or a torn XML structure (an unterminated
  * `<w:t>` or `<w:p>`) → None.
  */
object Docx {

  /** `text` is paragraphs joined with '\n' (empty paragraphs kept —
    * they carry the document's visual structure). */
  final case class DocxMeta(title: Option[String], creator: Option[String],
      nParagraphs: Int, text: String)

  import Ooxml.{decodeEntities, findTag}

  /** The text of one paragraph body (between `<w:p...>` and `</w:p>`):
    * all `<w:t>` runs concatenated, tabs/breaks rendered. None on a
    * torn run. */
  private def paragraphText(p0: String): Option[String] = {
    // Drop paragraph-property blocks first: <w:pPr><w:tabs> carries
    // <w:tab w:pos=.../> tab-stop DEFINITIONS, which must not render
    // as text tabs (only <w:tab/> inside a run is a text tab).
    val p = {
      val sb = new StringBuilder
      var k = 0
      var go = true
      while (go) {
        val at = findTag(p0, "w:pPr", k)
        if (at < 0) { sb.append(p0.substring(k)); go = false }
        else {
          sb.append(p0.substring(k, at))
          val open = p0.indexOf('>', at)
          if (open < 0) return None
          if (p0.charAt(open - 1) == '/') k = open + 1
          else {
            val close = p0.indexOf("</w:pPr>", open)
            if (close < 0) return None // torn properties block
            k = close + 8
          }
        }
      }
      sb.toString
    }
    val out = new StringBuilder
    var i = 0
    var scanning = true
    while (scanning) {
      val t = findTag(p, "w:t", i)
      val tab = findTag(p, "w:tab", i)
      val br = findTag(p, "w:br", i)
      val next = Seq(t, tab, br).filter(_ >= 0).sorted.headOption
        .getOrElse(-1)
      if (next < 0) scanning = false
      else if (next == t) {
        val open = p.indexOf('>', t)
        if (open < 0) return None
        if (p.charAt(open - 1) == '/') i = open + 1 // <w:t/> empty run
        else {
          val close = p.indexOf("</w:t>", open)
          if (close < 0) return None // torn run
          out.append(decodeEntities(p.substring(open + 1, close)))
          i = close + 6
        }
      } else {
        val open = p.indexOf('>', next)
        if (open < 0) return None
        out.append(if (next == tab) '\t' else '\n')
        i = open + 1
      }
    }
    Some(out.toString)
  }

  /** First `<tag>text</tag>` body in `s`, entity-decoded. */
  private def tagText(s: String, tag: String): Option[String] = {
    val k = findTag(s, tag, 0)
    if (k < 0) return None
    val open = s.indexOf('>', k)
    if (open < 0) return None
    if (s.charAt(open - 1) == '/') return Some("")
    val close = s.indexOf(s"</$tag>", open)
    if (close < 0) None
    else Some(decodeEntities(s.substring(open + 1, close)))
  }


  def decodeDocx(b: Array[Byte]): Option[DocxMeta] =
    try {
      val entries = Archive.zipEntries(b).getOrElse(return None)
      val read = Ooxml.readPart(b, entries) _
      // the officeDocument relationship names the main part — a
      // WordprocessingML package MUST carry content types + rels
      val mainPath = Ooxml.mainPartPath(read).getOrElse(return None)
      val doc = read(mainPath).getOrElse(return None)
      val bodyAt = findTag(doc, "w:body", 0)
      if (bodyAt < 0) return None
      // paragraph walk
      val paras = scala.collection.mutable.ArrayBuffer.empty[String]
      var p = bodyAt
      var scanning = true
      while (scanning) {
        val k = findTag(doc, "w:p", p)
        if (k < 0) scanning = false
        else {
          val open = doc.indexOf('>', k)
          if (open < 0) return None
          if (doc.charAt(open - 1) == '/') { // <w:p/> empty paragraph
            paras += ""
            p = open + 1
          } else {
            val close = doc.indexOf("</w:p>", open)
            if (close < 0) return None // torn paragraph
            paras += paragraphText(doc.substring(open + 1, close))
              .getOrElse(return None)
            p = close + 6
          }
        }
      }
      // core properties are OPTIONAL (per-field degradation)
      val core = read("docProps/core.xml")
      Some(DocxMeta(
        core.flatMap(tagText(_, "dc:title")),
        core.flatMap(tagText(_, "dc:creator")),
        paras.length, paras.mkString("\n")))
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // fixture emitter
  // ------------------------------------------------------------------

  private def esc(s: String): String = Ooxml.escapeEntities(s)

  /** Emit a structurally-conformant package: content types, package
    * rels resolving the main part at `mainPath` (exercises non-default
    * paths), Dublin Core props, and the document part with each
    * paragraph SPLIT across multiple runs mid-text (the editor
    * behavior extraction must undo), entities escaped, runs with
    * leading/trailing spaces marked xml:space="preserve", and a tab
    * rendered via `<w:tab/>` wherever the paragraph contains one. */
  def encodeDocx(title: String, creator: String, paragraphs: Seq[String],
      mainPath: String = "word/document.xml"): Array[Byte] = {
    val contentTypes =
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/""".stripMargin + mainPath +
        """" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
          |<Override PartName="/docProps/core.xml" ContentType="application/vnd.openxmlformats-package.core-properties+xml"/>
          |</Types>""".stripMargin
    val rels =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
         |<Relationship Id="rId9" Type="http://schemas.openxmlformats.org/package/2006/relationships/metadata/core-properties" Target="docProps/core.xml"/>
         |<Relationship Id="rId1" Type="${Ooxml.OfficeDocRel}" Target="$mainPath"/>
         |</Relationships>""".stripMargin
    val core =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<cp:coreProperties xmlns:cp="http://schemas.openxmlformats.org/package/2006/metadata/core-properties" xmlns:dc="http://purl.org/dc/elements/1.1/">
         |<dc:title>${esc(title)}</dc:title>
         |<dc:creator>${esc(creator)}</dc:creator>
         |</cp:coreProperties>""".stripMargin
    def runs(text: String): String =
      if (text.isEmpty) "" // paragraph with no runs
      else text.split("\t", -1).zipWithIndex.map { case (seg, i) =>
        val tab = if (i == 0) "" else "<w:tab/>"
        if (seg.isEmpty) s"<w:r>$tab</w:r>"
        else {
          // split the segment across two runs mid-text
          val cut = seg.length / 2
          val parts = Seq(seg.take(cut), seg.drop(cut)).filter(_.nonEmpty)
          val ts = parts.zipWithIndex.map { case (part, j) =>
            val preserve =
              if (part != part.trim) " xml:space=\"preserve\"" else ""
            (if (j == 0) tab else "") + s"<w:t$preserve>${esc(part)}</w:t>"
          }
          ts.map(t => s"<w:r><w:rPr><w:b/></w:rPr>$t</w:r>").mkString
        }
      }.mkString
    val body = paragraphs.map {
      case "" => "<w:p/>"
      case text =>
        // a paragraph that USES tabs also gets custom tab STOPS in its
        // properties (what Word writes); those <w:tab w:pos=.../>
        // definitions must not render as text tabs
        val stops = if (text.contains('\t'))
          "<w:tabs><w:tab w:val=\"left\" w:pos=\"720\"/>" +
            "<w:tab w:val=\"right\" w:pos=\"8640\"/></w:tabs>"
        else ""
        s"<w:p><w:pPr><w:jc w:val=\"left\"/>$stops</w:pPr>" +
          runs(text) + "</w:p>"
    }.mkString
    val doc =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main">
         |<w:body>$body<w:sectPr/></w:body>
         |</w:document>""".stripMargin
    Archive.encodeZip(Seq(
      ("[Content_Types].xml", contentTypes.getBytes("UTF-8"), true),
      ("_rels/.rels", rels.getBytes("UTF-8"), true),
      ("docProps/core.xml", core.getBytes("UTF-8"), true),
      (mainPath, doc.getBytes("UTF-8"), true)))
  }
}

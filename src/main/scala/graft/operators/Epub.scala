package graft.operators

/** EPUB metadata extraction — the book-corpus container (public
  * specs: EPUB 3 / OCF packaging; a ZIP with a STORED "mimetype"
  * entry, META-INF/container.xml pointing at the OPF package
  * document, and Dublin Core metadata inside it). Books are a prized
  * long-form corpus, and their metadata lives three hops deep — this
  * operator is deliberately a COMPOSITION over the tested ZIP reader
  * ([[Archive.zipEntries]]/[[Archive.unzipEntry]]) rather than a new
  * byte decoder: container walk → rootfile path → OPF parse.
  *
  * Extracted: dc:title / dc:creator / dc:language / dc:identifier,
  * manifest and spine sizes (the chapter-count signal), the entry
  * count, and whether the mimetype entry is conformant (present,
  * STORED, exactly "application/epub+zip" — the first thing a
  * validator checks). A zip that is not an EPUB (no container.xml /
  * no rootfile / missing OPF) → None.
  */
object Epub {

  final case class EpubMeta(title: Option[String], creator: Option[String],
      language: Option[String], identifier: Option[String],
      nManifest: Int, nSpine: Int, nEntries: Int, mimetypeOk: Boolean)

  private def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&")

  /** First `<tag ...>text</tag>` text content (namespace-prefixed tag
    * names passed verbatim, e.g. "dc:title"). */
  private def tagText(s: String, tag: String): Option[String] = {
    var i = 0
    while (i < s.length) {
      val k = s.indexOf("<" + tag, i)
      if (k < 0) return None
      val after = k + 1 + tag.length
      if (after < s.length &&
        (s.charAt(after) == '>' || s.charAt(after).isWhitespace)) {
        val open = s.indexOf('>', k)
        val close = if (open < 0) -1 else s.indexOf("</" + tag, open)
        if (open < 0 || close < 0) return None
        return Some(decodeEntities(s.substring(open + 1, close).trim))
      }
      i = k + 1
    }
    None
  }

  private def countTag(s: String, tag: String): Int = {
    var n = 0
    var i = 0
    while (i >= 0 && i < s.length) {
      val k = s.indexOf("<" + tag, i)
      if (k < 0) i = -1
      else {
        val after = k + 1 + tag.length
        if (after < s.length &&
          (s.charAt(after).isWhitespace || s.charAt(after) == '/' ||
            s.charAt(after) == '>')) n += 1
        i = k + 1
      }
    }
    n
  }

  private def attrValue(s: String, name: String): Option[String] = {
    val k = s.indexOf(name + "=")
    if (k < 0) return None
    val q = s.charAt(k + name.length + 1)
    if (q != '"' && q != '\'') return None
    val start = k + name.length + 2
    val e = s.indexOf(q, start)
    if (e < 0) None else Some(s.substring(start, e))
  }

  def decodeEpub(b: Array[Byte]): Option[EpubMeta] =
    try {
      val entries = Archive.zipEntries(b).getOrElse(return None)
      def read(name: String): Option[String] =
        entries.find(_.name == name)
          .flatMap(Archive.unzipEntry(b, _))
          .map(new String(_, "UTF-8"))
      val mimetypeOk = entries.find(_.name == "mimetype").exists { e =>
        e.method == 0 && Archive.unzipEntry(b, e)
          .map(new String(_, "US-ASCII"))
          .contains("application/epub+zip")
      }
      val container = read("META-INF/container.xml").getOrElse(return None)
      // first <rootfile ...> carries full-path per OCF; the delimiter
      // check keeps the <rootfiles> WRAPPER from matching
      var rootAt = -1
      var scan = 0
      while (rootAt < 0 && scan < container.length) {
        val k = container.indexOf("<rootfile", scan)
        if (k < 0) scan = container.length
        else {
          val after = k + 9
          if (after < container.length &&
            (container.charAt(after).isWhitespace ||
              container.charAt(after) == '/')) rootAt = k
          else scan = k + 1
        }
      }
      if (rootAt < 0) return None
      val rootEnd = container.indexOf('>', rootAt)
      if (rootEnd < 0) return None
      val opfPath = attrValue(
        container.substring(rootAt, rootEnd), "full-path")
        .getOrElse(return None)
      val opf = read(opfPath).getOrElse(return None)
      Some(EpubMeta(
        tagText(opf, "dc:title"), tagText(opf, "dc:creator"),
        tagText(opf, "dc:language"), tagText(opf, "dc:identifier"),
        countTag(opf, "item"), countTag(opf, "itemref"),
        entries.size, mimetypeOk))
    } catch { case _: Exception => None }

  /** Fixture emitter: conformant OCF layout — STORED mimetype first,
    * container.xml, an OPF with Dublin Core metadata (entity-escaped
    * title) + one manifest item / spine itemref per chapter, and the
    * chapter XHTML files themselves (deflated). */
  def encodeEpub(title: String, creator: String, language: String,
      identifier: String, nChapters: Int): Array[Byte] = {
    require(nChapters >= 1)
    val esc = title.replace("&", "&amp;").replace("<", "&lt;")
    val container =
      """<?xml version="1.0"?>
        |<container version="1.0" xmlns="urn:oasis:names:tc:opendocument:xmlns:container">
        |<rootfiles><rootfile full-path="OEBPS/content.opf" media-type="application/oebps-package+xml"/></rootfiles>
        |</container>""".stripMargin
    val manifest = (0 until nChapters).map(k =>
      s"""<item id="c$k" href="c$k.xhtml" media-type="application/xhtml+xml"/>""")
      .mkString("\n")
    val spine = (0 until nChapters).map(k =>
      s"""<itemref idref="c$k"/>""").mkString("\n")
    val opf =
      s"""<?xml version="1.0" encoding="UTF-8"?>
         |<package xmlns="http://www.idpf.org/2007/opf" version="3.0" unique-identifier="uid">
         |<metadata xmlns:dc="http://purl.org/dc/elements/1.1/">
         |<dc:identifier id="uid">$identifier</dc:identifier>
         |<dc:title>$esc</dc:title>
         |<dc:creator>$creator</dc:creator>
         |<dc:language>$language</dc:language>
         |</metadata>
         |<manifest>
         |$manifest
         |</manifest>
         |<spine>
         |$spine
         |</spine>
         |</package>""".stripMargin
    val chapters = (0 until nChapters).map { k =>
      (s"OEBPS/c$k.xhtml",
        s"<html><body><p>chapter $k of $esc</p></body></html>"
          .getBytes("UTF-8"),
        true)
    }
    Archive.encodeZip(
      Seq(("mimetype", "application/epub+zip".getBytes("US-ASCII"), false),
        ("META-INF/container.xml", container.getBytes("UTF-8"), true),
        ("OEBPS/content.opf", opf.getBytes("UTF-8"), true)) ++ chapters)
  }
}

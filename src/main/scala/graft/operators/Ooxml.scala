package graft.operators

/** Shared scan primitives for the OOXML family ([[Docx]], [[Xlsx]],
  * [[Pptx]]) and their purpose-built XML walks: boundary-checked tag
  * search (a `<w:t` probe must never match `<w:tab`), block
  * extraction, entity codec, and the attribute reader with
  * attribute-NAME boundaries (`r:id` must not satisfy `id`). These
  * are deliberately scanners, not a DOM — the decode contract is
  * byte-faithful extraction with torn structures rejecting, and the
  * scanners make every accept/reject decision explicit. */
private[operators] object Ooxml {

  def decodeEntities(s: String): String =
    s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&apos;", "'")
      .replace("&amp;", "&")

  def escapeEntities(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** Index of `<tag` at a word boundary (next char ws, '/', '>'). */
  def findTag(s: String, tag: String, from: Int): Int = {
    val pat = "<" + tag
    var i = from
    while (i >= 0) {
      val k = s.indexOf(pat, i)
      if (k < 0) return -1
      val after = k + pat.length
      if (after >= s.length) return -1
      val c = s.charAt(after)
      if (c.isWhitespace || c == '/' || c == '>') return k
      i = k + 1
    }
    -1
  }

  /** All `<tag ...>body</tag>` (or self-closing, empty-body) blocks in
    * order as (open-tag text, body). None on a torn block. No
    * nesting of `tag` within itself. */
  def blocks(s: String, tag: String): Option[Seq[(String, String)]] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var i = 0
    var scanning = true
    while (scanning) {
      val k = findTag(s, tag, i)
      if (k < 0) scanning = false
      else {
        val open = s.indexOf('>', k)
        if (open < 0) return None
        if (s.charAt(open - 1) == '/') {
          out += ((s.substring(k, open), ""))
          i = open + 1
        } else {
          val close = s.indexOf(s"</$tag>", open)
          if (close < 0) return None
          out += ((s.substring(k, open), s.substring(open + 1, close)))
          i = close + tag.length + 3
        }
      }
    }
    Some(out.toSeq)
  }

  /** First `<tag>body</tag>` body inside `s` (self-closing → ""). */
  def tagBody(s: String, tag: String): Option[String] = {
    val k = findTag(s, tag, 0)
    if (k < 0) return None
    val open = s.indexOf('>', k)
    if (open < 0) return None
    if (s.charAt(open - 1) == '/') return Some("")
    val close = s.indexOf(s"</$tag>", open)
    if (close < 0) None else Some(s.substring(open + 1, close))
  }

  /** `name="value"` with an attribute-name boundary before `name`. */
  def attrValue(tag: String, name: String): Option[String] = {
    val k = tag.indexOf(name + "=\"")
    if (k < 0) return None
    if (k > 0 && { val c = tag.charAt(k - 1)
      c.isLetterOrDigit || c == ':' })
      return attrValue(tag.substring(k + 1), name)
    val start = k + name.length + 2
    val e = tag.indexOf('"', start)
    if (e < 0) None else Some(tag.substring(start, e))
  }

  val OfficeDocRel: String =
    "http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument"

  /** Read a named part of the package as UTF-8 (zip walk reused). */
  def readPart(b: Array[Byte],
      entries: Vector[Archive.ZipEntryMeta])(name: String): Option[String] =
    entries.find(_.name == name)
      .flatMap(Archive.unzipEntry(b, _))
      .map(new String(_, "UTF-8"))

  /** The package's main-part path: [Content_Types].xml must exist and
    * `_rels/.rels` must carry an officeDocument relationship. */
  def mainPartPath(read: String => Option[String]): Option[String] = {
    if (read("[Content_Types].xml").isEmpty) return None
    val rels = read("_rels/.rels").getOrElse(return None)
    blocks(rels, "Relationship").getOrElse(return None)
      .find(_._1.contains(s"$OfficeDocRel\""))
      .flatMap(r => attrValue(r._1, "Target")).map(_.stripPrefix("/"))
  }
}

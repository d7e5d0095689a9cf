package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML main-text extraction — the first stage of a real crawl
  * pipeline, feeding the text family (lang-ID, quality, dedup, BPE all
  * consume its output). Pure-JVM single-pass parse, no parser library:
  *
  *  1. DROP non-content containers wholesale: `<script>`, `<style>`,
  *     `<title>` (content and all), and `<!-- comments -->`.
  *  2. REASSEMBLE block text: block-level tags (p, div, h1–h6, li, br,
  *     nav, table rows, ...) delimit blocks; inline tags (a, b, span,
  *     em, ...) vanish; entities (&amp;amp; &amp;lt; &amp;#NN; ...)
  *     decode; whitespace runs collapse to one space (the HTML
  *     rendering rule, which also makes the transform replayable with
  *     DuckDB string functions).
  *  3. CUT boilerplate by link density: per block, the fraction of
  *     non-whitespace chars inside `<a>` — nav bars and footer link
  *     farms sit near 1.0, prose near 0 (the classic boilerplate
  *     signal, Kohlschütter et al. WSDM'10 — public). Blocks above the
  *     cut are dropped.
  *
  * Malformed markup is TOLERATED, never thrown on: a stray `<`, an
  * unterminated comment/script/tag, or quote-imbalanced attributes end
  * or skip cleanly — one broken page must not kill a corpus-scale pass
  * (the [[ImageHeaders]] posture, applied to text).
  *
  * Scale shape: map-only — no shuffle, no state; at 100 TB the
  * extraction pipelines with the scan and the downstream text
  * operators fuse behind it.
  */
object HtmlExtract {

  /** One reassembled block: normalized text + the raw non-whitespace
    * char counts its link-density is judged on. */
  final case class Block(text: String, nChars: Int, nLinkChars: Int)

  private val BlockTags: Set[String] = Set(
    "p", "div", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul", "ol",
    "br", "hr", "table", "thead", "tbody", "tr", "td", "th", "section",
    "article", "header", "footer", "nav", "aside", "main", "blockquote",
    "pre", "form", "figure", "figcaption", "dl", "dt", "dd", "body",
    "html", "head")

  /** Containers whose CONTENT is dropped wholesale. */
  private val DropTags: Set[String] = Set("script", "style", "title")

  private val Entities: Map[String, Char] = Map(
    "amp" -> '&', "lt" -> '<', "gt" -> '>', "quot" -> '"',
    "apos" -> '\'', "nbsp" -> ' ')

  /** Parse `html` into content blocks. Single forward pass; tolerant
    * of malformed markup (see class doc). */
  def blocks(html: String): Vector[Block] = {
    if (html == null) return Vector.empty
    val out = Vector.newBuilder[Block]
    val sb = new StringBuilder
    var nChars = 0
    var nLink = 0
    var linkDepth = 0
    val n = html.length

    def flush(): Unit = {
      if (nChars > 0) out += Block(normalize(sb), nChars, nLink)
      sb.setLength(0); nChars = 0; nLink = 0
    }
    def append(c: Char): Unit = {
      sb.append(c)
      if (!c.isWhitespace) {
        nChars += 1
        if (linkDepth > 0) nLink += 1
      }
    }
    // skip attributes to the closing '>', honoring quoted values (a
    // '>' inside href="a>b" must not end the tag); unterminated input
    // consumes to the end
    def skipTag(from: Int): Int = {
      var i = from
      var quote: Char = 0
      while (i < n) {
        val c = html.charAt(i)
        if (quote != 0) { if (c == quote) quote = 0 }
        else if (c == '"' || c == '\'') quote = c
        else if (c == '>') return i + 1
        i += 1
      }
      n
    }
    def tagNameAt(from: Int): String = {
      var i = from
      val b = new StringBuilder
      while (i < n && (html.charAt(i).isLetterOrDigit)) {
        b.append(Character.toLowerCase(html.charAt(i))); i += 1
      }
      b.toString
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4)
          i = if (e < 0) n else e + 3
        } else if (i + 1 < n && html.charAt(i + 1) == '!') {
          i = skipTag(i + 2) // <!DOCTYPE ...>
        } else {
          val closing = i + 1 < n && html.charAt(i + 1) == '/'
          val nameStart = if (closing) i + 2 else i + 1
          val name = tagNameAt(nameStart)
          if (name.isEmpty) {
            // stray '<' (e.g. "a < b"): literal text, not a tag
            append(c); i += 1
          } else if (!closing && DropTags(name)) {
            // drop content to the matching close tag (case-insensitive
            // in-place scan — no lowercase copy of the whole page per
            // script tag); unterminated -> rest of input is dropped
            val after = skipTag(nameStart + name.length)
            val close = indexOfIgnoreCase(html, s"</$name", after)
            i = if (close < 0) n else skipTag(close + 2 + name.length)
          } else {
            if (name == "a") {
              if (closing) linkDepth = math.max(0, linkDepth - 1)
              else linkDepth += 1
            }
            if (BlockTags(name)) flush()
            i = skipTag(nameStart + name.length)
          }
        }
      } else if (c == '&') {
        // bounded entity scan: name/number then ';' within 10 chars,
        // else a literal ampersand
        val semi = html.indexOf(';', i + 1)
        val decoded: Option[Char] =
          if (semi > i && semi - i <= 10) {
            val body = html.substring(i + 1, semi)
            if (body.startsWith("#x") || body.startsWith("#X"))
              scala.util.Try(Integer.parseInt(body.drop(2), 16).toChar)
                .toOption
            else if (body.startsWith("#"))
              scala.util.Try(body.drop(1).toInt.toChar).toOption
            else Entities.get(body)
          } else None
        decoded match {
          case Some(d) => append(d); i = semi + 1
          case None => append('&'); i += 1
        }
      } else {
        append(c); i += 1
      }
    }
    flush()
    out.result()
  }

  /** Case-insensitive indexOf without copying `s` (`target` must
    * already be lowercase). */
  private def indexOfIgnoreCase(s: String, target: String,
      from: Int): Int = {
    val n = s.length
    val m = target.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var j = 0
      while (j < m &&
        Character.toLowerCase(s.charAt(i + j)) == target.charAt(j)) j += 1
      if (j == m) return i
      i += 1
    }
    -1
  }

  /** Whitespace runs collapse to one space; edges trim (the rendering
    * rule — and DuckDB-replayable as trim(regexp_replace(s,'\s+',' '))). */
  private def normalize(sb: StringBuilder): String = {
    val b = new StringBuilder(sb.length)
    var pendingSpace = false
    var started = false
    var i = 0
    while (i < sb.length) {
      val c = sb.charAt(i)
      if (c.isWhitespace) { if (started) pendingSpace = true }
      else {
        if (pendingSpace) { b.append(' '); pendingSpace = false }
        b.append(c); started = true
      }
      i += 1
    }
    b.toString
  }

  /** Extracted result: kept blocks joined by '\n', plus counts. */
  final case class Extracted(main_text: String, n_blocks: Int,
      n_dropped: Int)

  /** The whole operator on one page: parse, cut blocks whose link
    * density exceeds `maxLinkDensity`, join the survivors. */
  def mainText(html: String, maxLinkDensity: Double): Extracted = {
    val bs = blocks(html)
    val (kept, dropped) = bs.partition(b =>
      b.nLinkChars.toDouble / b.nChars <= maxLinkDensity)
    Extracted(kept.map(_.text).mkString("\n"), kept.size, dropped.size)
  }

  /** DataFrame form: adds (main_text, n_blocks, n_dropped) from
    * `htmlCol`. Map-only — fuses with the scan; no shuffle. */
  def extractMainText(df: DataFrame, htmlCol: Column,
      maxLinkDensity: Double): DataFrame = {
    val fn = udf { html: String =>
      val e = mainText(html, maxLinkDensity)
      (e.main_text, e.n_blocks, e.n_dropped)
    }
    df.withColumn("_x", fn(htmlCol))
      .withColumn("main_text", col("_x._1"))
      .withColumn("n_blocks", col("_x._2"))
      .withColumn("n_dropped", col("_x._3"))
      .drop("_x")
  }
}

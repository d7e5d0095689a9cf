package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Markdown structure extraction — the code/docs sibling of the HTML
  * main-text stage (q240). GitHub dumps, wikis, and README corpora
  * arrive as markdown; a training pipeline needs the prose WITHOUT the
  * code fences (text models), the fences WITH their language tags
  * (code models), and structural signals (headings, links, lists) for
  * quality scoring — all per document, map-only.
  *
  * Implemented subset (documented, deterministic): ATX headings
  * (`#{1,6} `, trailing-# runs stripped per CommonMark), fenced code
  * blocks (``` ``` ``` / `~~~`, 3+ fence chars, closing run at least
  * as long, info-string first token = language, content VERBATIM,
  * unclosed fence runs to EOF and still counts), thematic breaks,
  * blockquote `>` prefixes, `-`/`*`/`+` and `1.`/`1)` list markers,
  * inline code spans (content kept, backticks dropped; unbalanced
  * backtick stays literal), images `![alt](url)` (alt kept),
  * links `[text](url)` (text kept, url recorded), and paired `*`/`_`
  * emphasis runs (equal-length closing run required; unmatched runs
  * stay literal). Setext headings, reference-style links, and HTML
  * blocks are out of scope — a markdown doc is one blob, so the walk
  * is per-row map work with no shuffle at any corpus size.
  *
  * Reference behavior: the reference pipes raw text blobs through its
  * map stage untyped (`/root/reference/mapper.py`); structure-aware
  * markdown handling is this engine's extension.
  */
object Markdown {

  final case class MdStructure(
      plainText: String,
      headings: Vector[(Int, String)],
      codeBlocks: Vector[(String, String)],
      links: Vector[(String, String)],
      nImages: Int,
      nListItems: Int,
      nQuoteLines: Int)

  /** Paired-run emphasis strip: a run of '*' or '_' is removed iff a
    * later run of the SAME char and SAME length exists on the line;
    * otherwise it stays literal. Left-to-right, inner runs handled by
    * the continued scan. */
  private def stripEmphasis(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '*' || c == '_') {
        var run = i
        while (run < s.length && s.charAt(run) == c) run += 1
        val len = run - i
        // find a later run of exactly this char and length
        var j = run
        var close = -1
        while (close < 0 && j < s.length) {
          if (s.charAt(j) == c) {
            var k = j
            while (k < s.length && s.charAt(k) == c) k += 1
            if (k - j == len) close = j else j = k
          } else j += 1
        }
        if (close >= 0) {
          sb.append(s.substring(run, close)) // inner text; delims dropped
          i = close + len
        } else {
          sb.append(s.substring(i, run))
          i = run
        }
      } else { sb.append(c); i += 1 }
    }
    val out = sb.toString
    if (out == s) out else stripEmphasis(out) // nested pairs resolve inward
  }

  /** Inline pass: code spans bind tightest, then images/links, then
    * emphasis. Code-span content is PROTECTED from the emphasis pass
    * (a '*' inside backticks is code, not a delimiter — it must
    * neither strip nor pair with emphasis outside the span). Returns
    * (text, links, nImages). */
  private def inline(s: String): (String, Vector[(String, String)], Int) = {
    val links = Vector.newBuilder[(String, String)]
    var nImages = 0
    // (text, protected): protected segments skip emphasis stripping
    val parts = Vector.newBuilder[(String, Boolean)]
    val sb = new StringBuilder(s.length)
    def flush(): Unit =
      if (sb.nonEmpty) { parts += ((sb.toString, false)); sb.clear() }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '`') {
        val close = s.indexOf('`', i + 1)
        if (close > 0) {
          flush()
          parts += ((s.substring(i + 1, close), true))
          i = close + 1
        } else { sb.append(c); i += 1 }
      } else if (c == '!' && i + 1 < s.length && s.charAt(i + 1) == '[') {
        parseLink(s, i + 1) match {
          case Some((text, _, next)) =>
            sb.append(text); nImages += 1; i = next
          case None => sb.append(c); i += 1
        }
      } else if (c == '[') {
        parseLink(s, i) match {
          case Some((text, url, next)) =>
            sb.append(text); links += ((text, url)); i = next
          case None => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    flush()
    val text = parts.result().map {
      case (t, true) => t
      case (t, false) => stripEmphasis(t)
    }.mkString
    (text, links.result(), nImages)
  }

  /** `[text](url)` starting at the '[' — no nested brackets. */
  private def parseLink(s: String, open: Int): Option[(String, String, Int)] = {
    val closeB = s.indexOf(']', open + 1)
    if (closeB < 0 || closeB + 1 >= s.length || s.charAt(closeB + 1) != '(')
      return None
    val closeP = s.indexOf(')', closeB + 2)
    if (closeP < 0) return None
    Some((s.substring(open + 1, closeB), s.substring(closeB + 2, closeP),
      closeP + 1))
  }

  private def collapseWs(s: String): String =
    s.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")

  /** Thematic break: ≥3 of one char from -*_ with only spaces between. */
  private def isThematicBreak(line: String): Boolean = {
    val t = line.filterNot(_ == ' ')
    t.length >= 3 && (t.forall(_ == '-') || t.forall(_ == '*') ||
      t.forall(_ == '_'))
  }

  private val FenceChars = Set('`', '~')

  /** Full document walk. */
  def parse(md: String): MdStructure = {
    if (md == null)
      return MdStructure("", Vector.empty, Vector.empty, Vector.empty, 0, 0, 0)
    val plain = Vector.newBuilder[String]
    val headings = Vector.newBuilder[(Int, String)]
    val code = Vector.newBuilder[(String, String)]
    val links = Vector.newBuilder[(String, String)]
    var nImages = 0; var nList = 0; var nQuote = 0
    var fenceChar = ' '; var fenceLen = 0; var fenceLang = ""
    var fenceBuf: scala.collection.mutable.ArrayBuffer[String] = null

    def closeFence(): Unit = {
      code += ((fenceLang, fenceBuf.mkString("\n")))
      fenceBuf = null; fenceLen = 0
    }

    md.split("\n", -1).foreach { line =>
      if (fenceBuf != null) {
        val t = line.trim
        if (t.nonEmpty && t.forall(_ == fenceChar) && t.length >= fenceLen)
          closeFence()
        else fenceBuf += line
      } else {
        var run = 0
        if (line.nonEmpty && FenceChars(line.charAt(0))) {
          while (run < line.length && line.charAt(run) == line.charAt(0))
            run += 1
        }
        if (run >= 3) { // opening fence
          fenceChar = line.charAt(0); fenceLen = run
          fenceLang = line.substring(run).trim.split("\\s+").headOption
            .getOrElse("")
          fenceBuf = new scala.collection.mutable.ArrayBuffer[String]
        } else if (line.trim.isEmpty) {
          // block separator
        } else if (isThematicBreak(line)) {
          // dropped
        } else if (line.startsWith("#")) {
          var lvl = 0
          while (lvl < line.length && line.charAt(lvl) == '#') lvl += 1
          if (lvl <= 6 && lvl < line.length && line.charAt(lvl) == ' ') {
            var text = line.substring(lvl).trim
            // strip a trailing closing-# run (must be preceded by space)
            var e = text.length
            while (e > 0 && text.charAt(e - 1) == '#') e -= 1
            if (e < text.length && (e == 0 || text.charAt(e - 1) == ' '))
              text = text.substring(0, e).trim
            val (t, ls, im) = inline(text)
            links ++= ls; nImages += im
            val ct = collapseWs(t)
            headings += ((lvl, ct))
            if (ct.nonEmpty) plain += ct
          } else {
            val (t, ls, im) = inline(line)
            links ++= ls; nImages += im
            val ct = collapseWs(t)
            if (ct.nonEmpty) plain += ct
          }
        } else {
          var content = line
          var quoted = false
          while (content.startsWith(">")) {
            quoted = true
            content = content.substring(1).dropWhile(_ == ' ')
          }
          if (quoted) nQuote += 1
          // list markers
          if (content.length >= 2 && "-*+".indexOf(content.charAt(0)) >= 0 &&
            content.charAt(1) == ' ') {
            nList += 1; content = content.substring(2)
          } else {
            var d = 0
            while (d < content.length && d < 9 &&
              Character.isDigit(content.charAt(d))) d += 1
            if (d > 0 && d + 1 < content.length &&
              (content.charAt(d) == '.' || content.charAt(d) == ')') &&
              content.charAt(d + 1) == ' ') {
              nList += 1; content = content.substring(d + 2)
            }
          }
          val (t, ls, im) = inline(content)
          links ++= ls; nImages += im
          val ct = collapseWs(t)
          if (ct.nonEmpty) plain += ct
        }
      }
    }
    if (fenceBuf != null) closeFence() // unclosed fence: runs to EOF
    MdStructure(plain.result().mkString("\n"), headings.result(),
      code.result(), links.result(), nImages, nList, nQuote)
  }

  /** Doc-level structure frame: one row per input row with the prose,
    * the heading outline, code-fence stats, and link/list/quote
    * counts. Map-only — no shuffle at any corpus size. */
  def extractStructure(df: DataFrame, idCol: String, mdCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol), col(mdCol)).mapPartitions { it =>
      it.map { row =>
        val md = row.getAs[String](mdCol)
        val s = parse(md)
        (row.getLong(0), s.plainText,
          s.headings.map { case (l, t) => s"$l:$t" }.mkString(" / "),
          s.headings.size.toLong, s.codeBlocks.size.toLong,
          s.codeBlocks.map(_._1).filter(_.nonEmpty).distinct.sorted
            .mkString(","),
          s.codeBlocks.map(_._2.length.toLong).sum,
          s.links.size.toLong, s.links.headOption.map(_._2).getOrElse(""),
          s.nImages.toLong, s.nListItems.toLong, s.nQuoteLines.toLong)
      }
    }.toDF("doc_id", "plain_text", "toc", "n_headings", "n_code_blocks",
      "code_langs", "n_code_chars", "n_links", "first_link_url",
      "n_images", "n_list_items", "n_quote_lines")
  }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // markdown structure extraction: each doc becomes a realistic
    // README — ATX headings (one with a trailing-# close), emphasis,
    // inline code, a fenced scala block whose body is FULL of markdown
    // traps (an ATX line, a link, emphasis — all must stay verbatim,
    // pinned by the hashed n_code_chars), list items (unordered +
    // ordered), a blockquote, a thematic break, an image, and a tilde
    // fence with no info string. The oracle replays the whole plain-
    // text reassembly plus every count arithmetically.
    QueryDef(
      "q294_markdown_structure",
      (s, dir) => {
        import s.implicits._
        val pages = Tables.load(s, dir, "documents")
          .select($"doc_id", $"text")
          .fanout.as[(Long, String)]
          .map { case (id, text) =>
            (id,
              s"""# Doc $id
                 |Intro *emphasized* text with `inline code` here.
                 |
                 |## Part one ##
                 |$text
                 |
                 |```scala
                 |# not a heading
                 |val x = [not](a-link) * 3
                 |```
                 |
                 |- item one with [a link](https://ex.example/$id)
                 |- item two **bold** tail
                 |1. third item
                 |
                 |> quoted line ${id % 5}
                 |---
                 |Outro _tail_ paragraph with ![fig ${id % 3}](i$id.png).
                 |~~~
                 |plain fence $id
                 |~~~""".stripMargin)
          }
          .toDF("doc_id", "md")
        Markdown.extractStructure(pages, "doc_id", "md").orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               'Doc ' || doc_id || chr(10)
                 || 'Intro emphasized text with inline code here.' || chr(10)
                 || 'Part one' || chr(10)
                 || trim(regexp_replace(text, '\s+', ' ', 'g')) || chr(10)
                 || 'item one with a link' || chr(10)
                 || 'item two bold tail' || chr(10)
                 || 'third item' || chr(10)
                 || 'quoted line ' || (doc_id % 5) || chr(10)
                 || 'Outro tail paragraph with fig ' || (doc_id % 3) || '.'
                 AS plain_text,
               '1:Doc ' || doc_id || ' / 2:Part one' AS toc,
               CAST(2 AS BIGINT) AS n_headings,
               CAST(2 AS BIGINT) AS n_code_blocks,
               'scala' AS code_langs,
               CAST(41 + 12 + length(CAST(doc_id AS VARCHAR)) AS BIGINT)
                 AS n_code_chars,
               CAST(1 AS BIGINT) AS n_links,
               'https://ex.example/' || doc_id AS first_link_url,
               CAST(1 AS BIGINT) AS n_images,
               CAST(3 AS BIGINT) AS n_list_items,
               CAST(1 AS BIGINT) AS n_quote_lines
        FROM documents
        ORDER BY doc_id""")))
}

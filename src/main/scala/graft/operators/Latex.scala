package graft.operators

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** LaTeX source stripping — the arXiv-corpus sibling of the HTML
  * (q240) and Markdown (q294) extraction stages. A TeX dump is useless
  * to a text model until comments, math, floats, and citation
  * machinery are gone and the prose remains.
  *
  * Documented subset (deterministic): `%` comments to end of line
  * (`\%` is an escaped literal), inline `$…$` and display `$$…$$` /
  * `\[…\]` math dropped (counted), `\begin{env}…\end{env}` bodies
  * dropped for float/math envs (equation, align, figure, table,
  * tabular — counted) while other envs keep their content, sectioning
  * commands keep their argument as a heading line (counted),
  * `\cite/\ref/\label` dropped with their argument (cites counted),
  * `\textbf/\emph/\textit/\texttt` keep their argument, any other
  * `\cmd{arg}` keeps the arg, bare `\cmd` drops, `\\` breaks the
  * line, `\%`/`\&`/`\_`/`\#` unescape. Unclosed constructs run to
  * EOF. Per-row char walk, map-only. */
object Latex {

  final case class TexDoc(plainText: String, nSections: Int, nMath: Int,
      nCites: Int, nEnvsDropped: Int)

  private val dropEnvs =
    Set("equation", "equation*", "align", "align*", "figure", "table",
      "tabular", "verbatim")
  private val sectionCmds =
    Set("section", "subsection", "subsubsection", "paragraph", "chapter")
  private val dropArgCmds = Set("cite", "citep", "citet", "ref", "eqref",
    "label", "usepackage", "documentclass", "bibliography",
    "bibliographystyle", "input", "include")

  def strip(tex: String): TexDoc = {
    if (tex == null) return TexDoc("", 0, 0, 0, 0)
    val sb = new StringBuilder(tex.length)
    var nSections = 0; var nMath = 0; var nCites = 0; var nEnvs = 0

    def readName(s: String, from: Int): (String, Int) = {
      var j = from
      while (j < s.length && (Character.isLetter(s.charAt(j)) ||
        (j > from && s.charAt(j) == '*'))) j += 1
      (s.substring(from, j), j)
    }

    /** Balanced brace arg; backslash-escaped chars (incl. \{ \}) do
      * not move the depth, so `\textbf{set \{x\} ok}` closes where it
      * should instead of swallowing the document. */
    def readBraceArg(s: String, from: Int): Option[(String, Int)] = {
      var j = from
      while (j < s.length && s.charAt(j) == ' ') j += 1
      if (j >= s.length || s.charAt(j) != '{') return None
      var depth = 1; j += 1
      val start = j
      while (j < s.length && depth > 0) {
        val c = s.charAt(j)
        if (c == '\\' && j + 1 < s.length) j += 2
        else {
          if (c == '{') depth += 1
          else if (c == '}') depth -= 1
          j += 1
        }
      }
      Some((s.substring(start, if (depth == 0) j - 1 else j), j))
    }

    // recursive walk: kept brace arguments re-enter the walk, so
    // \emph{see \cite{x} and $a+b$} strips its nested machinery too
    def walk(tex: String, depth: Int): Unit = {
      if (depth > 32) { sb.append(tex); return }
      var i = 0
      val n = tex.length
      while (i < n) {
      val c = tex.charAt(i)
      if (c == '%') { // comment to EOL (escaped \% handled under '\\')
        while (i < n && tex.charAt(i) != '\n') i += 1
      } else if (c == '$') {
        val display = i + 1 < n && tex.charAt(i + 1) == '$'
        val delim = if (display) "$$" else "$"
        val close = tex.indexOf(delim, i + delim.length)
        nMath += 1
        i = if (close < 0) n else close + delim.length
      } else if (c == '\\') {
        if (i + 1 >= n) i = n
        else {
          val next = tex.charAt(i + 1)
          if (next == '\\') { sb.append('\n'); i += 2 }
          else if ("%&_#{}".indexOf(next) >= 0) { sb.append(next); i += 2 }
          else if (next == '[') { // display math \[ ... \]
            val close = tex.indexOf("\\]", i + 2)
            nMath += 1
            i = if (close < 0) n else close + 2
          } else if (Character.isLetter(next)) {
            val (name, after) = readName(tex, i + 1)
            if (name == "begin") {
              readBraceArg(tex, after) match {
                case Some((env, afterArg)) if dropEnvs(env) =>
                  val endTag = s"\\end{$env}"
                  val close = tex.indexOf(endTag, afterArg)
                  nEnvs += 1
                  i = if (close < 0) n else close + endTag.length
                case Some((_, afterArg)) => i = afterArg // keep content
                case None => i = after
              }
            } else if (name == "end") {
              i = readBraceArg(tex, after).map(_._2).getOrElse(after)
            } else if (sectionCmds(name)) {
              readBraceArg(tex, after) match {
                case Some((arg, afterArg)) =>
                  nSections += 1
                  sb.append('\n'); walk(arg, depth + 1); sb.append('\n')
                  i = afterArg
                case None => i = after
              }
            } else if (dropArgCmds(name)) {
              if (name.startsWith("cite")) nCites += 1
              i = readBraceArg(tex, after).map(_._2).getOrElse(after)
            } else {
              // formatting or unknown command: re-walk the brace arg's
              // content (nested cites/math must still strip), else drop
              readBraceArg(tex, after) match {
                case Some((arg, afterArg)) =>
                  walk(arg, depth + 1); i = afterArg
                case None => i = after
              }
            }
          } else i += 2 // unknown escape: drop both
        }
      } else { sb.append(c); i += 1 }
      }
    }
    walk(tex, 0)
    // collapse whitespace per line, drop empty lines
    val lines = sb.toString.split("\n")
      .map(_.trim.split("\\s+").filter(_.nonEmpty).mkString(" "))
      .filter(_.nonEmpty)
    TexDoc(lines.mkString("\n"), nSections, nMath, nCites, nEnvs)
  }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // LaTeX strip: each doc becomes a paper skeleton — documentclass
    // preamble dropped, a section heading, prose with \emph + an
    // escaped \%, a comment line, inline + display math, a cite, a
    // dropped figure environment whose caption must NOT leak, and an
    // abstract env whose content survives. The oracle replays the full
    // reassembly and all four counts.
    QueryDef(
      "q319_latex_strip",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text")
          .fanout.as[(Long, String)]
          .map { case (id, text) =>
            val tex =
              s"""\\documentclass{article}
                 |\\usepackage{amsmath}
                 |\\begin{document}
                 |\\begin{abstract}
                 |summary ${id % 9}
                 |\\end{abstract}
                 |\\section{Intro $id}
                 |% a comment that must vanish
                 |We show \\emph{key} results with 100\\% confidence.
                 |$text
                 |Let $$x_$id$$ and $$$$y=$id$$$$ hold \\cite{ref$id}.
                 |\\begin{figure}
                 |\\caption{leaky caption $id}
                 |\\end{figure}
                 |Done.
                 |\\end{document}""".stripMargin
            val t = Latex.strip(tex)
            (id, t.plainText, t.nSections.toLong, t.nMath.toLong,
              t.nCites.toLong, t.nEnvsDropped.toLong)
          }
          .toDF("doc_id", "plain_text", "n_sections", "n_math",
            "n_cites", "n_envs_dropped")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               'summary ' || (doc_id % 9) || chr(10)
                 || 'Intro ' || doc_id || chr(10)
                 || 'We show key results with 100% confidence.' || chr(10)
                 || trim(regexp_replace(text, '\s+', ' ', 'g')) || chr(10)
                 || 'Let and hold .' || chr(10)
                 || 'Done.' AS plain_text,
               CAST(1 AS BIGINT) AS n_sections,
               CAST(2 AS BIGINT) AS n_math,
               CAST(1 AS BIGINT) AS n_cites,
               CAST(1 AS BIGINT) AS n_envs_dropped
        FROM documents
        ORDER BY doc_id""")))
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Source-code curation — The-Stack-style filters for code corpora.
  *
  * A code-model pipeline needs, per file and before any tokenization:
  * what language is this (routing + per-language quotas), what license
  * governs it (permissive-only corpora), and what does it look like
  * with comments stripped (dedup against comment-only edits; comment
  * ratio as a quality/doc-density signal). All three are per-file map
  * work — no shuffle at any corpus size.
  *
  * Reference behavior: the reference streams opaque file blobs through
  * its map stage (`/root/reference/mapper.py`); code-aware curation is
  * this engine's extension.
  */
object Code {

  // ----------------------------------------------------- language id

  /** Extension → language (The Stack keys its corpus this way). */
  val extLang: Map[String, String] = Map(
    "py" -> "python", "scala" -> "scala", "sc" -> "scala",
    "js" -> "javascript", "mjs" -> "javascript", "ts" -> "typescript",
    "rs" -> "rust", "go" -> "go", "java" -> "java",
    "c" -> "c", "h" -> "c", "cpp" -> "cpp", "cc" -> "cpp",
    "hpp" -> "cpp", "rb" -> "ruby", "sh" -> "shell", "bash" -> "shell",
    "pl" -> "perl", "sql" -> "sql", "md" -> "markdown",
    "json" -> "json", "yaml" -> "yaml", "yml" -> "yaml",
    "xml" -> "xml", "html" -> "html", "css" -> "css")

  /** Interpreter basename (version suffix stripped) → language. */
  val shebangLang: Map[String, String] = Map(
    "python" -> "python", "bash" -> "shell", "sh" -> "shell",
    "zsh" -> "shell", "node" -> "javascript", "ruby" -> "ruby",
    "perl" -> "perl")

  /** (language, method) — extension wins when known, else the shebang
    * line, else unknown. `method` ∈ ext | shebang | none. */
  def detectLanguage(path: String, content: String): (String, String) = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    val dot = base.lastIndexOf('.')
    val ext = if (dot > 0) base.substring(dot + 1).toLowerCase else ""
    extLang.get(ext) match {
      case Some(l) => (l, "ext")
      case None =>
        val sb = shebang(content)
        sb.map((_, "shebang")).getOrElse(("unknown", "none"))
    }
  }

  private def shebang(content: String): Option[String] = {
    if (content == null || !content.startsWith("#!")) return None
    val nl = content.indexOf('\n')
    val line = if (nl < 0) content else content.substring(0, nl)
    val toks = line.substring(2).trim.split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return None
    val cmd0 = toks(0).substring(toks(0).lastIndexOf('/') + 1)
    val cmd =
      if (cmd0 == "env" && toks.length > 1)
        toks(1).substring(toks(1).lastIndexOf('/') + 1)
      else cmd0
    shebangLang.get(cmd.replaceAll("[0-9.]+$", ""))
  }

  // ------------------------------------------------ license detection

  /** Phrase table scanned IN ORDER after the SPDX tag (first hit
    * wins); phrases are the canonical opening lines of each license
    * text, matched anywhere in the header window. */
  val licensePhrases: Seq[(String, String)] = Seq(
    ("Permission is hereby granted, free of charge" -> "MIT"),
    ("Licensed under the Apache License, Version 2.0" -> "Apache-2.0"),
    ("Redistribution and use in source and binary forms" -> "BSD-3-Clause"),
    ("GNU General Public License" -> "GPL"),
    ("Mozilla Public License" -> "MPL-2.0"))

  val permissive: Set[String] =
    Set("MIT", "Apache-2.0", "BSD-3-Clause", "BSD-2-Clause", "ISC",
      "Unlicense", "CC0-1.0")

  /** (license, method) from the first `window` chars: an explicit
    * `SPDX-License-Identifier:` tag wins; else the phrase table; else
    * (none, none). `method` ∈ spdx | phrase | none. */
  def detectLicense(content: String, window: Int = 1000): (String, String) = {
    if (content == null) return ("none", "none")
    val head = content.substring(0, math.min(window, content.length))
    val tag = "SPDX-License-Identifier:"
    val ti = head.indexOf(tag)
    if (ti >= 0) {
      val rest = head.substring(ti + tag.length)
      val id = rest.trim.takeWhile(c => !c.isWhitespace && c != '*')
      if (id.nonEmpty) return (id, "spdx")
    }
    licensePhrases.collectFirst {
      case (phrase, id) if head.contains(phrase) => (id, "phrase")
    }.getOrElse(("none", "none"))
  }

  // ----------------------------------------------- comment stripping

  /** String-literal-aware comment strip. Families:
    *  - "c":    `//` line + `/* */` block comments; `"…"`/`'…'`
    *            literals with backslash escapes shield both markers
    *  - "hash": `#` line comments; same literal shielding
    * A line comment ends BEFORE its newline (the newline survives); a
    * block comment swallows its internal newlines (the classic
    * line-merge); an unterminated block comment or string runs to EOF
    * verbatim-consumed / verbatim-kept respectively. Returns
    * (stripped, nCommentChars) where nCommentChars counts every char
    * consumed as comment INCLUDING the markers. */
  def stripComments(content: String, family: String): (String, Long) = {
    if (content == null) return ("", 0L)
    val c = family == "c"
    val sb = new StringBuilder(content.length)
    var nComment = 0L
    var i = 0
    val n = content.length
    var quote: Char = 0 // active string-literal delimiter, 0 = none
    var inBlock = false
    var inLine = false
    while (i < n) {
      val ch = content.charAt(i)
      if (inLine) {
        if (ch == '\n') { inLine = false; sb.append(ch) }
        else nComment += 1
        i += 1
      } else if (inBlock) {
        nComment += 1
        if (ch == '*' && i + 1 < n && content.charAt(i + 1) == '/') {
          nComment += 1; inBlock = false; i += 2
        } else i += 1
      } else if (quote != 0) {
        sb.append(ch)
        if (ch == '\\' && i + 1 < n) { sb.append(content.charAt(i + 1)); i += 2 }
        else { if (ch == quote) quote = 0; i += 1 }
      } else if (ch == '"' || ch == '\'') {
        quote = ch; sb.append(ch); i += 1
      } else if (c && ch == '/' && i + 1 < n && content.charAt(i + 1) == '/') {
        inLine = true; nComment += 2; i += 2
      } else if (c && ch == '/' && i + 1 < n && content.charAt(i + 1) == '*') {
        inBlock = true; nComment += 2; i += 2
      } else if (!c && ch == '#') {
        inLine = true; nComment += 1; i += 1
      } else { sb.append(ch); i += 1 }
    }
    (sb.toString, nComment)
  }

  /** Per-file strip + metrics: stripped text, comment chars, and the
    * stripped source-line count (lines still holding non-whitespace). */
  def stripWithMetrics(df: DataFrame, idCol: String, srcCol: String,
      family: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol), col(srcCol)).mapPartitions { it =>
      it.map { row =>
        val (stripped, nc) = stripComments(row.getString(1), family)
        val sloc = stripped.split("\n", -1).count(_.exists(!_.isWhitespace))
        (row.getLong(0), stripped, nc, sloc.toLong)
      }
    }.toDF(idCol, "stripped", "n_comment_chars", "sloc")
  }

  // ---------------------------------------------- clone normalization

  /** Reserved words that survive alpha-normalization (a small
    * cross-language core — the fixture languages' shared keywords). */
  val keywords: Set[String] = Set(
    "if", "else", "for", "while", "return", "int", "long", "float",
    "double", "void", "var", "val", "def", "fun", "class", "struct",
    "new", "null", "true", "false")

  /** Type-2 clone key: identifiers alpha-rename to %0, %1, … in
    * first-occurrence order (keywords, literals, and operators kept),
    * whitespace collapses. Two fragments differing only by consistent
    * identifier renaming normalize to the SAME string — the classic
    * type-2 clone-detection normalization (Roy & Cordy's taxonomy,
    * public). Run it on comment-stripped source ([[stripComments]]) so
    * comment edits don't break clone groups either. */
  def alphaNormalize(src: String): String = {
    if (src == null) return ""
    val sb = new StringBuilder(src.length)
    val names = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var i = 0
    val n = src.length
    while (i < n) {
      val c = src.charAt(i)
      if (c == '"' || c == '\'') {
        // string/char literals verbatim — their contents are values,
        // not identifiers (same shielding as stripComments)
        sb.append(c); i += 1
        var closed = false
        while (i < n && !closed) {
          val q = src.charAt(i)
          sb.append(q)
          if (q == '\\' && i + 1 < n) { sb.append(src.charAt(i + 1)); i += 2 }
          else { closed = q == c; i += 1 }
        }
      } else if (Character.isDigit(c)) {
        // numeric literal: consume the whole Java-style number token
        // (0xFF, 1_000L, 1.5e-3f) verbatim so its letters never rename
        while (i < n && (Character.isLetterOrDigit(src.charAt(i)) ||
          src.charAt(i) == '.' || src.charAt(i) == '_')) {
          sb.append(src.charAt(i)); i += 1
        }
      } else if (c == '%') {
        sb.append("%%"); i += 1 // escape: literal '%' can't forge a %N
      } else if (Character.isJavaIdentifierStart(c)) {
        val start = i
        while (i < n && Character.isJavaIdentifierPart(src.charAt(i))) i += 1
        val word = src.substring(start, i)
        if (keywords(word)) sb.append(word)
        else {
          val idx = names.getOrElseUpdate(word, names.size)
          sb.append('%').append(idx)
        }
      } else if (Character.isWhitespace(c)) {
        // collapse runs; a single space only between word-ish chars
        while (i < n && Character.isWhitespace(src.charAt(i))) i += 1
        if (sb.nonEmpty && i < n &&
          Character.isJavaIdentifierPart(src.charAt(i)) &&
          Character.isJavaIdentifierPart(sb.charAt(sb.length - 1)))
          sb.append(' ')
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // language routing: five planted file shapes — known extension
    // (beats a shebang when both exist), env-shebang, plain shebang
    // with a version suffix, unknown extension, no signal at all. The
    // oracle replays the whole decision table.
    QueryDef(
      "q295_code_language_id",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text")
          .fanout.as[(Long, String)]
          .map { case (id, text) =>
            val (path, content) = (id % 5) match {
              case 0 => (s"src/m$id.py", s"#!/usr/bin/env node\n$text")
              case 1 => (s"bin/run$id", s"#!/usr/bin/env python3\n$text")
              case 2 => (s"a/b$id.rs", s"fn main() {} // $text")
              case 3 => (s"x$id.zzz", text)
              case _ => (s"tool$id", s"#!/bin/bash\n$text")
            }
            val (lang, method) = Code.detectLanguage(path, content)
            (id, path, lang, method)
          }
          .toDF("doc_id", "path", "lang", "method")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CASE doc_id % 5
                 WHEN 0 THEN 'src/m' || doc_id || '.py'
                 WHEN 1 THEN 'bin/run' || doc_id
                 WHEN 2 THEN 'a/b' || doc_id || '.rs'
                 WHEN 3 THEN 'x' || doc_id || '.zzz'
                 ELSE 'tool' || doc_id END AS path,
               CASE doc_id % 5
                 WHEN 0 THEN 'python' WHEN 1 THEN 'python'
                 WHEN 2 THEN 'rust' WHEN 3 THEN 'unknown'
                 ELSE 'shell' END AS lang,
               CASE doc_id % 5
                 WHEN 0 THEN 'ext' WHEN 1 THEN 'shebang'
                 WHEN 2 THEN 'ext' WHEN 3 THEN 'none'
                 ELSE 'shebang' END AS method
        FROM documents
        ORDER BY doc_id""")),

    // license gate: SPDX tag (wins even when a GPL phrase is also
    // present — the planted trap on id%4=0), MIT + Apache phrase
    // forms, and a bare GPL mention; permissive verdict drives the
    // keep/drop decision a permissive-only corpus makes.
    QueryDef(
      "q296_code_license_gate",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text")
          .fanout.as[(Long, String)]
          .map { case (id, text) =>
            val header = (id % 4) match {
              case 0 =>
                s"// SPDX-License-Identifier: MIT\n// GNU General Public License mention\n$text"
              case 1 =>
                s"/* Permission is hereby granted, free of charge */\n$text"
              case 2 =>
                s"# Licensed under the Apache License, Version 2.0\n$text"
              case _ => s"// GNU General Public License v3\n$text"
            }
            val (lic, method) = Code.detectLicense(header)
            (id, lic, method, Code.permissive.contains(lic))
          }
          .toDF("doc_id", "license", "method", "permissive")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CASE doc_id % 4
                 WHEN 0 THEN 'MIT' WHEN 1 THEN 'MIT'
                 WHEN 2 THEN 'Apache-2.0' ELSE 'GPL' END AS license,
               CASE doc_id % 4
                 WHEN 0 THEN 'spdx' ELSE 'phrase' END AS method,
               doc_id % 4 <> 3 AS permissive
        FROM documents
        ORDER BY doc_id""")),

    // type-2 clone detection: three structural shapes whose IDENTIFIER
    // NAMES vary with every doc_id (and a doc-text comment stripped
    // first), alpha-normalizing to three constant clone keys — the
    // oracle replays the exact normalized strings and the clone-group
    // sizes. Grouping shuffles on the normalized key (clone-class
    // bounded), never on raw source.
    QueryDef(
      "q313_code_clone_groups",
      (s, dir) => {
        import s.implicits._
        val keyed = Tables.load(s, dir, "documents")
          .select($"doc_id", $"text")
          .fanout.as[(Long, String)]
          .map { case (id, text) =>
            val src = (id % 3) match {
              case 0 => s"// $text\nint alpha$id = beta$id + alpha$id;"
              case 1 => s"if (x$id > y$id) return y$id; // $text"
              case _ => s"while (k$id) k$id = k$id - 1;"
            }
            (id, Code.alphaNormalize(Code.stripComments(src, "c")._1))
          }
          .toDF("doc_id", "clone_key")
        keyed.withColumn("group_size",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy($"clone_key")))
          .orderBy($"doc_id")
      },
      Some("""
        WITH c AS (
          SELECT CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n0,
                 CAST(sum(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n2
          FROM documents)
        SELECT doc_id,
               CASE doc_id % 3
                 WHEN 0 THEN 'int %0=%1+%0;'
                 WHEN 1 THEN 'if(%0>%1)return %1;'
                 ELSE 'while(%0)%0=%0-1;' END AS clone_key,
               CASE doc_id % 3 WHEN 0 THEN n0 WHEN 1 THEN n1 ELSE n2 END
                 AS group_size
        FROM documents CROSS JOIN c
        ORDER BY doc_id""")),

    // comment strip: C-family source whose line 1 comment carries the
    // doc text, a string literal holding a '//' trap, and a block
    // comment spanning a newline (the classic line-merge). The oracle
    // replays the EXACT stripped text and the comment-char count
    // (39 + len(text)) — any state-machine slip (string shield, block
    // newline swallow, marker double-count) shifts one of them.
    QueryDef(
      "q297_code_comment_strip",
      (s, dir) => {
        import s.implicits._
        val files = Tables.load(s, dir, "documents")
          .select($"doc_id", $"text")
          .fanout.as[(Long, String)]
          .map { case (id, text) =>
            (id,
              s"""// lead $text
                 |int v$id = $id;
                 |s = "str // not comment";
                 |/* block ${id % 7}
                 |still block */ int tail = 1; // end""".stripMargin)
          }
          .toDF("doc_id", "src")
        Code.stripWithMetrics(files, "doc_id", "src", "c")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               chr(10) || 'int v' || doc_id || ' = ' || doc_id || ';'
                 || chr(10) || 's = "str // not comment";' || chr(10)
                 || ' int tail = 1; ' AS stripped,
               CAST(39 + length(text) AS BIGINT) AS n_comment_chars,
               CAST(3 AS BIGINT) AS sloc
        FROM documents
        ORDER BY doc_id""")))
}

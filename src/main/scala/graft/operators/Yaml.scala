package graft.operators

/** YAML subset parser (public spec: yaml.org 1.2) for the two
  * populations a crawl actually hits — Markdown FRONT MATTER
  * (`---` fenced blocks on blogs/docs/static sites) and small config
  * files. YAML-complete parsing is famously unbounded; this module
  * implements the subset those populations use and REJECTS the rest
  * (decode-to-None, never plausible-wrong):
  *
  *  - block mappings with indentation nesting (spaces only — a tab in
  *    indentation is an error per spec);
  *  - block sequences (`- item`, including nested maps under a dash);
  *  - one-line FLOW sequences of scalars (`tags: [a, b, c]`);
  *  - scalars: plain (typed: int / float / bool / null per core
  *    schema), single-quoted (`''` escape), double-quoted (backslash
  *    escapes incl. \\uXXXX), and block literal `|` / folded `>` with
  *    clip chomping;
  *  - comments (`#` at scalar-start or after whitespace) and blank
  *    lines.
  *
  * OUT of scope and rejecting: anchors/aliases (`&`/`*` — aliasing
  * can bomb), tags (`!!`), flow mappings, multi-line flow, `?`
  * complex keys, directives. Duplicate keys reject (the spec makes
  * them an error; silently keeping either is plausible-wrong).
  */
object Yaml {

  sealed trait YVal
  final case class YStr(v: String) extends YVal
  final case class YNum(v: Double) extends YVal
  final case class YBool(v: Boolean) extends YVal
  case object YNull extends YVal
  final case class YList(items: Vector[YVal]) extends YVal
  /** Insertion-ordered; duplicate keys reject at parse. */
  final case class YMap(fields: Vector[(String, YVal)]) extends YVal {
    def get(key: String): Option[YVal] =
      fields.collectFirst { case (k, v) if k == key => v }
  }

  private final case class Line(indent: Int, text: String)

  /** Strip comments outside quotes; None = malformed quoting. */
  private def stripComment(s: String): Option[String] = {
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote == '\'') {
        if (c == '\'') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 1
          else quote = 0
        }
      } else if (quote == '"') {
        if (c == '\\') i += 1
        else if (c == '"') quote = 0
      } else {
        if (c == '\'' || c == '"') quote = c
        else if (c == '#' && (i == 0 || s.charAt(i - 1) == ' ' ||
          s.charAt(i - 1) == '\t'))
          return Some(s.substring(0, i).stripTrailing())
      }
      i += 1
    }
    if (quote != 0) None else Some(s.stripTrailing())
  }

  /** One scalar from its text form (plain/quoted), core-schema typed. */
  private def scalar(raw: String): Option[YVal] = {
    val t = raw.trim
    if (t.isEmpty) return Some(YNull)
    if (t.startsWith("&") || t.startsWith("*") || t.startsWith("!"))
      return None // anchors/aliases/tags out of scope
    if (t.startsWith("'")) {
      if (t.length < 2 || !t.endsWith("'")) return None
      val body = t.substring(1, t.length - 1)
      // '' is the only escape; a lone ' inside is malformed
      val sb = new StringBuilder
      var i = 0
      while (i < body.length) {
        if (body.charAt(i) == '\'') {
          if (i + 1 < body.length && body.charAt(i + 1) == '\'') {
            sb.append('\''); i += 2
          } else return None
        } else { sb.append(body.charAt(i)); i += 1 }
      }
      return Some(YStr(sb.toString))
    }
    if (t.startsWith("\"")) {
      if (t.length < 2 || !t.endsWith("\"")) return None
      val body = t.substring(1, t.length - 1)
      val sb = new StringBuilder
      var i = 0
      while (i < body.length) {
        val c = body.charAt(i)
        if (c == '\\') {
          if (i + 1 >= body.length) return None
          body.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case '"' => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '0' => sb.append('\u0000'); i += 2
            case 'u' =>
              if (i + 6 > body.length) return None
              val hex = body.substring(i + 2, i + 6)
              val v = try Integer.parseInt(hex, 16)
                catch { case _: Exception => return None }
              sb.append(v.toChar); i += 6
            case _ => return None
          }
        } else if (c == '"') return None // unescaped quote inside
        else { sb.append(c); i += 1 }
      }
      return Some(YStr(sb.toString))
    }
    // plain scalar: core-schema resolution
    t match {
      case "null" | "Null" | "NULL" | "~" => Some(YNull)
      case "true" | "True" | "TRUE" => Some(YBool(true))
      case "false" | "False" | "FALSE" => Some(YBool(false))
      case _ =>
        if (t.matches("[-+]?[0-9]+")) t.toLongOption.map(v => YNum(v.toDouble))
          .orElse(Some(YStr(t)))
        else if (t.matches("[-+]?([0-9]+\\.[0-9]*|\\.[0-9]+)([eE][-+]?[0-9]+)?"))
          t.toDoubleOption.map(YNum.apply).orElse(Some(YStr(t)))
        else Some(YStr(t))
    }
  }

  /** A one-line flow sequence of scalars: `[a, "b, c", 3]`. */
  private def flowSeq(t: String): Option[YVal] = {
    if (!t.startsWith("[") || !t.endsWith("]")) return None
    val body = t.substring(1, t.length - 1).trim
    if (body.isEmpty) return Some(YList(Vector.empty))
    if (body.contains("[") || body.contains("{")) return None // no nesting
    // split on commas outside quotes
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var i = 0
    while (i < body.length) {
      val c = body.charAt(i)
      if (quote != 0) {
        cur.append(c)
        if (quote == '"' && c == '\\' && i + 1 < body.length) {
          cur.append(body.charAt(i + 1)); i += 1
        } else if (c == quote) quote = 0
      } else if (c == '\'' || c == '"') { quote = c; cur.append(c) }
      else if (c == ',') { items += cur.toString; cur.clear() }
      else cur.append(c)
      i += 1
    }
    if (quote != 0) return None
    items += cur.toString
    val vs = items.map(it => scalar(it).getOrElse(return None))
    Some(YList(vs.toVector))
  }

  /** Parse lines[from until) at exactly `indent`, as a mapping or a
    * sequence; returns (value, next line index). */
  private def block(lines: Vector[Line], from: Int, until: Int,
      indent: Int, depth: Int): Option[(YVal, Int)] = {
    if (depth > 32 || from >= until) return None
    val isSeq = lines(from).text.startsWith("- ") ||
      lines(from).text == "-"
    val mapFields = Vector.newBuilder[(String, YVal)]
    val seen = scala.collection.mutable.Set.empty[String]
    val seqItems = Vector.newBuilder[YVal]
    var i = from
    while (i < until && (lines(i).text.isEmpty ||
      lines(i).indent >= indent)) {
      val ln = lines(i)
      if (ln.text.isEmpty) { i += 1 } // blank line between entries
      else {
      if (ln.indent > indent) return None // stray deeper line
      if (isSeq) {
        if (!(ln.text.startsWith("- ") || ln.text == "-")) return None
        val rest = if (ln.text == "-") "" else ln.text.substring(2).trim
        if (rest.isEmpty) {
          // nested block under the dash
          val (v, next) = childBlock(lines, i + 1, until, indent, depth)
            .getOrElse(return None)
          seqItems += v
          i = next
        } else if (!rest.startsWith("\"") && !rest.startsWith("'") &&
          (rest.contains(": ") || rest.endsWith(":"))) {
          // a compact map on the dash line — but a QUOTED scalar item
          // containing ': ' is a scalar, not a map
          // compact map starting on the dash line: re-enter as a map
          // by treating the rest as a line at indent+2
          val synth = Line(indent + 2, rest)
          var j = i + 1
          while (j < until && (lines(j).text.isEmpty ||
            lines(j).indent > indent)) j += 1
          while (j > i + 1 && lines(j - 1).text.isEmpty) j -= 1
          val sub = (synth +: lines.slice(i + 1, j))
          val (v, _) = block(sub, 0, sub.length, indent + 2, depth + 1)
            .getOrElse(return None)
          seqItems += v
          i = j
        } else {
          seqItems += (flowSeq(rest).getOrElse(
            scalar(rest).getOrElse(return None)))
          i += 1
        }
      } else {
        // mapping entry: key: value | key: | key: >-style block
        val colon = findKeyColon(ln.text).getOrElse(return None)
        val key = unquoteKey(ln.text.substring(0, colon).trim)
          .getOrElse(return None)
        if (!seen.add(key)) return None // duplicate key
        val rest = ln.text.substring(colon + 1).trim
        if (rest.isEmpty) {
          if (i + 1 < until && lines(i + 1).indent > indent) {
            val (v, next) = childBlock(lines, i + 1, until, indent, depth)
              .getOrElse(return None)
            mapFields += key -> v
            i = next
          } else { mapFields += key -> YNull; i += 1 }
        } else if (rest == "|" || rest == ">" || rest == "|-" ||
          rest == ">-") {
          // block scalar: lines more indented than the key
          var j = i + 1
          val body = scala.collection.mutable.ArrayBuffer.empty[String]
          var bodyIndent = -1
          while (j < until && (lines(j).indent > indent ||
            lines(j).text.isEmpty)) {
            if (lines(j).text.nonEmpty) {
              if (bodyIndent < 0) bodyIndent = lines(j).indent
              if (lines(j).indent < bodyIndent) return None
              body += (" " * (lines(j).indent - bodyIndent)) +
                lines(j).text
            } else body += ""
            j += 1
          }
          while (body.nonEmpty && body.last.isEmpty) body.remove(body.length - 1)
          val joined =
            if (rest.startsWith("|")) body.mkString("\n")
            else {
              // folded: lines join with single spaces, blank lines
              // become newlines
              val sb = new StringBuilder
              body.foreach { l =>
                if (l.isEmpty) sb.append('\n')
                else {
                  if (sb.nonEmpty && sb.charAt(sb.length - 1) != '\n')
                    sb.append(' ')
                  sb.append(l)
                }
              }
              sb.toString
            }
          val chomped =
            if (rest.endsWith("-")) joined else joined + "\n"
          mapFields += key -> YStr(if (body.isEmpty) "" else chomped)
          i = j
        } else if (rest.startsWith("[")) {
          mapFields += key -> flowSeq(rest).getOrElse(return None)
          i += 1
        } else if (rest.startsWith("{")) {
          return None // flow mappings out of scope
        } else {
          mapFields += key -> scalar(rest).getOrElse(return None)
          i += 1
        }
      }
      }
    }
    Some((if (isSeq) YList(seqItems.result())
      else YMap(mapFields.result()), i))
  }

  /** The nested block starting at `from`, whose indent must exceed
    * `parentIndent`; consumes through its extent. */
  private def childBlock(lines: Vector[Line], from: Int, until: Int,
      parentIndent: Int, depth: Int): Option[(YVal, Int)] = {
    var f = from
    while (f < until && lines(f).text.isEmpty) f += 1
    if (f >= until || lines(f).indent <= parentIndent) return None
    val childIndent = lines(f).indent
    var j = f
    while (j < until && (lines(j).text.isEmpty ||
      lines(j).indent > parentIndent)) j += 1
    while (j > f && lines(j - 1).text.isEmpty) j -= 1
    block(lines, f, j, childIndent, depth + 1).map {
      case (v, _) => (v, j)
    }
  }

  /** The ':' ending the key (outside quotes, followed by space/EOL). */
  private def findKeyColon(s: String): Option[Int] = {
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        if (quote == '"' && c == '\\') i += 1
        else if (c == quote) quote = 0
      } else if (c == '\'' || c == '"') quote = c
      else if (c == ':' && (i + 1 == s.length || s.charAt(i + 1) == ' '))
        return Some(i)
      i += 1
    }
    None
  }

  private def unquoteKey(k: String): Option[String] =
    scalar(k) match {
      case Some(YStr(s)) => Some(s)
      case Some(YNum(v)) => Some(k.trim) // numeric-looking keys keep text
      case Some(YBool(_)) | Some(YNull) => Some(k.trim)
      case _ => None
    }

  /** Parse a standalone YAML document (optionally `---` headed). */
  def parseYaml(b: Array[Byte]): Option[YVal] =
    try {
      if (b == null) return None
      parseBody(new String(b, "UTF-8").split("\r?\n", -1).toVector)
    } catch { case _: Exception => None }

  private def parseBody(rawLines: Vector[String]): Option[YVal] = {
    val lines = Vector.newBuilder[Line]
    rawLines.foreach { raw0 =>
      val raw = stripComment(raw0).getOrElse(return None)
      val indent = raw.takeWhile(_ == ' ').length
      val text = raw.substring(indent)
      if (text.startsWith("\t")) return None // tab indentation (spec error)
      if (text == "---" || text == "...") lines += Line(indent, "")
      else lines += Line(indent, text)
    }
    // blank lines stay in the stream (block scalars need them) but
    // leading/trailing ones are trimmed and the base indent comes from
    // the first non-empty line
    val all0 = lines.result()
    val first = all0.indexWhere(_.text.nonEmpty)
    if (first < 0) return None
    val last = all0.lastIndexWhere(_.text.nonEmpty)
    val all = all0.slice(first, last + 1)
    val base = all.head.indent
    block(all, 0, all.length, base, 0).map(_._1)
  }

  /** Markdown front matter: a leading `---` fence, YAML, a closing
    * `---` (or `...`) fence; returns (yaml, body-after-fence). None
    * when the document has no front matter or the YAML rejects. */
  def frontMatter(b: Array[Byte]): Option[(YMap, String)] =
    try {
      if (b == null) return None
      val s = new String(b, "UTF-8")
      val lines = s.split("\r?\n", -1)
      if (lines.isEmpty || lines(0).trim != "---") return None
      var end = 1
      while (end < lines.length && lines(end).trim != "---" &&
        lines(end).trim != "...") end += 1
      if (end >= lines.length) return None // unterminated fence
      val yaml = parseBody(lines.slice(1, end).toVector) match {
        case Some(m: YMap) => m
        case _ => return None // front matter must be a mapping
      }
      Some((yaml, lines.drop(end + 1).mkString("\n")))
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // fixture emitter
  // ------------------------------------------------------------------

  /** Emit a front-mattered Markdown document exercising the subset:
    * quoted + plain scalars, a flow list, a nested mapping, a block
    * sequence of maps, a literal block scalar, comments, and typed
    * plain scalars. */
  /** Package-manifest fixture (hpack / pnpm-workspace style): name and
    * version scalars, then `dependencies:` / `dev-dependencies:` block
    * mappings of dependency -> QUOTED version-range strings (alternating
    * double/single quotes, a trailing comment on odd entries), a plain
    * scalar trailer. Both dependency blocks must be non-empty — an
    * empty block mapping is a null value this subset rejects. */
  def encodePackageManifest(name: String, version: String,
      deps: Seq[(String, String)],
      devDeps: Seq[(String, String)]): Array[Byte] = {
    require(deps.nonEmpty && devDeps.nonEmpty, "non-empty dep blocks")
    val sb = new StringBuilder
    sb.append("# generated package manifest\n")
    sb.append(s"name: ${"\""}${name.replace("\\", "\\\\")
      .replace("\"", "\\\"")}${"\""}\n")
    sb.append(s"version: '$version'\n")
    sb.append("dependencies:\n")
    deps.zipWithIndex.foreach { case ((d, v), i) =>
      if (i % 2 == 0) sb.append(s"""  $d: "$v"\n""")
      else sb.append(s"  $d: '$v'  # pinned\n")
    }
    sb.append("dev-dependencies:\n")
    devDeps.foreach { case (d, v) => sb.append(s"""  $d: "$v"\n""") }
    sb.append("license: MIT\n")
    sb.toString.getBytes("UTF-8")
  }

  def encodeFrontMatter(title: String, date: String, tags: Seq[String],
      draft: Boolean, weight: Long, body: String): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("---\n")
    sb.append("# generated front matter\n")
    sb.append(s"title: ${"\""}${title.replace("\\", "\\\\")
      .replace("\"", "\\\"")}${"\""}\n")
    sb.append(s"date: '$date'\n")
    sb.append(s"tags: [${tags.mkString(", ")}]\n")
    sb.append(s"draft: $draft  # publication gate\n")
    sb.append(s"weight: $weight\n")
    sb.append("author:\n")
    sb.append("  name: A. Writer\n")
    sb.append("  contact:\n")
    sb.append("    city: Berlin\n")
    sb.append("links:\n")
    sb.append("  - rel: canonical\n")
    sb.append("    href: /a\n")
    sb.append("  - rel: alternate\n")
    sb.append("    href: /b\n")
    sb.append("summary: |\n")
    sb.append("  first line\n")
    sb.append("  second line\n")
    sb.append("---\n")
    sb.append(body)
    sb.toString.getBytes("UTF-8")
  }
}

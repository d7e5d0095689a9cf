package graft.operators

/** TOML parser (public spec: toml.io v1.0) — the package-manifest
  * population of a code crawl (Cargo.toml, pyproject.toml, go-style
  * config), where dependency/license/feature analysis of repositories
  * starts. Values reuse [[Yaml]]'s ADT (TOML has no null; datetimes
  * surface as their literal text in a YStr — the analysis fields this
  * module exists for are strings, versions, and counts).
  *
  * Implemented: bare / quoted / dotted keys, `[table]` headers and
  * `[[array-of-tables]]`, basic and literal strings (single-line and
  * multiline, with the spec's escape and first-newline rules),
  * integers (underscore separators, 0x/0o/0b), floats, booleans,
  * single- and multi-line arrays (trailing comma allowed), one-line
  * inline tables, and quote-aware comments.
  *
  * TOML's strictness rules are the point — each is enforced and
  * rejects: duplicate keys, re-defining a table that was already
  * defined explicitly (or already a leaf), bare values that are not
  * a legal TOML type (an unquoted word is an ERROR, not a string —
  * the classic config-parser trap), underscores not BETWEEN digits,
  * unterminated strings/arrays. */
object Toml {

  import Yaml.{YVal, YStr, YNum, YBool, YList, YMap}

  // mutable build tree
  private sealed trait Node
  private final case class Leaf(v: YVal) extends Node
  private final class Table(
      val fields: scala.collection.mutable.LinkedHashMap[String, Node] =
        scala.collection.mutable.LinkedHashMap.empty,
      var explicit: Boolean = false) extends Node
  private final class ArrTables(
      val items: scala.collection.mutable.ArrayBuffer[Table] =
        scala.collection.mutable.ArrayBuffer.empty) extends Node

  private def freeze(n: Node): YVal = n match {
    case Leaf(v) => v
    case t: Table => YMap(t.fields.toVector.map { case (k, v) =>
      k -> freeze(v) })
    case a: ArrTables => YList(a.items.toVector.map(freeze))
  }

  /** Strip a comment (quote-aware; literal strings keep '#'). */
  private def stripComment(s: String): String = {
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote == '\'') { if (c == '\'') quote = 0 }
      else if (quote == '"') {
        if (c == '\\') i += 1
        else if (c == '"') quote = 0
      } else {
        if (c == '\'' || c == '"') quote = c
        else if (c == '#') return s.substring(0, i)
      }
      i += 1
    }
    s
  }

  /** Parse a dotted key: bare segments [A-Za-z0-9_-]+ or quoted. */
  private def keyPath(s: String): Option[Vector[String]] = {
    val out = Vector.newBuilder[String]
    var i = 0
    val n = s.length
    var expectSeg = true
    while (i < n) {
      while (i < n && s.charAt(i) == ' ') i += 1
      if (i >= n) return None
      if (!expectSeg) {
        if (s.charAt(i) != '.') return None
        i += 1
        expectSeg = true
      } else {
        val c = s.charAt(i)
        if (c == '"' || c == '\'') {
          val e = s.indexOf(c, i + 1)
          if (e < 0) return None
          out += s.substring(i + 1, e)
          i = e + 1
        } else {
          val st = i
          while (i < n && (s.charAt(i).isLetterOrDigit ||
            s.charAt(i) == '_' || s.charAt(i) == '-')) i += 1
          if (i == st) return None
          out += s.substring(st, i)
        }
        expectSeg = false
        while (i < n && s.charAt(i) == ' ') i += 1
      }
    }
    if (expectSeg) None else Some(out.result())
  }

  /** One value from its complete text form. */
  private def value(raw: String, depth: Int): Option[YVal] = {
    if (depth > 16) return None
    val t = raw.trim
    if (t.isEmpty) return None
    if (t.startsWith("\"\"\"")) {
      if (t.length < 6 || !t.endsWith("\"\"\"")) return None
      var body = t.substring(3, t.length - 3)
      if (body.startsWith("\n")) body = body.substring(1)
      // line-ending backslash folds away whitespace
      basicUnescape(body.replaceAll("\\\\\n\\s*", ""))
    } else if (t.startsWith("'''")) {
      if (t.length < 6 || !t.endsWith("'''")) return None
      var body = t.substring(3, t.length - 3)
      if (body.startsWith("\n")) body = body.substring(1)
      Some(YStr(body))
    } else if (t.startsWith("\"")) {
      if (t.length < 2 || !t.endsWith("\"") ||
        t.length == 1) return None
      basicUnescape(t.substring(1, t.length - 1)).filter(_ =>
        !t.substring(1, t.length - 1).contains("\n"))
    } else if (t.startsWith("'")) {
      if (t.length < 2 || !t.endsWith("'")) return None
      val body = t.substring(1, t.length - 1)
      if (body.contains("'") || body.contains("\n")) None
      else Some(YStr(body))
    } else if (t == "true") Some(YBool(true))
    else if (t == "false") Some(YBool(false))
    else if (t.startsWith("[")) {
      if (!t.endsWith("]")) return None
      val items = splitTop(t.substring(1, t.length - 1))
        .getOrElse(return None)
      val vs = items.filter(_.trim.nonEmpty)
        .map(it => value(it, depth + 1).getOrElse(return None))
      Some(YList(vs.toVector))
    } else if (t.startsWith("{")) {
      if (!t.endsWith("}")) return None
      val items = splitTop(t.substring(1, t.length - 1))
        .getOrElse(return None)
      val fields = Vector.newBuilder[(String, YVal)]
      val seen = scala.collection.mutable.Set.empty[String]
      items.filter(_.trim.nonEmpty).foreach { it =>
        val eq = eqIndex(it).getOrElse(return None)
        val ks = keyPath(it.substring(0, eq).trim).getOrElse(return None)
        if (ks.length != 1) return None // dotted inline keys: out of scope
        if (!seen.add(ks.head)) return None
        fields += ks.head -> value(it.substring(eq + 1), depth + 1)
          .getOrElse(return None)
      }
      Some(YMap(fields.result()))
    } else if (t.matches("\\d{4}-\\d{2}-\\d{2}([Tt ].*)?") ||
      t.matches("\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?")) {
      Some(YStr(t)) // datetimes surface as their literal text
    } else if (t.matches("0[xob][0-9a-fA-F_]+")) {
      // TOML 1.0 forbids a sign on hex/octal/binary integers — a
      // leading +/- on a 0x/0o/0b literal is invalid TOML, not -N
      val radix = t.charAt(1) match {
        case 'x' => 16; case 'o' => 8; case _ => 2
      }
      val digits = t.substring(2).replace("_", "")
      if (digits.isEmpty || t.substring(2).startsWith("_") ||
        t.endsWith("_") || t.contains("__")) return None
      try Some(YNum(java.lang.Long.parseLong(digits, radix).toDouble))
      catch { case _: Exception => None }
    } else if (t.matches("[-+]?[0-9](_?[0-9])*")) {
      t.replace("_", "").toLongOption.map(v => YNum(v.toDouble))
    } else if (t.matches(
      "[-+]?[0-9](_?[0-9])*(\\.[0-9](_?[0-9])*)?([eE][-+]?[0-9]+)?") &&
      (t.contains(".") || t.toLowerCase.contains("e"))) {
      t.replace("_", "").toDoubleOption.map(YNum.apply)
    } else None // a bare word is NOT a string in TOML
  }

  private def basicUnescape(body: String): Option[YStr] = {
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
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'u' =>
            if (i + 6 > body.length) return None
            val v = try Integer.parseInt(body.substring(i + 2, i + 6), 16)
              catch { case _: Exception => return None }
            sb.append(v.toChar); i += 6
          case 'U' =>
            if (i + 10 > body.length) return None
            val v = try Integer.parseInt(body.substring(i + 2, i + 10), 16)
              catch { case _: Exception => return None }
            if (v < 0 || v > 0x10FFFF) return None
            sb.appendAll(Character.toChars(v)); i += 10
          case _ => return None
        }
      } else { sb.append(c); i += 1 }
    }
    Some(YStr(sb.toString))
  }

  /** Split on top-level commas (outside strings/brackets/braces). */
  private def splitTop(s: String): Option[Seq[String]] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var quote: Char = 0
    var tripleQuote = false
    var dep = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        cur.append(c)
        if (quote == '"' && c == '\\' && i + 1 < s.length) {
          cur.append(s.charAt(i + 1)); i += 1
        } else if (c == quote) {
          if (!tripleQuote) quote = 0
          else if (i + 2 < s.length && s.charAt(i + 1) == quote &&
            s.charAt(i + 2) == quote) {
            cur.append(quote).append(quote); i += 2
            quote = 0; tripleQuote = false
          }
        }
      } else {
        c match {
          case '"' | '\'' =>
            quote = c
            tripleQuote = i + 2 < s.length && s.charAt(i + 1) == c &&
              s.charAt(i + 2) == c
            cur.append(c)
            if (tripleQuote) { cur.append(c).append(c); i += 2 }
          case '[' | '{' => dep += 1; cur.append(c)
          case ']' | '}' =>
            dep -= 1
            if (dep < 0) return None
            cur.append(c)
          case ',' if dep == 0 => out += cur.toString; cur.clear()
          case _ => cur.append(c)
        }
      }
      i += 1
    }
    if (quote != 0 || dep != 0) return None
    out += cur.toString
    Some(out.result())
  }

  /** The '=' separating key from value (outside quotes). */
  private def eqIndex(s: String): Option[Int] = {
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '=') return Some(i)
      i += 1
    }
    None
  }

  /** Is this value text COMPLETE (balanced brackets, closed strings)?
    * Drives multi-line joining for arrays and multiline strings. */
  private def complete(s: String): Boolean = {
    val t = s.trim
    if (t.isEmpty) return false
    if (t.startsWith("\"\"\""))
      return t.length >= 6 && t.endsWith("\"\"\"")
    if (t.startsWith("'''"))
      return t.length >= 6 && t.endsWith("'''")
    var quote: Char = 0
    var dep = 0
    var i = 0
    while (i < t.length) {
      val c = t.charAt(i)
      if (quote != 0) {
        if (quote == '"' && c == '\\') i += 1
        else if (c == quote) quote = 0
      } else c match {
        case '"' | '\'' => quote = c
        case '[' | '{' => dep += 1
        case ']' | '}' => dep -= 1
        case _ =>
      }
      i += 1
    }
    quote == 0 && dep == 0
  }

  def parseToml(b: Array[Byte]): Option[YMap] =
    try {
      if (b == null) return None
      val root = new Table
      var current = root
      def navigate(path: Vector[String], forHeader: Boolean)
          : Option[Table] = {
        var t = root
        path.foreach { seg =>
          t.fields.get(seg) match {
            case Some(tt: Table) => t = tt
            case Some(a: ArrTables) => t = a.items.last
            case Some(_: Leaf) => return None // key already a value
            case None =>
              val nt = new Table
              t.fields += seg -> nt
              t = nt
          }
        }
        Some(t)
      }
      val rawLines = new String(b, "UTF-8").split("\r?\n", -1)
      var li = 0
      while (li < rawLines.length) {
        var line = stripComment(rawLines(li)).trim
        li += 1
        if (line.nonEmpty) {
          if (line.startsWith("[[")) {
            if (!line.endsWith("]]")) return None
            val path = keyPath(line.substring(2, line.length - 2).trim)
              .getOrElse(return None)
            if (path.isEmpty) return None
            val parent = navigate(path.init, forHeader = true)
              .getOrElse(return None)
            val arr = parent.fields.get(path.last) match {
              case Some(a: ArrTables) => a
              case None =>
                val a = new ArrTables
                parent.fields += path.last -> a
                a
              case Some(_) => return None // redefinition
            }
            val t = new Table(explicit = true)
            arr.items += t
            current = t
          } else if (line.startsWith("[")) {
            if (!line.endsWith("]")) return None
            val path = keyPath(line.substring(1, line.length - 1).trim)
              .getOrElse(return None)
            if (path.isEmpty) return None
            val t = navigate(path, forHeader = true)
              .getOrElse(return None)
            if (t.explicit) return None // duplicate explicit header
            t.explicit = true
            current = t
          } else {
            val eq = eqIndex(line).getOrElse(return None)
            val path = keyPath(line.substring(0, eq).trim)
              .getOrElse(return None)
            if (path.isEmpty) return None
            var vtext = line.substring(eq + 1).trim
            // join continuation lines for arrays / multiline strings
            var guard = 0
            while (!complete(vtext) && li < rawLines.length &&
              guard < 10000) {
              // continuation lines INSIDE multiline strings are raw —
              // a '#' there is content, not a comment
              val next =
                if (vtext.trim.startsWith("'''") ||
                  vtext.trim.startsWith("\"\"\"")) rawLines(li)
                else stripComment(rawLines(li))
              vtext = vtext + "\n" + next
              li += 1
              guard += 1
            }
            if (!complete(vtext)) return None
            val v = value(vtext, 0).getOrElse(return None)
            // dotted keys navigate WITHOUT marking tables explicit
            var t = current
            path.init.foreach { seg =>
              t.fields.get(seg) match {
                case Some(tt: Table) if !tt.explicit => t = tt
                case None =>
                  val nt = new Table
                  t.fields += seg -> nt
                  t = nt
                case Some(_) => return None
              }
            }
            if (t.fields.contains(path.last)) return None // duplicate
            t.fields += path.last -> Leaf(v)
          }
        }
      }
      freeze(root) match {
        case m: YMap => Some(m)
        case _ => None
      }
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // fixture emitter
  // ------------------------------------------------------------------

  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"").replace("\n", "\\n")

  /** A Cargo.toml-shaped manifest: [package] metadata with quoted and
    * multiline strings, typed scalars, a MULTI-LINE feature array
    * with a trailing comma and comments, [dependencies] with both
    * bare-version and inline-table forms, and `nBins` [[bin]]
    * array-of-tables entries with dotted keys. */
  def encodeManifest(name: String, version: String, edition: Long,
      features: Seq[String], deps: Seq[(String, String)],
      nBins: Int): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("# generated manifest\n\n")
    sb.append("[package]\n")
    sb.append(s"""name = "${esc(name)}"\n""")
    sb.append(s"""version = "${esc(version)}" # semver\n""")
    sb.append(s"edition = $edition\n")
    sb.append("publish = false\n")
    sb.append("description = \"\"\"\nA multiline\ndescription.\"\"\"\n")
    sb.append("\nfeatures = [\n")
    features.foreach(f => sb.append(s"""  "${esc(f)}", # feature\n"""))
    sb.append("]\n")
    sb.append("\n[dependencies]\n")
    deps.zipWithIndex.foreach { case ((dep, ver), i) =>
      if (i % 2 == 0) sb.append(s"""$dep = "${esc(ver)}"\n""")
      else sb.append(
        s"""$dep = { version = "${esc(ver)}", default-features = false }\n""")
    }
    (0 until nBins).foreach { k =>
      sb.append(s"\n[[bin]]\nname = \"tool$k\"\npath = 'src/bin$k.rs'\n")
      sb.append(s"test.harness = ${k % 2 == 0}\n")
    }
    sb.toString.getBytes("UTF-8")
  }
}

package graft.operators

/** RTF text extraction (public spec: Microsoft Rich Text Format 1.9.1)
  * — the legacy office population that still dominates older document
  * crawls and email attachments. The format is a brace-grouped control
  * stream, and every naive regex extractor leaks on the same traps,
  * all implemented here:
  *
  *  - DESTINATION groups whose content is data, not text: font /
  *    color / stylesheet tables, `{\pict}` image hex, and every
  *    starred `{\*\...}` destination — their content must not leak
  *    into the extraction;
  *  - control symbols `\{` `\}` `\\` as literal characters, `\par` /
  *    `\line` as newline, `\tab` as tab, and the control-word
  *    delimiter rule (one following space is CONSUMED, a digit
  *    parameter self-delimits);
  *  - `\'hh` codepage escapes (read as Latin-1 here) and `\uN`
  *    Unicode words with the `\ucN` fallback-skip protocol — after
  *    `\uN`, the current group's uc count of fallback characters
  *    (including `\'hh` forms) are SKIPPED, not emitted;
  *  - `{\info{\title ...}}` metadata captured while the rest of the
  *    info destination stays out of the text.
  *
  * Not `{\rtf1`-headed, unbalanced braces, or a torn escape → None.
  */
object Rtf {

  final case class RtfMeta(title: Option[String], text: String)

  def decodeRtf(b: Array[Byte]): Option[RtfMeta] =
    try {
      if (b == null || b.length < 7) return None
      val s = new String(b, "ISO-8859-1")
      if (!s.startsWith("{\\rtf1")) return None
      val text = new StringBuilder
      val title = new StringBuilder
      var sawTitle = false
      // per-group state: (skipDest, inInfo, inTitle, ucSkip)
      var stack = List((false, false, false, 1))
      var pendingUcSkip = 0
      var i = 1 // past '{'
      def cur = stack.head
      def emit(c: Char): Unit = {
        if (pendingUcSkip > 0) pendingUcSkip -= 1
        else if (cur._3) { title.append(c); sawTitle = true }
        else if (!cur._1 && !cur._2) text.append(c)
      }
      val destinations = Set("fonttbl", "colortbl", "stylesheet",
        "pict", "themedata", "listtable", "generator")
      while (i < s.length && stack.nonEmpty) {
        s.charAt(i) match {
          case '{' =>
            stack = cur :: stack
            pendingUcSkip = 0
            i += 1
          case '}' =>
            stack = stack.tail
            pendingUcSkip = 0
            i += 1
          case '\\' =>
            if (i + 1 >= s.length) return None // torn escape
            val c = s.charAt(i + 1)
            if (c == '{' || c == '}' || c == '\\') { emit(c); i += 2 }
            else if (c == '\'') {
              if (i + 3 >= s.length) return None
              val hex = s.substring(i + 2, i + 4)
              val v = Integer.parseInt(hex, 16) // torn hex -> exception
              emit(v.toChar)
              i += 4
            } else if (c == '*') {
              // starred destination: the whole group is data
              stack = (true, cur._2, false, cur._4) :: stack.tail
              i += 2
            } else if (c == '~') { emit('\u00a0'); i += 2 }
            else if (c.isLetter) {
              var j = i + 1
              while (j < s.length && s.charAt(j).isLetter) j += 1
              val word = s.substring(i + 1, j)
              var param = 0
              var hasParam = false
              var neg = false
              if (j < s.length && (s.charAt(j) == '-' ||
                s.charAt(j).isDigit)) {
                if (s.charAt(j) == '-') { neg = true; j += 1 }
                val ds = j
                while (j < s.length && s.charAt(j).isDigit) j += 1
                if (j == ds) return None // '-' without digits
                param = s.substring(ds, j).toInt
                hasParam = true
              }
              // the one-space delimiter is consumed
              if (j < s.length && s.charAt(j) == ' ') j += 1
              word match {
                case "bin" =>
                  // \binN is followed by N RAW bytes (picture data) —
                  // walking them as RTF would desync the brace scan on
                  // any byte that happens to be { } \
                  if (!hasParam || neg || param < 0 ||
                    j.toLong + param > s.length) return None
                  j += param
                case "par" | "line" => emit('\n')
                case "tab" => emit('\t')
                case "uc" =>
                  stack = (cur._1, cur._2, cur._3,
                    if (hasParam) param else 1) :: stack.tail
                case "u" =>
                  // \uN carries a SIGNED 16-bit value but `param` holds
                  // the magnitude (neg is a separate flag): \u-10179 is
                  // the signed value -10179, i.e. codepoint 65536-10179
                  // = 0xD83D. Word emits surrogate pairs this way for
                  // every codepoint >= U+8000.
                  val cp = if (neg) 65536 - param else param
                  if (cp < 0 || cp > 0xffff) return None
                  emit(cp.toChar)
                  pendingUcSkip = cur._4
                case "info" =>
                  stack = (cur._1, true, false, cur._4) :: stack.tail
                case "title" if cur._2 =>
                  stack = (cur._1, true, true, cur._4) :: stack.tail
                case w if destinations(w) =>
                  stack = (true, cur._2, false, cur._4) :: stack.tail
                case _ => // formatting word: ignored
              }
              i = j
            } else return None // unknown control symbol
          case '\r' | '\n' => i += 1 // raw newlines are not text
          case ch =>
            emit(ch)
            i += 1
        }
      }
      if (stack.nonEmpty) return None // unbalanced braces
      Some(RtfMeta(
        if (sawTitle) Some(title.toString) else None, text.toString))
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // fixture emitter
  // ------------------------------------------------------------------

  private def escText(s: String): String = {
    val out = new StringBuilder
    s.foreach {
      case '\\' => out.append("\\\\")
      case '{' => out.append("\\{")
      case '}' => out.append("\\}")
      case '\t' => out.append("\\tab ")
      case c if c > 127 =>
        if (c <= 255) out.append(f"\\'${c.toInt}%02x")
        else {
          // \uN is a SIGNED 16-bit decimal: Word writes codepoints
          // >= U+8000 (surrogates included) as negative values.
          val signed = if (c.toInt >= 0x8000) c.toInt - 65536 else c.toInt
          out.append(s"\\u$signed?") // uc1 fallback
        }
      case c => out.append(c)
    }
    out.toString
  }

  /** Emit an RTF with the traps a real writer produces: font/color/
    * stylesheet tables and a starred generator destination carrying
    * DECOY text that must not leak, an info title, \\uc1, paragraphs
    * separated by \\par, and text escapes (braces, backslash, \\'hh,
    * \\uN?, \\tab). */
  def encodeRtf(title: String, paragraphs: Seq[String]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("{\\rtf1\\ansi\\ansicpg1252\\uc1\\deff0\n")
    sb.append("{\\fonttbl{\\f0\\froman\\fcharset0 Times New Roman;}" +
      "{\\f1\\fswiss Arial DECOY;}}\n")
    sb.append("{\\colortbl ;\\red255\\green0\\blue0;}\n")
    sb.append("{\\stylesheet{\\s1 heading DECOY;}}\n")
    sb.append("{\\*\\generator graft fixture 1.0 DECOY;}\n")
    sb.append(s"{\\info{\\title ${escText(title)}}{\\author DECOY}}\n")
    paragraphs.zipWithIndex.foreach { case (p, k) =>
      if (k > 0) sb.append("\\par\n")
      sb.append("{\\f0\\fs24 ").append(escText(p)).append("}")
    }
    sb.append("}")
    sb.toString.getBytes("ISO-8859-1")
  }
}

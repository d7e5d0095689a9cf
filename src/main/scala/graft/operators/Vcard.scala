package graft.operators

/** vCard parsing (public spec, RFC 6350; the 3.0 shape of RFC 2426
  * shares the grammar) — the contacts-export corpus, and the direct
  * sibling of [[Ical]]: the same three line mechanics apply and are
  * implemented — UNFOLDING (CRLF + one SP/HTAB continues the line),
  * property parameters (`TEL;TYPE=cell:...` — the value starts at the
  * first ':'), and TEXT escaping (`\\,` `\\;` `\\n` `\\\\`). Two
  * vCard-specific additions: GROUP prefixes (`item1.EMAIL:` — the
  * group is stripped before dispatch) and the structured N value
  * (components split on UNESCAPED `;`: family, given, ...).
  *
  * Extraction is curation-shaped and first-card scoped: VERSION
  * (required by the spec — absent rejects), FN, N's family/given,
  * ORG's first component, EMAIL/TEL counts, plus the stream's
  * complete-card count. Repeated single-value properties keep the
  * FIRST occurrence. An unterminated card, nested BEGIN, stray END,
  * or non-card leading content → None.
  */
object Vcard {

  final case class VcardMeta(version: String, fn: Option[String],
      family: Option[String], given: Option[String], org: Option[String],
      nEmails: Int, nTels: Int, nCards: Int)

  private def unescape(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' | 'N' => out.append('\n')
          case other => out.append(other) // \, \; \\ per spec
        }
        i += 2
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Split on unescaped `;` (the N / ORG component separator). */
  private def splitComponents(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { cur.append(c).append(s.charAt(i + 1)); i += 2 }
      else if (c == ';') { out += cur.toString; cur.clear(); i += 1 }
      else { cur.append(c); i += 1 }
    }
    out += cur.toString
    out.toSeq
  }

  def decodeVcard(b: Array[Byte]): Option[VcardMeta] =
    try {
      if (b == null || b.length < 12) return None
      val raw = new String(b, "UTF-8")
      // unfold: CRLF (or bare LF) + single SP/HTAB joins lines
      val unfolded = raw.replace("\r\n ", "").replace("\r\n\t", "")
        .replace("\n ", "").replace("\n\t", "")
      val lines = unfolded.split("\r?\n").map(_.trim).filter(_.nonEmpty)
      if (lines.isEmpty || lines(0).toUpperCase(java.util.Locale.ROOT)
        != "BEGIN:VCARD") return None
      var version: Option[String] = None
      var fn: Option[String] = None
      var family: Option[String] = None
      var given: Option[String] = None
      var org: Option[String] = None
      var nEmails = 0
      var nTels = 0
      var nCards = 0
      var inCard = true
      var i = 1
      while (i < lines.length) {
        val ln = lines(i)
        val colon = ln.indexOf(':')
        val semi = ln.indexOf(';')
        var name =
          if (colon < 0) ln
          else if (semi >= 0 && semi < colon) ln.substring(0, semi)
          else ln.substring(0, colon)
        // group prefix: item1.EMAIL dispatches as EMAIL
        val dot = name.indexOf('.')
        if (dot >= 0) name = name.substring(dot + 1)
        val value = if (colon < 0) "" else ln.substring(colon + 1)
        val upper = name.toUpperCase(java.util.Locale.ROOT)
        upper match {
          case "BEGIN" if value.equalsIgnoreCase("VCARD") =>
            if (inCard) return None // vCards do not nest
            inCard = true
          case "END" if value.equalsIgnoreCase("VCARD") =>
            if (!inCard) return None
            inCard = false
            nCards += 1
          case _ if !inCard => return None // content between cards
          case _ if nCards > 0 => // later cards only counted
          case "VERSION" if version.isEmpty => version = Some(value)
          case "FN" if fn.isEmpty => fn = Some(unescape(value))
          case "N" if family.isEmpty && given.isEmpty =>
            val comps = splitComponents(value)
            family = comps.headOption.map(unescape).filter(_.nonEmpty)
            given = comps.lift(1).map(unescape).filter(_.nonEmpty)
          case "ORG" if org.isEmpty =>
            org = splitComponents(value).headOption.map(unescape)
              .filter(_.nonEmpty)
          case "EMAIL" => nEmails += 1
          case "TEL" => nTels += 1
          case _ => // other properties: skipped
        }
        i += 1
      }
      if (inCard) return None // unterminated card
      val v = version.getOrElse(return None) // RFC 6350 §6.7.9: REQUIRED
      if (v != "2.1" && v != "3.0" && v != "4.0") return None
      Some(VcardMeta(v, fn, family, given, org, nEmails, nTels, nCards))
    } catch { case _: Exception => None }

  // ------------------------------------------------------------------
  // fixture emitter
  // ------------------------------------------------------------------

  private def escape(s: String): String = {
    val out = new StringBuilder(s.length)
    s.foreach {
      case '\\' => out.append("\\\\")
      case ';' => out.append("\\;")
      case ',' => out.append("\\,")
      case '\n' => out.append("\\n")
      case c => out.append(c)
    }
    out.toString
  }

  /** One fixture card; `emails`/`tels` become one property each. */
  final case class CardFixture(fn: String, family: String, given: String,
      org: String, emails: Seq[String], tels: Seq[String])

  /** Emit `cards` as one stream: CRLF line ends, lines FOLDED at 75
    * octets (RFC 6350 §3.2), TYPE parameters on EMAIL/TEL, a group
    * prefix on the first EMAIL, escapes in every text value, and a
    * repeated decoy FN after the real one (first-wins contract). */
  def encodeVcard(version: String, cards: Seq[CardFixture]): Array[Byte] = {
    require(cards.nonEmpty, "at least one card")
    require(Set("2.1", "3.0", "4.0")(version), s"version: $version")
    val sb = new StringBuilder
    def fold(line: String): Unit = {
      // fold on OCTET length; fixture values are chosen so folding
      // never lands mid-UTF-8-sequence (ASCII planted values)
      var rest = line
      var first = true
      while (rest.nonEmpty) {
        val width = if (first) 75 else 74
        val take = math.min(width, rest.length)
        sb.append(if (first) "" else " ").append(rest.take(take))
          .append("\r\n")
        rest = rest.drop(take)
        first = false
      }
    }
    cards.foreach { c =>
      fold("BEGIN:VCARD")
      fold(s"VERSION:$version")
      fold(s"FN:${escape(c.fn)}")
      fold("FN:DECOY IGNORED") // repeated: first-wins
      fold(s"N:${escape(c.family)};${escape(c.given)};;;")
      fold(s"ORG:${escape(c.org)};Engineering Unit")
      c.emails.zipWithIndex.foreach { case (e, i) =>
        if (i == 0) fold(s"item1.EMAIL;TYPE=work:$e")
        else fold(s"EMAIL;TYPE=home:$e")
      }
      c.tels.foreach(t => fold(s"TEL;TYPE=cell,voice:$t"))
      fold("END:VCARD")
    }
    sb.toString.getBytes("UTF-8")
  }
}

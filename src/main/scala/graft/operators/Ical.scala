package graft.operators

/** iCalendar parsing (public spec, RFC 5545) — the calendar-export
  * corpus (event listings, schedules, public feeds). Three mechanics
  * make naive line-splitting wrong, and all three are implemented:
  * line UNFOLDING (CRLF followed by one space/tab continues the
  * line), property parameters (`DTSTART;TZID=...:value` — the value
  * starts after the first ':', not the first ';'), and TEXT escaping
  * (`\\,` `\\;` `\\n` `\\\\` in SUMMARY et al.).
  *
  * Extraction is curation-shaped: PRODID, the VEVENT count, the
  * lexicographic min/max DTSTART (exact for the spec's basic
  * YYYYMMDDTHHMMSSZ format), and the first event's unescaped
  * SUMMARY. Streams without a VCALENDAR wrapper or with unbalanced
  * VEVENT blocks → None.
  */
object Ical {

  final case class CalMeta(prodid: Option[String], nEvents: Int,
      minStart: Option[String], maxStart: Option[String],
      firstSummary: Option[String])

  private def unescapeText(s: String): String = {
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

  def decodeIcal(b: Array[Byte]): Option[CalMeta] =
    try {
      if (b == null || b.length < 15) return None
      val raw = new String(b, "UTF-8")
      // unfold: CRLF (or bare LF) + single SP/HTAB joins lines
      val unfolded = raw.replace("\r\n ", "").replace("\r\n\t", "")
        .replace("\n ", "").replace("\n\t", "")
      val lines = unfolded.split("\r?\n").map(_.trim).filter(_.nonEmpty)
      if (lines.isEmpty || lines(0) != "BEGIN:VCALENDAR") return None
      var prodid: Option[String] = None
      var nEvents = 0
      var minStart: Option[String] = None
      var maxStart: Option[String] = None
      var firstSummary: Option[String] = None
      var depth = 0 // VEVENT nesting (spec says none, but stay safe)
      var closed = false
      var i = 1
      while (i < lines.length) {
        val ln = lines(i)
        // value starts at the first ':' — parameters sit before it
        val colon = ln.indexOf(':')
        val semi = ln.indexOf(';')
        val name =
          if (colon < 0) ln
          else if (semi >= 0 && semi < colon) ln.substring(0, semi)
          else ln.substring(0, colon)
        val value = if (colon < 0) "" else ln.substring(colon + 1)
        name.toUpperCase(java.util.Locale.ROOT) match {
          case "BEGIN" if value == "VEVENT" =>
            depth += 1
            if (depth == 1) nEvents += 1
          case "END" if value == "VEVENT" =>
            depth -= 1
            if (depth < 0) return None
          case "END" if value == "VCALENDAR" =>
            if (depth != 0) return None
            closed = true
          case "PRODID" if depth == 0 && prodid.isEmpty =>
            prodid = Some(value)
          case "DTSTART" if depth == 1 =>
            if (value.nonEmpty) {
              if (minStart.forall(value < _)) minStart = Some(value)
              if (maxStart.forall(_ < value)) maxStart = Some(value)
            }
          case "SUMMARY" if depth == 1 && firstSummary.isEmpty =>
            firstSummary = Some(unescapeText(value))
          case _ => ()
        }
        i += 1
      }
      if (!closed || depth != 0 || nEvents == 0) return None
      Some(CalMeta(prodid, nEvents, minStart, maxStart, firstSummary))
    } catch { case _: Exception => None }

  /** Fixture emitter: folded SUMMARY (split mid-word with CRLF+SP),
    * escaped text, a TZID parameter on every second DTSTART (the
    * first-colon rule), CRLF line endings throughout per spec. */
  def encodeIcal(prodid: String, events: Seq[(String, String)])
      : Array[Byte] = {
    require(events.nonEmpty)
    val sb = new StringBuilder
    def ln(s: String): Unit = { sb.append(s); sb.append("\r\n") }
    ln("BEGIN:VCALENDAR")
    ln("VERSION:2.0")
    ln(s"PRODID:$prodid")
    events.zipWithIndex.foreach { case ((start, summary), k) =>
      ln("BEGIN:VEVENT")
      ln(s"UID:ev$k@example.test")
      if (k % 2 == 0) ln(s"DTSTART:$start")
      else ln(s"DTSTART;TZID=Etc/UTC:$start")
      val esc = summary.replace("\\", "\\\\").replace(",", "\\,")
        .replace(";", "\\;").replace("\n", "\\n")
      // fold long summaries mid-value: CRLF + single leading space
      if (esc.length > 10) {
        ln(s"SUMMARY:${esc.substring(0, 10)}")
        ln(" " + esc.substring(10))
      } else ln(s"SUMMARY:$esc")
      ln("END:VEVENT")
    }
    ln("END:VCALENDAR")
    sb.toString.getBytes("UTF-8")
  }
}

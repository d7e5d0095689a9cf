package graft.operators

import java.io.ByteArrayOutputStream

/** Email (RFC 5322 + MIME) parsing — mailing-list and support-ticket
  * archives are a classic text-corpus modality, and none of it is
  * readable without the three MIME mechanics implemented here:
  * header UNFOLDING (a continuation line starts with whitespace),
  * RFC 2047 encoded-words in headers (=?charset?B|Q?...?= — subjects
  * are routinely encoded even for plain ASCII), and multipart body
  * walking (boundary from the Content-Type parameter, parts delimited
  * by --boundary lines, closed by --boundary--) with per-part
  * Content-Transfer-Encoding decode (quoted-printable incl. soft
  * line breaks, base64, 7/8bit passthrough).
  *
  * The extraction contract is curation-shaped: From / decoded
  * Subject / Date headers, the part count, and the FIRST text/plain
  * body decoded to a string (HTML parts are someone else's job —
  * [[HtmlExtract]]'s). Structurally broken messages → None.
  */
object Eml {

  final case class Email(from: Option[String], subject: Option[String],
      date: Option[String], contentType: String, nParts: Int,
      textBody: Option[String])

  // ---- RFC 2047 encoded-words ---------------------------------------

  /** Decode every =?charset?B|Q?payload?= token; unencoded runs pass
    * through. Whitespace BETWEEN two encoded words is dropped per
    * spec; a malformed token stays literal (the lenient reading real
    * mail clients apply). */
  private[operators] def decodeEncodedWords(s: String): String = {
    val out = new StringBuilder
    var i = 0
    var lastWasEncoded = false
    var pendingWs = ""
    while (i < s.length) {
      val start = s.indexOf("=?", i)
      if (start < 0) {
        out.append(pendingWs); out.append(s.substring(i)); i = s.length
      } else {
        val gap = s.substring(i, start)
        val q1 = s.indexOf('?', start + 2)
        val q2 = if (q1 < 0) -1 else s.indexOf('?', q1 + 1)
        val end = if (q2 < 0) -1 else s.indexOf("?=", q2 + 1)
        if (q1 < 0 || q2 < 0 || end < 0) {
          out.append(pendingWs); out.append(s.substring(i)); i = s.length
        } else {
          val charset = s.substring(start + 2, q1)
          val enc = s.substring(q1 + 1, q2)
          val payload = s.substring(q2 + 1, end)
          val decoded = decodeWord(charset, enc, payload)
          if (decoded.isEmpty) { // malformed: keep literal
            out.append(pendingWs); out.append(gap)
            out.append(s.substring(start, end + 2))
            pendingWs = ""
            lastWasEncoded = false
          } else {
            // gap between two encoded words is dropped; other gaps kept
            if (!(lastWasEncoded && gap.forall(_.isWhitespace))) {
              out.append(pendingWs); out.append(gap)
            }
            out.append(decoded.get)
            pendingWs = ""
            lastWasEncoded = true
          }
          i = end + 2
        }
      }
    }
    out.toString
  }

  private def decodeWord(charset: String, enc: String,
      payload: String): Option[String] =
    try {
      val cs = java.nio.charset.Charset.forName(charset)
      enc.toUpperCase(java.util.Locale.ROOT) match {
        case "B" =>
          Some(new String(java.util.Base64.getDecoder.decode(payload), cs))
        case "Q" =>
          // Q encoding: '_' is space, =XX hex; strictly RFC 2047 §4.2
          val bytes = new ByteArrayOutputStream(payload.length)
          var i = 0
          while (i < payload.length) {
            payload.charAt(i) match {
              case '_' => bytes.write(' '); i += 1
              case '=' =>
                if (i + 3 > payload.length) return None
                bytes.write(Integer.parseInt(
                  payload.substring(i + 1, i + 3), 16))
                i += 3
              case c => bytes.write(c.toInt); i += 1
            }
          }
          Some(new String(bytes.toByteArray, cs))
        case _ => None
      }
    } catch { case _: Exception => None }

  // ---- transfer encodings -------------------------------------------

  private[operators] def decodeQuotedPrintable(s: String): Option[String] =
    try {
      val bytes = new ByteArrayOutputStream(s.length)
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '=') {
          if (i + 1 < s.length && s.charAt(i + 1) == '\n') i += 2 // soft \n
          else if (i + 2 < s.length && s.charAt(i + 1) == '\r' &&
            s.charAt(i + 2) == '\n') i += 3 // soft \r\n
          else if (i + 3 <= s.length) {
            bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
            i += 3
          } else return None
        } else { bytes.write(c.toInt); i += 1 }
      }
      Some(new String(bytes.toByteArray, "UTF-8"))
    } catch { case _: Exception => None }

  // ---- header block --------------------------------------------------

  /** Unfold + split one header block; keys lowercased, FIRST value
    * wins on repeats. Returns (headers, index just past the blank
    * separator line). */
  private def parseHeaders(s: String,
      from: Int): Option[(Map[String, String], Int)] = {
    var headers = Map.empty[String, String]
    var i = from
    while (i < s.length) {
      // blank line = end of headers
      val eol = { val e = s.indexOf('\n', i); if (e < 0) s.length else e }
      val line = s.substring(i, eol).stripSuffix("\r")
      if (line.isEmpty) return Some((headers, eol + 1))
      // unfold: absorb continuation lines
      var value = line
      var j = eol + 1
      var folding = true
      while (folding && j < s.length) {
        val e2 = { val e = s.indexOf('\n', j); if (e < 0) s.length else e }
        val next = s.substring(j, e2).stripSuffix("\r")
        if (next.nonEmpty && (next.charAt(0) == ' ' || next.charAt(0) == '\t')) {
          value += " " + next.trim
          j = e2 + 1
        } else folding = false
      }
      val colon = value.indexOf(':')
      if (colon <= 0) return None // not a header line before the blank
      val key = value.substring(0, colon).trim
        .toLowerCase(java.util.Locale.ROOT)
      if (!headers.contains(key)) // first value wins on repeats
        headers += key -> value.substring(colon + 1).trim
      i = j
    }
    None // no blank separator: not a message
  }

  private def ctParam(ct: String, param: String): Option[String] = {
    val lower = ct.toLowerCase(java.util.Locale.ROOT)
    val k = lower.indexOf(param + "=")
    if (k < 0) return None
    var v = ct.substring(k + param.length + 1).trim
    if (v.startsWith("\"")) {
      val e = v.indexOf('"', 1)
      if (e < 0) return None
      Some(v.substring(1, e))
    } else {
      val e = v.indexOf(';')
      Some((if (e < 0) v else v.substring(0, e)).trim)
    }
  }

  private def mediaType(ct: String): String = {
    val semi = ct.indexOf(';')
    (if (semi < 0) ct else ct.substring(0, semi)).trim
      .toLowerCase(java.util.Locale.ROOT)
  }

  private def decodeBody(body: String, cte: String): Option[String] =
    cte.trim.toLowerCase(java.util.Locale.ROOT) match {
      case "base64" =>
        try Some(new String(java.util.Base64.getMimeDecoder
          .decode(body), "UTF-8"))
        catch { case _: Exception => None }
      case "quoted-printable" => decodeQuotedPrintable(body)
      case "" | "7bit" | "8bit" | "binary" => Some(body)
      case _ => None
    }

  def parseEmail(b: Array[Byte]): Option[Email] =
    try {
      if (b == null || b.length < 10) return None
      val s = new String(b, "UTF-8")
      val (headers, bodyStart) = parseHeaders(s, 0).getOrElse(return None)
      if (!headers.contains("from") && !headers.contains("subject") &&
        !headers.contains("date")) return None // not mail-shaped
      val from = headers.get("from")
      val subject = headers.get("subject").map(decodeEncodedWords)
      val date = headers.get("date")
      val ct = headers.getOrElse("content-type", "text/plain")
      val mt = mediaType(ct)
      val body = s.substring(bodyStart)
      if (mt.startsWith("multipart/")) {
        val boundary = ctParam(ct, "boundary").getOrElse(return None)
        val delim = "--" + boundary
        // RFC 2046 §5.1.1: a delimiter is CRLF--boundary anchored at a
        // LINE START, and the remainder of its line must be empty,
        // "--" (the close), or transport padding — a body line merely
        // CONTAINING the substring, or a longer sibling boundary
        // sharing the prefix, is content, not a boundary.
        // marks: (delim line start, index past the line's EOL, isClose)
        val marks = scala.collection.mutable.ArrayBuffer
          .empty[(Int, Int, Boolean)]
        var p = 0
        while (p >= 0) {
          val at = body.indexOf(delim, p)
          if (at < 0) p = -1
          else {
            val atLineStart = at == 0 || body.charAt(at - 1) == '\n'
            var eol = at + delim.length
            while (eol < body.length && body.charAt(eol) != '\n') eol += 1
            val rest = body.substring(at + delim.length, eol)
              .stripSuffix("\r")
            val isClose = rest.startsWith("--") &&
              rest.drop(2).forall(c => c == ' ' || c == '\t')
            val isOpen = rest.forall(c => c == ' ' || c == '\t')
            if (atLineStart && (isOpen || isClose))
              marks += ((at, math.min(eol + 1, body.length), isClose))
            p = at + 1
          }
        }
        // parts sit between consecutive delimiter lines, up to the
        // first close; text before the first delimiter is the preamble
        var nParts = 0
        var text: Option[String] = None
        var closed = false
        var k = 0
        while (k < marks.length && !closed) {
          if (marks(k)._3) closed = true
          else if (k + 1 < marks.length) {
            // the CRLF before the next delimiter belongs to the
            // delimiter, not the part (handled by the suffix strip)
            val part = body.substring(marks(k)._2, marks(k + 1)._1)
            val trimmed = part.dropWhile(c => c == '\r' || c == '\n')
            parseHeaders(trimmed, 0) match {
              case Some((ph, pBodyAt)) =>
                nParts += 1
                val pct = ph.getOrElse("content-type", "text/plain")
                if (text.isEmpty && mediaType(pct) == "text/plain") {
                  val pBody = trimmed.substring(pBodyAt)
                    .stripSuffix("\n").stripSuffix("\r")
                  text = decodeBody(pBody,
                    ph.getOrElse("content-transfer-encoding", ""))
                }
              case None => return None // part without a header block
            }
          }
          k += 1
        }
        if (!closed || nParts == 0) return None // no --boundary-- close
        Some(Email(from, subject, date, mt, nParts, text))
      } else {
        val text =
          if (mt == "text/plain")
            decodeBody(body.stripSuffix("\n").stripSuffix("\r"),
              headers.getOrElse("content-transfer-encoding", ""))
          else None
        Some(Email(from, subject, date, mt, 1, text))
      }
    } catch { case _: Exception => None }

  // ---- fixture emitters ----------------------------------------------

  /** Multipart fixture: folded To: header, an RFC 2047 subject (B or
    * Q by flag), a QP text/plain part (with an encoded '=' and a soft
    * line break), a base64 HTML part, closed boundary. */
  def encodeMultipart(fromAddr: String, subject: String, date: String,
      textBody: String, useB: Boolean): Array[Byte] = {
    val encSubject =
      if (useB)
        "=?UTF-8?B?" + java.util.Base64.getEncoder.encodeToString(
          subject.getBytes("UTF-8")) + "?="
      else
        "=?UTF-8?Q?" + subject.flatMap {
          case ' ' => "_"
          case c if c == '=' || c == '?' || c == '_' || c > 126 =>
            c.toString.getBytes("UTF-8").map(x => f"=${x & 0xff}%02X")
              .mkString
          case c => c.toString
        } + "?="
    val qpBody = textBody.flatMap {
      case '=' => "=3D"
      case c if c > 126 =>
        c.toString.getBytes("UTF-8").map(x => f"=${x & 0xff}%02X").mkString
      case c => c.toString
    } + "=\nsoft-wrapped tail"
    val b64Html = java.util.Base64.getEncoder
      .encodeToString("<p>html twin</p>".getBytes("UTF-8"))
    val msg =
      s"""From: $fromAddr
         |To: list@example.test,
         |\tarchive@example.test
         |Subject: $encSubject
         |Date: $date
         |MIME-Version: 1.0
         |Content-Type: multipart/alternative; boundary="b0undary42"
         |
         |preamble to ignore
         |--b0undary42
         |Content-Type: text/plain; charset=utf-8
         |Content-Transfer-Encoding: quoted-printable
         |
         |$qpBody
         |--b0undary42
         |Content-Type: text/html; charset=utf-8
         |Content-Transfer-Encoding: base64
         |
         |$b64Html
         |--b0undary42--
         |""".stripMargin
    msg.getBytes("UTF-8")
  }
}

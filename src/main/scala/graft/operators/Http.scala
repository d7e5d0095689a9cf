package graft.operators

import java.io.ByteArrayOutputStream

/** HTTP/1.x response parsing (public spec: RFC 9110/9112) — the layer
  * between a WARC response record's payload and the HTML the text
  * pipeline wants: status line, header block, and the body, with
  * chunked transfer-encoding REALLY decoded (hex size lines walked;
  * a crawl's stored responses are full of chunked bodies).
  *
  * Malformed input returns None — the [[ImageHeaders]] posture. Header
  * names lowercase; [[contentType]]/[[charsetParam]] split the
  * media-type from its parameters.
  */
object Http {

  final case class HttpResponse(status: Int,
      headers: Map[String, String], body: Array[Byte],
      trailers: Map[String, String] = Map.empty)

  private val Crlf = "\r\n"

  def parseResponse(b: Array[Byte]): Option[HttpResponse] = {
    if (b == null) return None
    val headerEnd = indexOfSeq(b, (Crlf + Crlf).getBytes, 0)
    if (headerEnd < 0) return None
    val head = new String(b, 0, headerEnd, "ISO-8859-1")
    val lines = head.split(Crlf, -1)
    if (lines.isEmpty) return None
    val status0 = lines(0).split(" ", 3)
    if (status0.length < 2 || !status0(0).startsWith("HTTP/")) return None
    val status = status0(1).toIntOption.getOrElse(return None)
    val headers = lines.drop(1).flatMap { line =>
      val colon = line.indexOf(':')
      if (colon > 0)
        Some(line.substring(0, colon).trim.toLowerCase ->
          line.substring(colon + 1).trim)
      else None
    }.toMap
    val raw = java.util.Arrays.copyOfRange(b, headerEnd + 4, b.length)
    val (body, trailers) =
      if (headers.get("transfer-encoding").exists(
        _.toLowerCase.contains("chunked"))) dechunk(raw) match {
        case Some(dt) => dt
        case None => return None
      }
      else headers.get("content-length").flatMap(_.toLongOption) match {
        case Some(len) if len <= raw.length =>
          (java.util.Arrays.copyOfRange(raw, 0, len.toInt),
            Map.empty[String, String])
        case Some(_) => return None // declares more than it carries
        case None => (raw, Map.empty[String, String]) // to end of record
      }
    Some(HttpResponse(status, headers, body, trailers))
  }

  /** Chunked transfer decoding: hex-size line, chunk bytes, CRLF,
    * repeated; a 0-size chunk ends the body, then the TRAILER section
    * (RFC 9112 §7.1.2 — round 12; ignored before): zero or more field
    * lines, then the closing empty line. Bytes AFTER the closing line
    * are tolerated and ignored (real captures carry stray padding —
    * the pre-trailer parser's tolerance, kept: a verified body must
    * not be discarded over record-boundary slop); a NON-FIELD line
    * inside the section, or a section that never closes, is torn.
    * Trailer names lowercase like headers (checksums/signatures a
    * server computes while streaming land here). */
  private def dechunk(b: Array[Byte]):
      Option[(Array[Byte], Map[String, String])] = {
    val out = new ByteArrayOutputStream(b.length)
    var off = 0
    while (true) {
      val lineEnd = indexOfSeq(b, Crlf.getBytes, off)
      if (lineEnd < 0) return None
      val sizeStr = new String(b, off, lineEnd - off, "ISO-8859-1")
        .takeWhile(_ != ';') // chunk extensions ignored
        .trim
      val size = try Integer.parseInt(sizeStr, 16)
      catch { case _: NumberFormatException => return None }
      if (size < 0) return None
      if (size == 0) {
        var toff = lineEnd + 2
        val tr = Map.newBuilder[String, String]
        while (true) {
          val e = indexOfSeq(b, Crlf.getBytes, toff)
          if (e < 0) return None
          if (e == toff) // empty line: end of the trailer section
            return Some((out.toByteArray, tr.result()))
          val line = new String(b, toff, e - toff, "ISO-8859-1")
          val colon = line.indexOf(':')
          if (colon <= 0) return None // a non-field trailer line is torn
          tr += (line.substring(0, colon).trim.toLowerCase ->
            line.substring(colon + 1).trim)
          toff = e + 2
        }
      }
      val dataStart = lineEnd + 2
      if (dataStart + size + 2 > b.length) return None
      out.write(b, dataStart, size)
      if (b(dataStart + size) != '\r' || b(dataStart + size + 1) != '\n')
        return None
      off = dataStart + size + 2
    }
    None // unreachable
  }

  /** The media type of a Content-Type header value, lowercased,
    * parameters stripped: "text/HTML; charset=utf-8" -> "text/html". */
  def contentType(headerValue: String): Option[String] =
    Option(headerValue).map(_.split(";")(0).trim.toLowerCase)
      .filter(_.nonEmpty)

  /** The charset parameter, lowercased, quotes stripped. */
  def charsetParam(headerValue: String): Option[String] =
    Option(headerValue).flatMap(_.split(";").drop(1).collectFirst {
      case p if p.trim.toLowerCase.startsWith("charset=") =>
        p.trim.substring(8).trim.stripPrefix("\"").stripSuffix("\"")
          .toLowerCase
    }).filter(_.nonEmpty)

  private def indexOfSeq(b: Array[Byte], target: Array[Byte],
      from: Int): Int = {
    val n = b.length
    val m = target.length
    var i = math.max(from, 0)
    while (i + m <= n) {
      var j = 0
      while (j < m && b(i + j) == target(j)) j += 1
      if (j == m) return i
      i += 1
    }
    -1
  }

  /** Fixture emitter: a byte-valid response; `chunked` splits the body
    * into two chunks with a trailing zero chunk; `trailers` (chunked
    * only) emit after the zero chunk with a declaring Trailer header. */
  def encodeResponse(status: Int, contentTypeValue: String,
      body: Array[Byte], chunked: Boolean,
      trailers: Seq[(String, String)] = Nil): Array[Byte] = {
    require(trailers.isEmpty || chunked, "trailers need chunked encoding")
    val sb = new StringBuilder
    sb.append("HTTP/1.1 ").append(status).append(" X").append(Crlf)
    sb.append("Content-Type: ").append(contentTypeValue).append(Crlf)
    if (chunked) sb.append("Transfer-Encoding: chunked").append(Crlf)
    else sb.append("Content-Length: ").append(body.length).append(Crlf)
    if (trailers.nonEmpty)
      sb.append("Trailer: ").append(trailers.map(_._1).mkString(", "))
        .append(Crlf)
    sb.append(Crlf)
    val head = sb.toString.getBytes("ISO-8859-1")
    if (!chunked) head ++ body
    else {
      val half = body.length / 2
      val out = new ByteArrayOutputStream(body.length + 64)
      out.write(head, 0, head.length)
      def chunk(data: Array[Byte], from: Int, len: Int): Unit = {
        out.write(Integer.toHexString(len).getBytes("ISO-8859-1"))
        out.write('\r'); out.write('\n')
        out.write(data, from, len)
        out.write('\r'); out.write('\n')
      }
      if (half > 0) chunk(body, 0, half)
      if (body.length - half > 0) chunk(body, half, body.length - half)
      out.write('0'); out.write('\r'); out.write('\n')
      trailers.foreach { case (k, v) =>
        out.write(s"$k: $v".getBytes("ISO-8859-1"))
        out.write('\r'); out.write('\n')
      }
      out.write('\r'); out.write('\n')
      out.toByteArray
    }
  }
}

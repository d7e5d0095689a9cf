package graft.operators

/** WARC (ISO 28500 / WARC/1.1) record parsing — THE crawl storage
  * format: a web archive file is a concatenation of records, each
  *
  * {{{
  * WARC/1.1\r\n
  * Name: value\r\n ...      (named fields; Content-Length mandatory)
  * \r\n                      (blank line ends the header block)
  * <Content-Length payload bytes>
  * \r\n\r\n                  (record boundary)
  * }}}
  *
  * The splitter JUMPS payloads by the declared Content-Length — it
  * never scans payload bytes for boundaries (payloads routinely
  * contain "WARC/1.1" text; a scanner would tear records). A record
  * with a malformed header block or a Content-Length past the buffer
  * ends the walk — everything parsed up to that point is returned
  * (one torn tail must not discard a shard's good records).
  *
  * Header names are case-insensitive (stored lowercased); values are
  * trimmed. Payload bytes are returned as-is (they are typically an
  * HTTP response — headers + body — which downstream stages parse).
  */
object Warc {

  final case class WarcRecord(recordIdx: Int, warcType: String,
      targetUri: Option[String], recordId: Option[String],
      contentLength: Long, payload: Array[Byte])

  private val Crlf = "\r\n"

  /** Parse a concatenated-record WARC buffer. */
  def parse(b: Array[Byte]): Vector[WarcRecord] = {
    if (b == null) return Vector.empty
    val out = Vector.newBuilder[WarcRecord]
    var off = 0
    var idx = 0
    var ok = true
    while (ok && off < b.length) {
      parseRecord(b, off, idx) match {
        case Some((rec, next)) =>
          out += rec
          off = next
          idx += 1
        case None => ok = false
      }
    }
    out.result()
  }

  /** One record at `off`: Some((record, offsetAfter)) or None. */
  private def parseRecord(b: Array[Byte], off: Int,
      idx: Int): Option[(WarcRecord, Int)] = {
    val headerEnd = indexOfSeq(b, (Crlf + Crlf).getBytes, off)
    if (headerEnd < 0) return None
    val header = new String(b, off, headerEnd - off, "ISO-8859-1")
    val lines = header.split(Crlf, -1)
    if (lines.isEmpty || !lines(0).startsWith("WARC/")) return None
    var warcType = ""
    var targetUri: Option[String] = None
    var recordId: Option[String] = None
    var contentLength = -1L
    lines.drop(1).foreach { line =>
      val colon = line.indexOf(':')
      if (colon > 0) {
        val k = line.substring(0, colon).trim.toLowerCase
        val v = line.substring(colon + 1).trim
        k match {
          case "warc-type" => warcType = v
          case "warc-target-uri" => targetUri = Some(v)
          case "warc-record-id" => recordId = Some(v)
          case "content-length" =>
            contentLength = v.toLongOption.getOrElse(-1L)
          case _ => ()
        }
      }
    }
    if (contentLength < 0) return None
    val payloadStart = headerEnd + 4
    val payloadEnd = payloadStart.toLong + contentLength
    if (payloadEnd > b.length) return None // truncated record
    val payload = java.util.Arrays.copyOfRange(
      b, payloadStart, payloadEnd.toInt)
    // the record boundary after the payload: \r\n\r\n (tolerate EOF)
    var next = payloadEnd.toInt
    var skipped = 0
    while (next < b.length && skipped < 4 &&
      (b(next) == '\r' || b(next) == '\n')) { next += 1; skipped += 1 }
    Some((WarcRecord(idx, warcType, targetUri, recordId, contentLength,
      payload), next))
  }

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

  /** Fixture emitter: one byte-valid record. */
  def encodeRecord(warcType: String, targetUri: Option[String],
      recordId: String, payload: Array[Byte]): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.1").append(Crlf)
    sb.append("WARC-Type: ").append(warcType).append(Crlf)
    sb.append("WARC-Record-ID: ").append(recordId).append(Crlf)
    targetUri.foreach(u =>
      sb.append("WARC-Target-URI: ").append(u).append(Crlf))
    sb.append("Content-Length: ").append(payload.length).append(Crlf)
    sb.append(Crlf)
    sb.toString.getBytes("ISO-8859-1") ++ payload ++
      (Crlf + Crlf).getBytes("ISO-8859-1")
  }
}

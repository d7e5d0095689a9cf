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

  /** `refersTo` is the WARC-Refers-To record-id — set on `revisit`
    * records (RFC-profile dedup: the payload lives ONLY on the
    * referenced original; ~15% of real Common Crawl records). */
  final case class WarcRecord(recordIdx: Int, warcType: String,
      targetUri: Option[String], recordId: Option[String],
      contentLength: Long, payload: Array[Byte],
      refersTo: Option[String] = None)

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
    var refersTo: Option[String] = None
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
          case "warc-refers-to" => refersTo = Some(v)
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
      payload, refersTo), next))
  }

  /** Revisit-record RESOLUTION: route each `revisit` row to the
    * payload of the record its WARC-Refers-To names. Input columns:
    * doc_id, warc_type, record_id, refers_to, payload_len,
    * payload_md5; output replaces the revisit rows' payload columns
    * with the referenced original's and adds `payload_from` (the
    * provider's doc_id; NULL = dangling reference, surfaced not
    * dropped).
    *
    * 100 TB shape: one hash-shuffle join keyed on record-id. The
    * originals side is filtered to non-revisit records and reduced to
    * ONE provider per record-id (min-doc_id survivorship — duplicate
    * ids are a real concatenated-dump artifact) before the join, the
    * revisit side is ~15%
    * of the corpus (Common Crawl's measured revisit mass), and both
    * sides shuffle ONCE on the join key — no broadcast (originals are
    * corpus-scale), no driver-side state. Revisits referencing other
    * shards resolve for free: the shuffle co-locates by id regardless
    * of which .warc.zst member either record came from. */
  def resolveRevisits(records: org.apache.spark.sql.DataFrame):
      org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.{col, min, struct}
    val originals = records.filter(col("warc_type") =!= "revisit")
    val revisits = records.filter(col("warc_type") === "revisit")
    // real concatenated dumps carry DUPLICATE record-ids (a re-crawled
    // segment merged twice) — pin one provider per id (min doc_id
    // survivorship, the CDC last-op-per-key pattern) or every revisit
    // referencing a duplicated id fans out into multiple rows
    val src = originals
      .groupBy(col("record_id").as("src_record_id"))
      .agg(min(struct(col("doc_id"), col("payload_len"),
        col("payload_md5"))).as("s"))
      .select(col("src_record_id"),
        col("s.payload_len").as("src_payload_len"),
        col("s.payload_md5").as("src_payload_md5"),
        col("s.doc_id").as("src_doc_id"))
    val resolved = revisits
      .join(src, revisits("refers_to") === src("src_record_id"), "left")
      .select(revisits("doc_id"), revisits("warc_type"),
        col("src_payload_len").as("payload_len"),
        col("src_payload_md5").as("payload_md5"),
        col("src_doc_id").as("payload_from"))
    val direct = originals.select(col("doc_id"), col("warc_type"),
      col("payload_len"), col("payload_md5"),
      col("doc_id").as("payload_from"))
    direct.unionByName(resolved)
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

  /** Fixture emitter: one byte-valid record. `refersTo` adds the
    * WARC-Refers-To field revisit records carry. */
  def encodeRecord(warcType: String, targetUri: Option[String],
      recordId: String, payload: Array[Byte],
      refersTo: Option[String] = None): Array[Byte] = {
    val sb = new StringBuilder
    sb.append("WARC/1.1").append(Crlf)
    sb.append("WARC-Type: ").append(warcType).append(Crlf)
    sb.append("WARC-Record-ID: ").append(recordId).append(Crlf)
    targetUri.foreach(u =>
      sb.append("WARC-Target-URI: ").append(u).append(Crlf))
    refersTo.foreach(r =>
      sb.append("WARC-Refers-To: ").append(r).append(Crlf))
    sb.append("Content-Length: ").append(payload.length).append(Crlf)
    sb.append(Crlf)
    sb.toString.getBytes("ISO-8859-1") ++ payload ++
      (Crlf + Crlf).getBytes("ISO-8859-1")
  }
}

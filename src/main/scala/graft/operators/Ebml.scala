package graft.operators

import java.io.ByteArrayOutputStream

import graft.engine.Tables

/** EBML / Matroska / WebM container walk — the video container format
  * the MP4 walk (q241) left uncovered; WebM is what a web crawl's
  * <video> tags actually serve.
  *
  * EBML is a binary XML: every element is (variable-length ID,
  * variable-length VINT size, payload), masters nest. The two varint
  * flavors are the format's teeth: element IDs KEEP their length
  * marker bit (0x1A45DFA3 is compared with the marker), VINT sizes
  * mask it OFF — confuse the two and every offset after the first
  * element is garbage. The walk parses the EBML header (DocType
  * dispatch: webm vs matroska), Segment → Info (TimestampScale),
  * Tracks (type census + codec ids), Clusters (SimpleBlock count +
  * payload byte sum; block internals are hopped as opaque bytes —
  * frame decode is out of scope). Unknown elements are hopped by
  * size, the recursion never reads past a master's declared end,
  * corrupt → None. Map-only, linear.
  *
  * Reference analogue: the map-side per-record parse slot
  * (mapper.py:21-41); the format is the public RFC 8794 (EBML) and
  * the Matroska spec.
  */
object Ebml {

  // element IDs (with marker bits, as they appear on the wire)
  private val IdEbml = 0x1a45dfa3L
  private val IdEbmlVersion = 0x4286L
  private val IdEbmlReadVersion = 0x42f7L
  private val IdDocType = 0x4282L
  private val IdDocTypeVersion = 0x4287L
  private val IdSegment = 0x18538067L
  private val IdInfo = 0x1549a966L
  private val IdTimestampScale = 0x2ad7b1L
  private val IdMuxingApp = 0x4d80L
  private val IdTracks = 0x1654ae6bL
  private val IdTrackEntry = 0xaeL
  private val IdTrackNumber = 0xd7L
  private val IdTrackType = 0x83L
  private val IdCodecId = 0x86L
  private val IdCluster = 0x1f43b675L
  private val IdTimestamp = 0xe7L
  private val IdSimpleBlock = 0xa3L

  // ------------------------------------------------------------------
  // wire primitives
  // ------------------------------------------------------------------

  private def idBytes(id: Long): Int =
    if (id <= 0xffL) 1 else if (id <= 0xffffL) 2
    else if (id <= 0xffffffL) 3 else 4

  private def writeId(out: ByteArrayOutputStream, id: Long): Unit = {
    val n = idBytes(id)
    var i = n - 1
    while (i >= 0) { out.write(((id >> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  /** VINT: length from the leading-zeros marker in the first byte; the
    * marker bit is NOT part of the value. Minimal-length encoding. */
  private def writeSize(out: ByteArrayOutputStream, v: Long): Unit = {
    require(v >= 0, s"negative size $v")
    var n = 1
    while (n < 8 && v >= (1L << (7 * n)) - 1) n += 1 // all-ones reserved
    val marked = v | (1L << (7 * n))
    var i = n - 1
    while (i >= 0) { out.write(((marked >> (8 * i)) & 0xff).toInt); i -= 1 }
  }

  private def element(id: Long, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length + 12)
    writeId(out, id); writeSize(out, payload.length)
    out.write(payload, 0, payload.length)
    out.toByteArray
  }

  private def uintPayload(v: Long): Array[Byte] = {
    var n = 1
    while (n < 8 && (v >> (8 * n)) != 0) n += 1
    Array.tabulate(n)(i => ((v >> (8 * (n - 1 - i))) & 0xff).toByte)
  }

  /** Build a byte-valid WebM/Matroska fixture stream. */
  def encodeWebm(docType: String, tsScale: Long, trackCodecs: Seq[(Int, String)],
      clusterTs: Long, blocks: Seq[Array[Byte]]): Array[Byte] = {
    val header = element(IdEbml,
      element(IdEbmlVersion, uintPayload(1)) ++
        element(IdEbmlReadVersion, uintPayload(1)) ++
        element(IdDocType, docType.getBytes("US-ASCII")) ++
        element(IdDocTypeVersion, uintPayload(4)))
    val info = element(IdInfo,
      element(IdTimestampScale, uintPayload(tsScale)) ++
        element(IdMuxingApp, "graft".getBytes("US-ASCII")))
    val tracks = element(IdTracks,
      trackCodecs.zipWithIndex.map { case ((typ, codec), i) =>
        element(IdTrackEntry,
          element(IdTrackNumber, uintPayload(i + 1)) ++
            element(IdTrackType, uintPayload(typ)) ++
            element(IdCodecId, codec.getBytes("US-ASCII")))
      }.fold(Array.emptyByteArray)(_ ++ _))
    val cluster = element(IdCluster,
      element(IdTimestamp, uintPayload(clusterTs)) ++
        blocks.map(b => element(IdSimpleBlock, b))
          .fold(Array.emptyByteArray)(_ ++ _))
    header ++ element(IdSegment, info ++ tracks ++ cluster)
  }

  // ------------------------------------------------------------------
  // walk
  // ------------------------------------------------------------------

  private final class Walk(val bytes: Array[Byte]) {
    var pos = 0
    def readId(): Long = {
      val b0 = bytes(pos) & 0xff
      val n = if ((b0 & 0x80) != 0) 1 else if ((b0 & 0x40) != 0) 2
      else if ((b0 & 0x20) != 0) 3 else if ((b0 & 0x10) != 0) 4
      else throw new IllegalStateException("bad id")
      var v = 0L
      var i = 0
      while (i < n) { v = (v << 8) | (bytes(pos + i) & 0xff); i += 1 }
      pos += n
      v // IDs keep the marker
    }
    def readSize(): Long = {
      val b0 = bytes(pos) & 0xff
      if (b0 == 0) throw new IllegalStateException("bad vint")
      var n = 1
      var probe = 0x80
      while ((b0 & probe) == 0) { probe >>= 1; n += 1 }
      var v = (b0 & (probe - 1)).toLong
      var i = 1
      while (i < n) { v = (v << 8) | (bytes(pos + i) & 0xff); i += 1 }
      pos += n
      v // sizes mask the marker off
    }
    def readUint(len: Int): Long = {
      var v = 0L
      var i = 0
      while (i < len) { v = (v << 8) | (bytes(pos + i) & 0xff); i += 1 }
      pos += len
      v
    }
  }

  final case class WebmMeta(docType: String, tsScale: Long, tracks: Int,
      videoTracks: Int, codecs: String, blocks: Int, blockBytes: Long)

  /** Walk a WebM/Matroska stream: EBML header → DocType, Segment →
    * Info/Tracks/Clusters. Unknown ids hopped by size; never reads
    * past a master's end; corrupt → None. */
  def decodeWebm(bytes: Array[Byte]): Option[WebmMeta] =
    try {
      val w = new Walk(bytes)
      if (w.readId() != IdEbml) return None
      val hEnd = { val sz = w.readSize(); w.pos + sz }
      if (hEnd > bytes.length) return None
      var docType: String = null
      while (w.pos < hEnd) {
        val id = w.readId(); val sz = w.readSize()
        // a 56-bit VINT truncated to Int could go negative and walk
        // the cursor BACKWARD — an infinite loop on hostile streams
        if (sz < 0 || sz > bytes.length || w.pos + sz > hEnd) return None
        if (id == IdDocType)
          docType = new String(bytes, w.pos, sz.toInt, "US-ASCII")
        w.pos += sz.toInt
      }
      if (docType == null) return None
      if (w.readId() != IdSegment) return None
      val segEnd = { val sz = w.readSize(); w.pos + sz }
      if (segEnd > bytes.length) return None
      var tsScale = 1000000L // Matroska default
      var tracks = 0; var videoTracks = 0
      val codecs = Seq.newBuilder[String]
      var blocks = 0; var blockBytes = 0L
      while (w.pos < segEnd) {
        val id = w.readId(); val szL = w.readSize()
        if (szL < 0 || szL > bytes.length) return None // no backward walks
        val sz = szL.toInt
        val end = w.pos + sz
        if (end > segEnd) return None
        if (id == IdInfo) {
          while (w.pos < end) {
            // validate the Long BEFORE .toInt: a hostile 5-byte VINT
            // like 2^32 would truncate to 0 and silently misparse
            val iid = w.readId(); val iszL = w.readSize()
            if (iszL < 0 || w.pos + iszL > end) return None
            val isz = iszL.toInt
            if (iid == IdTimestampScale) tsScale = w.readUint(isz)
            else w.pos += isz
          }
        } else if (id == IdTracks) {
          while (w.pos < end) {
            val tid = w.readId(); val tszL = w.readSize()
            if (tszL < 0 || w.pos + tszL > end) return None
            val tsz = tszL.toInt
            val tEnd = w.pos + tsz
            if (tid == IdTrackEntry) {
              tracks += 1
              while (w.pos < tEnd) {
                val eid = w.readId(); val eszL = w.readSize()
                if (eszL < 0 || w.pos + eszL > tEnd) return None
                val esz = eszL.toInt
                if (eid == IdTrackType) {
                  if (w.readUint(esz) == 1L) videoTracks += 1
                } else if (eid == IdCodecId) {
                  codecs += new String(bytes, w.pos, esz, "US-ASCII")
                  w.pos += esz
                } else w.pos += esz
              }
            } else w.pos = tEnd
          }
        } else if (id == IdCluster) {
          while (w.pos < end) {
            val cid = w.readId(); val cszL = w.readSize()
            if (cszL < 0 || w.pos + cszL > end) return None
            val csz = cszL.toInt
            if (cid == IdSimpleBlock) { blocks += 1; blockBytes += csz }
            w.pos += csz
          }
        } else w.pos = end
      }
      Some(WebmMeta(docType, tsScale, tracks, videoTracks,
        codecs.result().sorted.mkString(","), blocks, blockBytes))
    } catch { case _: Exception => None }

  final case class WebmRow(doc_id: Long, doctype: String, ts_scale: Long,
      tracks: Int, video_tracks: Int, codecs: String, blocks: Int,
      block_bytes: Long)

  val defs: Seq[QueryDef] = Seq(

    // ----- WebM/Matroska walk: varint IDs/sizes, nested masters -------
    // Each doc becomes a byte-valid WebM (or matroska, by id) stream:
    // 1-3 tracks with type/codec from id arithmetic, one cluster whose
    // two SimpleBlocks split the doc text (variable sizes — the VINT
    // length choice actually varies). The walk recovers doctype /
    // timestamp scale / track census / codec list / block byte sum;
    // the oracle replays the arithmetic incl. octet lengths.
    QueryDef(
      "q344_webm_container_walk",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text").fanout.as[(Long, String)]
          .map { case (id, text) =>
            val docType = if (id % 2 == 0) "webm" else "matroska"
            val nTracks = (1 + id % 3).toInt
            val trackCodecs = (0 until nTracks).map { i =>
              if (i == 0) (1, "V_VP9") else (2, "A_OPUS")
            }
            val payload = text.getBytes("UTF-8")
            val half = payload.length / 2
            val blocks = Seq(payload.take(half), payload.drop(half))
            val blob = encodeWebm(docType, 1000000L * (1 + id % 3),
              trackCodecs, id % 100000, blocks)
            decodeWebm(blob) match {
              case Some(m) => WebmRow(id, m.docType, m.tsScale, m.tracks,
                m.videoTracks, m.codecs, m.blocks, m.blockBytes)
              case None => WebmRow(id, "", -1L, -1, -1, "", -1, -1L)
            }
          }.toDF().orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'webm' ELSE 'matroska' END
                 AS doctype,
               CAST(1000000 * (1 + doc_id % 3) AS BIGINT) AS ts_scale,
               CAST(1 + doc_id % 3 AS INT) AS tracks,
               CAST(1 AS INT) AS video_tracks,
               CASE doc_id % 3 WHEN 0 THEN 'V_VP9'
                    WHEN 1 THEN 'A_OPUS,V_VP9'
                    ELSE 'A_OPUS,A_OPUS,V_VP9' END AS codecs,
               CAST(2 AS INT) AS blocks,
               CAST(octet_length(encode(text)) AS BIGINT) AS block_bytes
        FROM documents
        ORDER BY doc_id"""))
  )
}

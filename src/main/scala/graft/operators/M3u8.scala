package graft.operators

/** HLS playlist parsing (public spec, RFC 8216 — HTTP Live
  * Streaming). Playlists are how video actually ships on the web: a
  * crawl that stores MP4 headers (q241) but cannot read the M3U8
  * manifests next to them cannot answer "how long is this stream,
  * at which renditions, is it live or VOD" — the fields a video
  * curation pass filters on before fetching a single segment.
  *
  * Two playlist kinds share the #EXTM3U grammar: MEDIA playlists
  * (EXTINF per segment, EXT-X-TARGETDURATION, EXT-X-ENDLIST = VOD)
  * and MASTER playlists (EXT-X-STREAM-INF with BANDWIDTH/RESOLUTION
  * attribute lists, one variant URI per entry). Durations sum in
  * integral milliseconds (each EXTINF rounded half-up) so the totals
  * replay exactly. Not-a-playlist / structurally broken → None.
  */
object M3u8 {

  /** `kind` is "media" or "master"; media fields zero on master and
    * vice versa. `totalDurationMs` sums per-segment EXTINF rounded to
    * ms; `ended` = EXT-X-ENDLIST present (VOD vs live). */
  final case class HlsMeta(kind: String, version: Int, nSegments: Int,
      totalDurationMs: Long, targetDuration: Int, ended: Boolean,
      nVariants: Int, maxBandwidth: Long, maxWidth: Int, maxHeight: Int)

  def decodeM3u8(b: Array[Byte]): Option[HlsMeta] =
    try {
      if (b == null || b.length < 7) return None
      val text = new String(b, "UTF-8")
      val lines = text.split("\r?\n", -1).iterator.map(_.trim).toArray
      if (lines.isEmpty || lines(0) != "#EXTM3U") return None
      var version = 1 // RFC 8216 §4.3.1.2: absent tag means protocol v1
      var nSegments = 0
      var totalMs = 0L
      var target = 0
      var ended = false
      var nVariants = 0
      var maxBw = 0L
      var maxW = 0
      var maxH = 0
      var sawStreamInf = false
      var sawExtInf = false
      var i = 1
      while (i < lines.length) {
        val ln = lines(i)
        if (ln.startsWith("#EXT-X-VERSION:")) {
          version = ln.substring(15).trim.toInt
          if (version < 1) return None
        } else if (ln.startsWith("#EXTINF:")) {
          sawExtInf = true
          val spec = ln.substring(8)
          val comma = spec.indexOf(',')
          val dur = (if (comma < 0) spec else spec.substring(0, comma)).trim
          val d = dur.toDouble
          if (d < 0 || !java.lang.Double.isFinite(d)) return None
          totalMs += math.round(d * 1000)
          // the next non-tag, non-blank line is the segment URI
          var j = i + 1
          while (j < lines.length &&
            (lines(j).isEmpty || lines(j).startsWith("#"))) j += 1
          if (j >= lines.length) return None // EXTINF with no URI
          nSegments += 1
          i = j
        } else if (ln.startsWith("#EXT-X-TARGETDURATION:")) {
          target = ln.substring(22).trim.toInt
        } else if (ln == "#EXT-X-ENDLIST") {
          ended = true
        } else if (ln.startsWith("#EXT-X-STREAM-INF:")) {
          sawStreamInf = true
          val attrs = attrList(ln.substring(18))
          val bw = attrs.get("BANDWIDTH").map(_.toLong).getOrElse(return None)
          if (bw <= 0) return None
          var j = i + 1
          while (j < lines.length &&
            (lines(j).isEmpty || lines(j).startsWith("#"))) j += 1
          if (j >= lines.length) return None // STREAM-INF with no URI
          nVariants += 1
          if (bw > maxBw) maxBw = bw
          attrs.get("RESOLUTION").foreach { r =>
            val x = r.indexOf('x')
            if (x > 0) {
              val w = r.substring(0, x).toInt
              val h = r.substring(x + 1).toInt
              if (w > maxW) { maxW = w; maxH = h }
            }
          }
          i = j
        }
        i += 1
      }
      if (sawStreamInf && sawExtInf) return None // mixed kinds: malformed
      if (!sawStreamInf && !sawExtInf) return None // neither: not a playlist
      if (sawStreamInf)
        Some(HlsMeta("master", version, 0, 0L, 0, ended = false,
          nVariants, maxBw, maxW, maxH))
      else
        Some(HlsMeta("media", version, nSegments, totalMs, target, ended,
          0, 0L, 0, 0))
    } catch { case _: Exception => None }

  /** RFC 8216 §4.2 attribute list: NAME=value pairs, comma-separated,
    * values either quoted strings (commas allowed inside) or raw
    * tokens. */
  private def attrList(s: String): Map[String, String] = {
    val out = Map.newBuilder[String, String]
    var i = 0
    while (i < s.length) {
      val eq = s.indexOf('=', i)
      if (eq < 0) return out.result()
      val name = s.substring(i, eq).trim
      var j = eq + 1
      var value = ""
      if (j < s.length && s.charAt(j) == '"') {
        val e = s.indexOf('"', j + 1)
        if (e < 0) return out.result()
        value = s.substring(j + 1, e)
        j = e + 1
        if (j < s.length && s.charAt(j) == ',') j += 1
      } else {
        var e = s.indexOf(',', j)
        if (e < 0) e = s.length
        value = s.substring(j, e).trim
        j = e + 1
      }
      out += name -> value
      i = j
    }
    out.result()
  }

  /** Fixture emitter, media playlist: versioned header, EXTINF with
    * one-decimal durations (exact in ms), comment + blank-line noise
    * the URI scan must hop, ENDLIST by flag. */
  def encodeMediaPlaylist(version: Int, targetDuration: Int,
      durationsTenths: Seq[Int], ended: Boolean): Array[Byte] = {
    require(durationsTenths.nonEmpty && durationsTenths.forall(_ >= 0))
    val sb = new StringBuilder("#EXTM3U\n")
    sb.append(s"#EXT-X-VERSION:$version\n")
    sb.append(s"#EXT-X-TARGETDURATION:$targetDuration\n")
    sb.append("#EXT-X-MEDIA-SEQUENCE:0\n")
    durationsTenths.zipWithIndex.foreach { case (t, k) =>
      sb.append(s"#EXTINF:${t / 10}.${t % 10},segment $k\n")
      if (k % 3 == 0) sb.append("# comment the scan must hop\n\n")
      sb.append(s"seg$k.ts\n")
    }
    if (ended) sb.append("#EXT-X-ENDLIST\n")
    sb.toString.getBytes("UTF-8")
  }

  /** Fixture emitter, master playlist: one STREAM-INF per variant
    * (bandwidth, RESOLUTION, a quoted CODECS attr carrying a comma
    * the attr-list parser must not split on). */
  def encodeMasterPlaylist(version: Int,
      variants: Seq[(Long, Int, Int)]): Array[Byte] = {
    require(variants.nonEmpty)
    val sb = new StringBuilder("#EXTM3U\n")
    sb.append(s"#EXT-X-VERSION:$version\n")
    variants.zipWithIndex.foreach { case ((bw, w, h), k) =>
      sb.append(s"""#EXT-X-STREAM-INF:BANDWIDTH=$bw,""" +
        s"""CODECS="avc1.64001f,mp4a.40.2",RESOLUTION=${w}x$h\n""")
      sb.append(s"rendition$k/playlist.m3u8\n")
    }
    sb.toString.getBytes("UTF-8")
  }
}

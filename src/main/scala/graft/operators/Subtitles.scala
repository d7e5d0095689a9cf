package graft.operators

import graft.engine.Tables

/** Subtitle parsing — SRT and WebVTT, the two formats every
  * video-with-transcript training corpus carries.
  *
  * A video curation pipeline reads subtitles long before it decodes a
  * single frame: cue timing drives clip segmentation, cue text is the
  * aligned transcript, and timing sanity (monotone, non-overlapping,
  * plausible chars/sec) is a quality gate. This implements real
  * parsers for both formats — SRT (`index / HH:MM:SS,mmm -->
  * HH:MM:SS,mmm / text / blank`) and WebVTT (`WEBVTT` header,
  * `MM:SS.mmm` or `HH:MM:SS.mmm` timestamps, cue settings after the
  * arrow, NOTE blocks) — normalized into one cue list, with a header
  * dispatch between them. Parse is a per-document state machine
  * (map-only, linear, malformed cues skipped not thrown); the oracle
  * replays cue arithmetic from the fixture formulas, so a timestamp
  * misparse, a dropped cue, or a settings-bleed into text all land in
  * the hash.
  *
  * Reference analogue: the map-side per-record parse slot
  * (mapper.py:21-41); formats are the public SubRip convention and
  * the W3C WebVTT spec.
  */
object Subtitles {

  final case class Cue(index: Int, startMs: Long, endMs: Long, text: String)

  // hours group is (\d{2,}): SRT has no day field, so long media (and
  // the q342 fixture's doc_id-derived times past ~sf7) legitimately
  // carry 3+ hour digits; common SRT tooling accepts them
  private val SrtTime =
    """(\d{2,}):(\d{2}):(\d{2})[,.](\d{3})""".r

  private def parseSrtTime(s: String): Option[Long] = s.trim match {
    case SrtTime(h, m, sec, ms) =>
      Some(h.toLong * 3600000 + m.toLong * 60000 + sec.toLong * 1000 +
        ms.toLong)
    case _ => None
  }

  /** VTT timestamps allow MM:SS.mmm (hours optional). */
  private def parseVttTime(s: String): Option[Long] = {
    val t = s.trim
    val parts = t.split(':')
    try {
      if (parts.length == 3) {
        val Array(h, m, rest) = parts
        val Array(sec, ms) = rest.split('.')
        Some(h.toLong * 3600000 + m.toLong * 60000 + sec.toLong * 1000 +
          ms.toLong)
      } else if (parts.length == 2) {
        val Array(m, rest) = parts
        val Array(sec, ms) = rest.split('.')
        Some(m.toLong * 60000 + sec.toLong * 1000 + ms.toLong)
      } else None
    } catch { case _: Exception => None }
  }

  /** Parse an SRT document into cues: index line, timing line with the
    * `-->` arrow, text lines until blank. Malformed cues are skipped
    * (the curation posture), not thrown. */
  def parseSrt(text: String): Seq[Cue] = {
    val blocks = text.split("\n\\s*\n")
    blocks.toSeq.flatMap { block =>
      val lines = block.split('\n').map(_.trim).filter(_.nonEmpty)
      if (lines.length < 2) None
      else {
        val idx = lines(0).toIntOption
        val timing = lines(1).split("-->")
        if (idx.isEmpty || timing.length != 2) None
        else for {
          s <- parseSrtTime(timing(0))
          e <- parseSrtTime(timing(1))
          if e >= s
        } yield Cue(idx.get, s, e, lines.drop(2).mkString(" "))
      }
    }
  }

  /** Parse a WebVTT document: WEBVTT header line, optional NOTE
    * blocks (skipped), cues with an optional identifier line, VTT
    * timestamps, cue settings after the end time dropped. */
  def parseVtt(text: String): Seq[Cue] = {
    val lines = text.split('\n')
    if (lines.isEmpty || !lines(0).trim.startsWith("WEBVTT")) return Seq.empty
    val blocks = text.split("\n\\s*\n").drop(1) // drop the header block
    var autoIndex = 0
    blocks.toSeq.flatMap { block =>
      val ls = block.split('\n').map(_.trim).filter(_.nonEmpty)
      if (ls.isEmpty || ls(0).startsWith("NOTE")) None
      else {
        // the timing line is the first containing the arrow; an
        // optional cue identifier precedes it
        val ti = ls.indexWhere(_.contains("-->"))
        if (ti < 0) None
        else {
          val parts = ls(ti).split("-->")
          // cue settings (e.g. "position:10%") follow the end time,
          // whitespace-separated — take the first token only
          val endTok = parts(1).trim.split("\\s+")(0)
          for {
            s <- parseVttTime(parts(0))
            e <- parseVttTime(endTok)
            if e >= s
          } yield {
            autoIndex += 1
            Cue(autoIndex, s, e, ls.drop(ti + 1).mkString(" "))
          }
        }
      }
    }
  }

  /** Header dispatch: WEBVTT magic → VTT, else SRT. */
  def parseSubtitles(text: String): (String, Seq[Cue]) =
    if (text.trim.startsWith("WEBVTT")) ("vtt", parseVtt(text))
    else ("srt", parseSrt(text))

  // ------------------------------------------------------------------
  // fixture emitters
  // ------------------------------------------------------------------

  private def fmtSrt(ms: Long): String =
    f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d,${ms % 1000}%03d"

  private def fmtVtt(ms: Long): String =
    f"${ms / 3600000}%02d:${ms / 60000 % 60}%02d:${ms / 1000 % 60}%02d.${ms % 1000}%03d"

  /** Build the q342 fixture document for one doc_id: cue timings are
    * pure doc_id arithmetic (the oracle replays them); even ids emit
    * SRT, odd ids WebVTT with a NOTE block and cue settings. */
  def fixtureDoc(id: Long, words: Array[String]): String = {
    val cues = (2 + id % 5).toInt
    def cueText(i: Int): String = {
      val w0 = ((id + i) % math.max(1, words.length)).toInt
      val n = 3 + (id + i) % 4 // 3-6 words
      (0 until n.toInt).map(j => words((w0 + j) % words.length)).mkString(" ")
    }
    val sb = new StringBuilder
    if (id % 2 == 0) {
      var i = 0
      while (i < cues) {
        val s = id * 1000 + i * 3000
        val e = s + 1000 + (id + i) % 2000
        sb.append(i + 1).append('\n')
        sb.append(fmtSrt(s)).append(" --> ").append(fmtSrt(e)).append('\n')
        sb.append(cueText(i)).append("\n\n")
        i += 1
      }
    } else {
      sb.append("WEBVTT\n\n")
      sb.append("NOTE\nfixture transcript\n\n")
      var i = 0
      while (i < cues) {
        val s = id * 1000 + i * 3000
        val e = s + 1000 + (id + i) % 2000
        sb.append(fmtVtt(s)).append(" --> ").append(fmtVtt(e))
        sb.append(" position:10% line:0\n") // cue settings to drop
        sb.append(cueText(i)).append("\n\n")
        i += 1
      }
    }
    sb.toString
  }

  private val FixtureWords = Array("alpha", "beta", "gamma", "delta",
    "epsilon", "zeta", "eta", "theta")

  final case class SubtitleRow(doc_id: Long, format: String, cues: Int,
      first_start_ms: Long, last_end_ms: Long, speech_ms: Long, words: Int)

  val defs: Seq[QueryDef] = Seq(

    // ----- subtitle parse: SRT/VTT → cue timeline + quality gates -----
    // Even docs render SRT, odd render WebVTT (NOTE block + cue
    // settings included); the parser dispatches on the header and
    // must recover cue count, the timeline span, total speech time,
    // and the word count — all doc_id arithmetic the oracle replays.
    // A settings-bleed into text would inflate `words`; a timestamp
    // slip lands in three columns at once.
    QueryDef(
      "q342_subtitle_parse",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id").fanout.as[Long]
          .map { id =>
            val (fmt, cues) = parseSubtitles(fixtureDoc(id, FixtureWords))
            SubtitleRow(id, fmt, cues.length,
              if (cues.isEmpty) -1L else cues.head.startMs,
              if (cues.isEmpty) -1L else cues.last.endMs,
              cues.map(c => c.endMs - c.startMs).sum,
              cues.map(_.text.split("\\s+").count(_.nonEmpty)).sum)
          }.toDF().orderBy($"doc_id")
      },
      Some("""
        WITH base AS (
          SELECT doc_id, 2 + doc_id % 5 AS cues FROM documents),
        cue AS (
          SELECT doc_id, cues,
                 unnest(generate_series(0, cues - 1)) AS i FROM base),
        timed AS (
          SELECT doc_id, cues, i,
                 doc_id * 1000 + i * 3000 AS s,
                 doc_id * 1000 + i * 3000 + 1000 + (doc_id + i) % 2000 AS e,
                 3 + (doc_id + i) % 4 AS nwords
          FROM cue)
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN 'srt' ELSE 'vtt' END AS format,
               CAST(MAX(cues) AS INT) AS cues,
               CAST(MIN(s) AS BIGINT) AS first_start_ms,
               CAST(MAX(e) AS BIGINT) AS last_end_ms,
               CAST(SUM(e - s) AS BIGINT) AS speech_ms,
               CAST(SUM(nwords) AS INT) AS words
        FROM timed
        GROUP BY doc_id
        ORDER BY doc_id"""))
  )
}

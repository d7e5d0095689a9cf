package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** mbox container walk — mailing-list archives (the classic public
  * text-corpus source) ship as single mbox files holding thousands of
  * RFC 5322 messages. The container layer is tiny but easy to get
  * wrong: a message starts at a `From ` envelope line at line start
  * (preceded by a blank line or start-of-file), and body lines that
  * would collide are quoted by the writer — mboxrd semantics, the
  * superset that round-trips: ANY line matching `^>*From ` gains one
  * `>` on write and loses one on read (qmail's mboxrd definition;
  * mboxo, which only quotes the bare `^From `, reads identically
  * through this decoder for writer-conformant archives).
  *
  * [[split]] returns (envelope line, message bytes) pairs with the
  * body unquoted; each message then flows through the existing
  * [[Eml.parseEmail]] decoder unchanged — the container walk adds no
  * second header parser. A blob whose first line is not a `From `
  * envelope is not an mbox → None.
  */
object Mbox {

  /** True when `s` starting at `at` begins a `>*From ` run with
    * exactly `minGt` or more leading '>'s. */
  private def gtFromAt(s: String, at: Int, minGt: Int): Boolean = {
    var i = at
    var gt = 0
    while (i < s.length && s.charAt(i) == '>') { gt += 1; i += 1 }
    gt >= minGt && s.startsWith("From ", i)
  }

  /** Split an mbox blob into (envelopeLine, unquotedMessageBytes)
    * pairs. Decode contract: null/empty or a first line that is not
    * an envelope line → None. Unquoting removes one '>' from every
    * `^>+From ` body line (mboxrd). Trailing blank separator lines
    * are stripped from each message. */
  def split(b: Array[Byte]): Option[Vector[(String, Array[Byte])]] = {
    if (b == null || b.length < 5) return None
    val s = new String(b, "UTF-8")
    if (!s.startsWith("From ")) return None
    val out = Vector.newBuilder[(String, Array[Byte])]
    // line starts
    var lineStart = 0
    var envelope: String = null
    val body = new StringBuilder
    var prevBlank = false // previous line inside the current message
    def flush(): Unit = {
      if (envelope != null) {
        // strip the blank separator line(s) before the next envelope
        var e = body.length
        while (e > 0 && (body.charAt(e - 1) == '\n' ||
          body.charAt(e - 1) == '\r')) e -= 1
        // keep ONE trailing newline so bodies end like real files do
        val msg = body.substring(0, e) + "\n"
        out += ((envelope, msg.getBytes("UTF-8")))
      }
      body.clear()
    }
    var first = true
    while (lineStart <= s.length - 1 || first) {
      val eol = {
        val e = s.indexOf('\n', lineStart)
        if (e < 0) s.length else e
      }
      val line = s.substring(lineStart, eol)
      val bare = line.stripSuffix("\r")
      val isEnvelope = bare.startsWith("From ") && (first || prevBlank)
      if (isEnvelope) {
        flush()
        envelope = bare
        prevBlank = false
      } else {
        // mboxrd unquote: ^>+From  loses one '>'
        val emit = if (gtFromAt(bare, 0, 1)) line.substring(1) else line
        body.append(emit).append('\n')
        prevBlank = bare.isEmpty
      }
      first = false
      lineStart = eol + 1
      if (eol == s.length) lineStart = s.length + 1 // loop exit
    }
    flush()
    val res = out.result()
    if (res.isEmpty) None else Some(res)
  }

  // --------------------------------------------------- fixture emitter

  /** Write messages into one mbox blob with mboxrd quoting: every
    * body line matching `^>*From ` gains one '>'. */
  def encode(messages: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    messages.foreach { case (sender, msg) =>
      val env = s"From $sender Thu Jan  1 00:00:00 2026\n"
      out.write(env.getBytes("UTF-8"), 0, env.length)
      val text = new String(msg, "UTF-8")
      val lines = text.split("\n", -1)
      // a terminated final line leaves one empty trailing element
      val n = if (text.endsWith("\n")) lines.length - 1 else lines.length
      var i = 0
      while (i < n) {
        val line = lines(i)
        val quoted =
          if (gtFromAt(line.stripSuffix("\r"), 0, 0)) ">" + line else line
        val qb = quoted.getBytes("UTF-8")
        out.write(qb, 0, qb.length)
        out.write('\n')
        i += 1
      }
      out.write('\n') // blank separator line
    }
    out.toByteArray
  }

  /** RFC 2047 Q-encode a subject (for fixture variety). */
  private def qEncode(s: String): String =
    "=?UTF-8?Q?" + s.flatMap {
      case ' '                                      => "_"
      case c if c == '=' || c == '?' || c == '_' || c > 126 =>
        c.toString.getBytes("UTF-8").map(x => f"=${x & 0xff}%02X").mkString
      case c => c.toString
    } + "?="

  /** One plain-text message for the q423 fixture. Body plants a
    * line-start "From the start" (quoted on encode) and, on the
    * thread head, a pre-quoted ">From before" (mboxrd double-quote). */
  def fixtureMessage(id: Long, k: Long): (String, Array[Byte]) = {
    val sender = s"user${(id + k) % 7}@example.test"
    val topic = s"topic ${id % 5}"
    val subj0 = if (k == 0) topic else "Re: " + topic
    val subj = if ((id + k) % 2 == 0) qEncode(subj0) else subj0
    val body = new StringBuilder
    body.append(s"hello from message $k of doc $id\n")
    body.append("From the start this line needs quoting\n")
    if (k == 0) body.append(">From before (already quoted once)\n")
    body.append("bye\n")
    val msg =
      s"""From: $sender
         |Subject: $subj
         |Date: Thu, 1 Jan 2026 00:00:0$k +0000
         |Content-Type: text/plain; charset=utf-8
         |
         |${body.result()}""".stripMargin
    (sender, msg.getBytes("UTF-8"))
  }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // Mailing-list histogram: each doc is one mbox shard of its list's
    // archive holding 1 + id%3 messages; the walk splits the container,
    // the existing EML decoder parses each message, and the shuffle
    // carries only (list_id, participant, thread) keys — never blobs.
    // n_from_lines counts decoded bodies carrying the line-start
    // "From the start" plant: it lands in the output ONLY if mboxrd
    // unquoting worked (a broken unquote leaves ">From ..." and the
    // count drops to zero, failing the hash).
    QueryDef(
      "q423_mbox_list_histogram",
      (s, dir) => {
        import s.implicits._
        val rows = Tables.load(s, dir, "documents")
          .select($"doc_id")
          .fanout.as[Long]
          .flatMap { id =>
            val msgs = (0L to id % 3).map(k => fixtureMessage(id, k))
            val blob = encode(msgs)
            Mbox.split(blob).getOrElse(Vector.empty).flatMap {
              case (_, msgBytes) =>
                Eml.parseEmail(msgBytes).flatMap { em =>
                  for {
                    from <- em.from
                    subj <- em.subject
                  } yield {
                    val thread = subj.stripPrefix("Re: ")
                    val hasPlant = em.textBody.exists(t =>
                      t.startsWith("From the start") ||
                        t.contains("\nFrom the start"))
                    (s"list${id % 4}", from, thread,
                      if (hasPlant) 1L else 0L)
                  }
                }
            }
          }
          .toDF("list_id", "participant", "thread", "has_plant")
        rows.groupBy($"list_id", $"participant")
          .agg(count(lit(1)).as("n_msgs"),
            count_distinct($"thread").as("n_threads"),
            sum($"has_plant").as("n_from_lines"))
          .orderBy($"list_id", $"participant")
      },
      Some("""
        WITH msgs AS (
          SELECT 'list' || (doc_id % 4) AS list_id,
                 'user' || ((doc_id + k) % 7) || '@example.test'
                   AS participant,
                 'topic ' || (doc_id % 5) AS thread
          FROM documents,
               UNNEST(generate_series(0, doc_id % 3)) AS g(k))
        SELECT list_id, participant,
               CAST(count(*) AS BIGINT) AS n_msgs,
               CAST(count(DISTINCT thread) AS BIGINT) AS n_threads,
               CAST(count(*) AS BIGINT) AS n_from_lines
        FROM msgs
        GROUP BY list_id, participant
        ORDER BY list_id, participant""")))
}

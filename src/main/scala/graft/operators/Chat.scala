package graft.operators

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Chat-template assembly — the last step before an SFT corpus meets
  * the tokenizer: turns render into chat markup and the ASSISTANT
  * SPAN OFFSETS come out alongside, because the loss mask ("train
  * only on assistant chars") must be computed at render time — after
  * tokenization the role boundaries are gone. Per-conversation map
  * work; the only shuffle groups a conversation's turns (bounded by
  * conversation length). */
object Chat {

  final case class Turn(idx: Int, role: String, content: String)

  /** Render in the im_start/im_end convention; returns the full text
    * and [start, end) spans of every assistant content block in
    * UNICODE CODEPOINTS — the unit Python's len()/slicing and SQL
    * length()/substring agree on. UTF-16 char offsets (Java's native
    * unit) would silently diverge on astral-plane text. */
  def render(turns: Seq[Turn]): (String, Vector[(Long, Long)]) = {
    val sb = new StringBuilder
    val charSpans = Vector.newBuilder[(Int, Int)]
    turns.sortBy(_.idx).foreach { t =>
      sb.append("<|im_start|>").append(t.role).append('\n')
      val start = sb.length
      sb.append(t.content)
      if (t.role == "assistant") charSpans += ((start, sb.length))
      sb.append("<|im_end|>\n")
    }
    val out = sb.toString
    (out, charSpans.result().map { case (a, b) =>
      (out.codePointCount(0, a).toLong, out.codePointCount(0, b).toLong)
    })
  }

  /** Cut one codepoint span back out of rendered text (the loss-mask
    * consumer's read path; inverse of [[render]]'s span emission). */
  def sliceSpan(rendered: String, start: Long, end: Long): String = {
    val a = rendered.offsetByCodePoints(0, start.toInt)
    val b = rendered.offsetByCodePoints(0, end.toInt)
    rendered.substring(a, b)
  }

  val defs: Seq[QueryDef] = Seq(

    // system/user/assistant render per doc. The hashed output carries
    // the full rendered text, the assistant [start, end) offsets as
    // pure length arithmetic, AND the substring those offsets cut —
    // so a one-char off-by-one anywhere breaks two columns at once.
    QueryDef(
      "q321_chat_template_render",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text")
          .fanout.as[(Long, String)]
          .map { case (id, text) =>
            val (rendered, spans) = Chat.render(Seq(
              Turn(0, "system", "be helpful"),
              Turn(1, "user", text),
              Turn(2, "assistant", s"ok ${id % 7}")))
            val (a, b) = spans.head
            (id, rendered, a, b, Chat.sliceSpan(rendered, a, b))
          }
          .toDF("doc_id", "rendered", "asst_start", "asst_end", "masked")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               '<|im_start|>system' || chr(10) || 'be helpful<|im_end|>'
                 || chr(10) || '<|im_start|>user' || chr(10) || text
                 || '<|im_end|>' || chr(10) || '<|im_start|>assistant'
                 || chr(10) || 'ok ' || (doc_id % 7) || '<|im_end|>'
                 || chr(10) AS rendered,
               CAST(90 + length(text) AS BIGINT) AS asst_start,
               CAST(93 + length(text)
                    + length(CAST(doc_id % 7 AS VARCHAR)) AS BIGINT)
                 AS asst_end,
               'ok ' || (doc_id % 7) AS masked
        FROM documents
        ORDER BY doc_id""")))
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Checksum-validated PII detection.
  *
  * Regex redaction (q166) trades recall for precision: any 16-digit
  * run looks like a card number, and most are not. The Luhn mod-10
  * check (ISO/IEC 7812) is the precision gate real scrubbing pipelines
  * apply — only digit spans that VALIDATE get masked, so order ids and
  * timestamps survive redaction. Per-row char walk, no shuffle.
  *
  * Reference behavior: the reference has no content-aware operators
  * (`/root/reference/mapper.py` streams opaque blobs); checksum-gated
  * redaction is this engine's extension.
  */
object Pii {

  /** One candidate digit span: [start, end) in the original text,
    * digits with separators stripped, and its Luhn verdict. */
  final case class DigitSpan(start: Int, end: Int, digits: String,
      luhnValid: Boolean)

  /** Luhn mod-10 over a digit string: from the right, double every
    * second digit (subtracting 9 when >9); valid iff the sum ≡ 0. */
  def luhn(digits: String): Boolean = {
    if (digits == null || digits.isEmpty) return false
    var sum = 0
    var alt = false
    var i = digits.length - 1
    while (i >= 0) {
      var d = digits.charAt(i) - '0'
      if (d < 0 || d > 9) return false
      if (alt) { d *= 2; if (d > 9) d -= 9 }
      sum += d; alt = !alt; i -= 1
    }
    sum % 10 == 0
  }

  /** Scan for card-number candidates: maximal digit runs allowing a
    * SINGLE '-' or ' ' separator between digit groups, 13–19 digits
    * total (the ISO/IEC 7812 PAN length range). Shorter/longer runs
    * are not candidates. */
  def scanCandidates(text: String): Vector[DigitSpan] = {
    if (text == null) return Vector.empty
    val out = Vector.newBuilder[DigitSpan]
    var i = 0
    val n = text.length
    while (i < n) {
      if (Character.isDigit(text.charAt(i))) {
        val sb = new StringBuilder
        val start = i
        var end = i
        var j = i
        while (j < n && (Character.isDigit(text.charAt(j)) ||
          ((text.charAt(j) == '-' || text.charAt(j) == ' ') &&
            j + 1 < n && Character.isDigit(text.charAt(j + 1)) &&
            j > start && Character.isDigit(text.charAt(j - 1))))) {
          if (Character.isDigit(text.charAt(j))) { sb.append(text.charAt(j)); end = j + 1 }
          j += 1
        }
        if (sb.length >= 13 && sb.length <= 19)
          out += DigitSpan(start, end, sb.toString, luhn(sb.toString))
        i = math.max(j, end)
      } else i += 1
    }
    out.result()
  }

  /** Mask VALIDATED spans only: digits except the last 4 become '#',
    * separators survive in place. Returns (redacted, nCandidates,
    * nValid). */
  def redactValidated(text: String): (String, Int, Int) = {
    val spans = scanCandidates(text)
    val valid = spans.filter(_.luhnValid)
    if (valid.isEmpty) return (text, spans.size, 0)
    val sb = new StringBuilder(text.length)
    var pos = 0
    valid.foreach { sp =>
      sb.append(text.substring(pos, sp.start))
      val lastFourFrom = sp.digits.length - 4
      var seen = 0
      var i = sp.start
      while (i < sp.end) {
        val c = text.charAt(i)
        if (Character.isDigit(c)) {
          sb.append(if (seen < lastFourFrom) '#' else c); seen += 1
        } else sb.append(c)
        i += 1
      }
      pos = sp.end
    }
    sb.append(text.substring(pos))
    (sb.toString, spans.size, valid.size)
  }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // Luhn-gated redaction. The 16-digit fixture number derives from
    // doc_id arithmetic (lpad(id*7919)), so its validity is data-
    // dependent and UNKNOWN to both sides until computed — the oracle
    // recomputes the mod-10 check INDEPENDENTLY in SQL (double from
    // the right, subtract 9) and replays the masking. The same digits
    // appear bare and dash-grouped (separator handling), plus a ≤3
    // digit ref that must never be a candidate.
    QueryDef(
      "q298_pii_luhn_redaction",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text")
          .fanout.as[(Long, String)]
          .map { case (id, text) =>
            val num = f"${id * 7919}%016d"
            val grouped = num.grouped(4).mkString("-")
            val body = s"pay $num or $grouped ref ${id % 997} end :: $text"
            val (red, nc, nv) = Pii.redactValidated(body)
            (id, nc.toLong, nv.toLong, red)
          }
          .toDF("doc_id", "n_candidates", "n_valid", "redacted")
          .orderBy($"doc_id")
      },
      Some("""
        WITH d AS (
          SELECT doc_id, text,
                 lpad(CAST(doc_id * 7919 AS VARCHAR), 16, '0') AS num
          FROM documents),
        v AS (
          SELECT *,
                 list_sum(list_transform(generate_series(1, 16), i ->
                   CASE WHEN (16 - i) % 2 = 1 THEN
                     CASE WHEN 2 * CAST(substring(num, i, 1) AS INT) > 9
                          THEN 2 * CAST(substring(num, i, 1) AS INT) - 9
                          ELSE 2 * CAST(substring(num, i, 1) AS INT) END
                   ELSE CAST(substring(num, i, 1) AS INT) END)) % 10 = 0
                 AS ok
          FROM d)
        SELECT doc_id,
               CAST(2 AS BIGINT) AS n_candidates,
               CAST(CASE WHEN ok THEN 2 ELSE 0 END AS BIGINT) AS n_valid,
               'pay ' ||
               CASE WHEN ok THEN repeat('#', 12) || substring(num, 13, 4)
                    ELSE num END
               || ' or ' ||
               CASE WHEN ok
                 THEN '####-####-####-' || substring(num, 13, 4)
                 ELSE substring(num, 1, 4) || '-' || substring(num, 5, 4)
                   || '-' || substring(num, 9, 4) || '-'
                   || substring(num, 13, 4) END
               || ' ref ' || (doc_id % 997) || ' end :: ' || text
                 AS redacted
        FROM v
        ORDER BY doc_id""")))
}

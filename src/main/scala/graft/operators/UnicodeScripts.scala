package graft.operators

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Unicode script-mix signal — the homoglyph/spam detector beside
  * lang-ID and char entropy (q289). Mixed-script text (Latin prose
  * salted with Cyrillic lookalikes, or CJK spam wrapped in English
  * keywords) is a classic low-quality/adversarial slice of a crawl;
  * the per-script letter census catches it with integer-exact outputs
  * (no ratio floats to diverge cross-engine). Per-row codepoint walk
  * via the JDK's UCD tables (`Character.UnicodeScript`), map-only.
  */
object UnicodeScripts {

  /** Per-script letter counts (non-letters skipped), dominant script
    * (max count, name ascending on ties), script count, and the mixed
    * flag: some NON-dominant script holds ≥ `mixedThreshold` letters. */
  final case class ScriptCensus(nLetters: Long, dominant: String,
      dominantCount: Long, nScripts: Int, mixed: Boolean)

  def census(text: String, mixedThreshold: Int = 3): ScriptCensus = {
    if (text == null) return ScriptCensus(0L, "none", 0L, 0, false)
    val counts = scala.collection.mutable.Map.empty[String, Long]
    var i = 0
    while (i < text.length) {
      val cp = text.codePointAt(i)
      if (Character.isLetter(cp)) {
        val s = Character.UnicodeScript.of(cp).name.toLowerCase
        counts.update(s, counts.getOrElse(s, 0L) + 1L)
      }
      i += Character.charCount(cp)
    }
    if (counts.isEmpty) return ScriptCensus(0L, "none", 0L, 0, false)
    // highest count wins; name ascending breaks ties deterministically
    val (dom, domN) = counts.toSeq.sortBy { case (n, c) => (-c, n) }.head
    val mixed = counts.exists { case (s, c) => s != dom && c >= mixedThreshold }
    ScriptCensus(counts.values.sum, dom, domN, counts.size, mixed)
  }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // script census: ASCII prose salted with id%5 Cyrillic and id%7
    // Greek letters. Everything the walk can get wrong is hashed as an
    // integer: total letters (spaces excluded), the dominant script's
    // count, the distinct-script count, and the >=3-letter mixed flag.
    QueryDef(
      "q305_script_mix_census",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text")
          .fanout.as[(Long, String)]
          .map { case (id, text) =>
            val salted = text + " " + "я" * (id % 5).toInt +
              "α" * (id % 7).toInt
            val c = UnicodeScripts.census(salted)
            (id, c.nLetters, c.dominant, c.dominantCount,
              c.nScripts.toLong, c.mixed)
          }
          .toDF("doc_id", "n_letters", "dominant_script", "dominant_count",
            "n_scripts", "mixed")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(length(replace(text, ' ', ''))
                    + doc_id % 5 + doc_id % 7 AS BIGINT) AS n_letters,
               'latin' AS dominant_script,
               CAST(length(replace(text, ' ', '')) AS BIGINT)
                 AS dominant_count,
               CAST(1 + CASE WHEN doc_id % 5 > 0 THEN 1 ELSE 0 END
                      + CASE WHEN doc_id % 7 > 0 THEN 1 ELSE 0 END
                    AS BIGINT) AS n_scripts,
               doc_id % 5 >= 3 OR doc_id % 7 >= 3 AS mixed
        FROM documents
        ORDER BY doc_id""")))
}

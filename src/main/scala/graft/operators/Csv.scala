package graft.operators

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** CSV dialect sniffing — the step before `spark.read.csv` can be
  * pointed at a 100 TB blob store of "csv-ish" files: which delimiter,
  * is there quoting, is the first row a header. Spark's reader needs
  * these as OPTIONS; at scale nobody hand-inspects files, so the
  * dialect must be inferred per file from a bounded prefix. Per-blob
  * map work, no shuffle.
  *
  * Method (the classic Sniffer approach, e.g. Python csv.Sniffer's
  * consistency heuristic, re-derived): for each candidate delimiter
  * (comma, semicolon, tab, pipe), split every sample line quote-aware
  * (RFC 4180 double-quote fields, "" escape); a delimiter is
  * CONSISTENT when every line yields the same field count ≥ 2. The
  * consistent delimiter with the highest field count wins (precedence
  * order breaks ties). Header: the first row is a header iff it
  * contains no digit anywhere and a later row does.
  */
object Csv {

  val candidates: Seq[(Char, String)] =
    Seq((',', "comma"), (';', "semicolon"), ('\t', "tab"), ('|', "pipe"))

  /** RFC 4180 quote-aware split of one line. Returns (fields,
    * sawQuotedField). A `""` inside a quoted field is an escaped
    * quote; an unterminated quote runs to end of line. */
  def splitLine(line: String, delim: Char): (Vector[String], Boolean) = {
    val out = Vector.newBuilder[String]
    var sawQuote = false
    val sb = new StringBuilder
    var i = 0
    var inQ = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"') {
          if (i + 1 < line.length && line.charAt(i + 1) == '"') {
            sb.append('"'); i += 2
          } else { inQ = false; i += 1 }
        } else { sb.append(c); i += 1 }
      } else if (c == '"' && sb.isEmpty) {
        inQ = true; sawQuote = true; i += 1
      } else if (c == delim) {
        out += sb.toString; sb.clear(); i += 1
      } else { sb.append(c); i += 1 }
    }
    out += sb.toString
    (out.result(), sawQuote)
  }

  final case class Dialect(delimiter: String, nFields: Int,
      quoted: Boolean, hasHeader: Boolean)

  /** Sniff over the sample's non-empty lines; None when no candidate
    * is consistent (not delimiter-separated data). */
  def sniff(sample: String): Option[Dialect] = {
    if (sample == null) return None
    val lines = sample.split("\r?\n").filter(_.nonEmpty)
    if (lines.isEmpty) return None
    val scored = candidates.flatMap { case (d, name) =>
      val splits = lines.map(splitLine(_, d))
      val counts = splits.map(_._1.size)
      if (counts.head >= 2 && counts.forall(_ == counts.head))
        Some((name, counts.head, splits.exists(_._2)))
      else None
    }
    if (scored.isEmpty) return None
    val (name, n, quoted) = scored.maxBy(_._2) // stable: earlier wins ties
    val headerNoDigit = !lines.head.exists(Character.isDigit)
    val laterHasDigit = lines.tail.exists(_.exists(Character.isDigit))
    Some(Dialect(name, n, quoted, headerNoDigit && laterHasDigit))
  }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // dialect sniff over planted files: delimiter by id%4, header row
    // by id%2, and on id%3=0 a QUOTED first field containing the true
    // delimiter (the classic trap: a naive split miscounts that line,
    // a quote-aware one keeps all lines at 3 fields). The oracle
    // replays the full decision table.
    QueryDef(
      "q299_csv_dialect_sniff",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id")
          .fanout.as[Long]
          .map { id =>
            val d = Csv.candidates((id % 4).toInt)._1
            val header = if (id % 2 == 0) Seq(s"name${d}qty${d}note") else Seq.empty
            val row2 =
              if (id % 3 == 0) "\"q" + d + "inside\"" + d + "2" + d + "y"
              else s"plain${d}2${d}y"
            val sample = (header ++ Seq(s"r1${d}1${d}x$id", row2)).mkString("\n")
            val dia = Csv.sniff(sample).getOrElse(Dialect("none", 0, false, false))
            (id, dia.delimiter, dia.nFields.toLong, dia.quoted, dia.hasHeader)
          }
          .toDF("doc_id", "delimiter", "n_fields", "quoted", "has_header")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CASE doc_id % 4 WHEN 0 THEN 'comma' WHEN 1 THEN 'semicolon'
                 WHEN 2 THEN 'tab' ELSE 'pipe' END AS delimiter,
               CAST(3 AS BIGINT) AS n_fields,
               doc_id % 3 = 0 AS quoted,
               doc_id % 2 = 0 AS has_header
        FROM documents
        ORDER BY doc_id""")))
}

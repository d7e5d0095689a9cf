package graft.operators

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Table-to-text linearization — the consumer of q256's structured
  * cell extraction: a text model can't read (table, row, col) tuples,
  * so extracted tables re-render as GitHub-markdown blocks (header
  * row, `---` separator, pipe-escaped cells). Per-page map work. */
object TableText {

  /** Markdown per tableIdx from extracted cells. Cells land by their
    * (row, col) indexes; missing cells render empty; '|' escapes. */
  def toMarkdown(cells: Seq[HtmlExtract.TableCell]): Vector[(Int, String)] = {
    cells.groupBy(_.tableIdx).toVector.sortBy(_._1).map { case (t, cs) =>
      val nCols = cs.map(_.colIdx).max + 1
      val rows = cs.groupBy(_.rowIdx).toVector.sortBy(_._1).map {
        case (r, rcs) =>
          val byCol = rcs.map(c => c.colIdx -> c.text).toMap
          val line = (0 until nCols)
            .map(c => byCol.getOrElse(c, "").replace("|", "\\|"))
            .mkString("| ", " | ", " |")
          (r, line, rcs.exists(_.header))
      }
      val sb = new StringBuilder
      rows.zipWithIndex.foreach { case ((_, line, isHeader), k) =>
        sb.append(line).append('\n')
        if (k == 0 && isHeader)
          sb.append((0 until nCols).map(_ => "---")
            .mkString("| ", " | ", " |")).append('\n')
      }
      (t, sb.toString.stripSuffix("\n"))
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // q256's planted 3x3 table rendered to markdown: header row, ---
    // separator, entity-decoded and inline-markup-stripped cells all
    // inside ONE hashed string per doc; the oracle rebuilds it
    // character-exactly.
    QueryDef(
      "q320_table_to_markdown",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id")
          .fanout.as[Long]
          .flatMap { id =>
            val html =
              s"""<html><body><p>intro text</p><table>
                 |<tr><th>metric</th><th>value</th><th>note</th></tr>
                 |<tr><td>count</td><td>${id * 2}</td><td>n &amp; m</td></tr>
                 |<tr><td>score</td><td>${id % 97}</td><td><b>bold $id</b></td></tr>
                 |</table></body></html>""".stripMargin
            TableText.toMarkdown(HtmlExtract.tables(html)).map {
              case (t, md) => (id, t, md)
            }
          }
          .toDF("doc_id", "table_idx", "markdown")
          .orderBy($"doc_id", $"table_idx")
      },
      Some("""
        SELECT doc_id,
               CAST(0 AS INT) AS table_idx,
               '| metric | value | note |' || chr(10)
                 || '| --- | --- | --- |' || chr(10)
                 || '| count | ' || (doc_id * 2) || ' | n & m |' || chr(10)
                 || '| score | ' || (doc_id % 97) || ' | bold ' || doc_id
                 || ' |' AS markdown
        FROM documents
        ORDER BY doc_id, table_idx""")))
}

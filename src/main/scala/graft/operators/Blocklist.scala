package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Aho–Corasick multi-pattern matcher: one automaton pass counts ALL
  * occurrences of every pattern (overlapping and nested included) in a
  * single scan of the text — the blocklist/abuse-term/PII-term filter
  * a curation pipeline runs over every document. The naive alternative
  * is one `instr`/regex pass PER pattern: p scans of 100 TB instead of
  * one. The automaton is built once on the driver (goto trie + BFS
  * failure links with merged output links — the public Aho–Corasick
  * '75 construction) and ships to executors by closure; size is
  * O(Σ|pattern|), independent of data size.
  */
final class AhoCorasick private (
    gotoMap: Array[java.util.HashMap[Character, Integer]],
    fail: Array[Int],
    out: Array[Array[Int]],
    val patterns: Array[String]) extends Serializable {

  /** Occurrence count per pattern (indexes align with `patterns`),
    * counting every match position — overlapping and nested matches
    * included, which is what makes the replace()-arithmetic oracle
    * exact for border-free patterns. */
  def countMatches(text: String): Array[Long] = {
    val counts = new Array[Long](patterns.length)
    if (text == null) return counts
    var st = 0
    var i = 0
    while (i < text.length) {
      val c = Character.valueOf(text.charAt(i))
      while (st != 0 && gotoMap(st).get(c) == null) st = fail(st)
      val nxt = gotoMap(st).get(c)
      st = if (nxt == null) 0 else nxt.intValue()
      val os = out(st)
      var k = 0
      while (k < os.length) { counts(os(k)) += 1; k += 1 }
      i += 1
    }
    counts
  }
}

object AhoCorasick {

  def build(patterns: Seq[String]): AhoCorasick = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "need non-empty patterns")
    require(patterns.distinct.size == patterns.size, "duplicate pattern")
    val gotoB = scala.collection.mutable.ArrayBuffer(
      new java.util.HashMap[Character, Integer]())
    val outB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    // trie insert
    patterns.zipWithIndex.foreach { case (p, pi) =>
      var st = 0
      p.foreach { ch =>
        val c = Character.valueOf(ch)
        var nxt = gotoB(st).get(c)
        if (nxt == null) {
          gotoB += new java.util.HashMap[Character, Integer]()
          outB += scala.collection.mutable.ArrayBuffer.empty[Int]
          nxt = Integer.valueOf(gotoB.size - 1)
          gotoB(st).put(c, nxt)
        }
        st = nxt.intValue()
      }
      outB(st) += pi
    }
    // BFS failure links; output links merge so a state emits every
    // pattern that ends at it through ANY suffix
    val fail = new Array[Int](gotoB.size)
    val queue = new java.util.ArrayDeque[Int]()
    gotoB(0).forEach((_, s) => queue.add(s.intValue()))
    while (!queue.isEmpty) {
      val st = queue.poll()
      gotoB(st).forEach { (c, s) =>
        val child = s.intValue()
        var f = fail(st)
        while (f != 0 && gotoB(f).get(c) == null) f = fail(f)
        val fNext = gotoB(f).get(c)
        fail(child) =
          if (fNext != null && fNext.intValue() != child) fNext.intValue()
          else 0
        outB(child) ++= outB(fail(child))
        queue.add(child)
      }
    }
    new AhoCorasick(gotoB.toArray, fail, outB.map(_.toArray).toArray,
      patterns.toArray)
  }
}

/** Blocklist scan over `documents`: per-doc occurrence accounting for
  * a fixed pattern set, one automaton pass per document. */
object Blocklist {

  final case class BlocklistRow(doc_id: Long, total_matches: Long,
      n_patterns_hit: Int, top_pattern: Option[String], top_count: Long)

  /** Per-doc blocklist report: total occurrences across patterns,
    * distinct patterns hit, and the dominant pattern (max count, ties
    * to the lexicographically smallest — a deterministic tiebreak the
    * oracle can replay). Map-only: the automaton rides the closure;
    * no shuffle at all. */
  def blocklistMatch(docs: DataFrame, patterns: Seq[String]): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val ac = AhoCorasick.build(patterns)
    docs.select(col("doc_id"), col("text")).fanout.as[(Long, String)]
      .map { case (id, text) =>
        val c = ac.countMatches(text)
        var total = 0L
        var nHit = 0
        var top = -1
        var i = 0
        while (i < c.length) {
          total += c(i)
          if (c(i) > 0) {
            nHit += 1
            if (top < 0 || c(i) > c(top) ||
              (c(i) == c(top) && ac.patterns(i) < ac.patterns(top)))
              top = i
          }
          i += 1
        }
        BlocklistRow(id, total, nHit,
          if (top < 0) None else Some(ac.patterns(top)),
          if (top < 0) 0L else c(top))
      }
      .toDF()
  }

  private val Patterns =
    Seq("fast", "scan", "slow scan", "table value", "merge batch")

  val defs: Seq[QueryDef] = Seq(

    // blocklist scan with patterns drawn from the fixture vocabulary so
    // hits are plentiful, including one pattern nested inside another
    // ('scan' inside 'slow scan' — the automaton's output links must
    // fire both). All patterns are border-free, so DuckDB's
    // replace()-shrinkage arithmetic counts exactly the same
    // occurrences; the dominant-pattern tiebreak is replayed as
    // min(pattern) over the max count.
    QueryDef(
      "q287_blocklist_match",
      (s, dir) => {
        import s.implicits._
        blocklistMatch(Tables.load(s, dir, "documents"), Patterns)
          .orderBy($"doc_id")
      },
      Some("""
        WITH pats(p) AS (VALUES ('fast'), ('scan'), ('slow scan'),
                                ('table value'), ('merge batch')),
        cnt AS (
          SELECT d.doc_id, p.p,
                 (length(d.text) - length(replace(d.text, p.p, '')))
                   // length(p.p) AS c
          FROM documents d CROSS JOIN pats p),
        agg AS (
          SELECT doc_id,
                 CAST(sum(c) AS BIGINT) AS total_matches,
                 CAST(count(CASE WHEN c > 0 THEN 1 END) AS INT)
                   AS n_patterns_hit,
                 max(c) AS mx
          FROM cnt GROUP BY doc_id),
        sel AS (
          SELECT c.doc_id, min(c.p) AS top_pattern
          FROM cnt c JOIN agg a ON c.doc_id = a.doc_id AND c.c = a.mx
          WHERE a.mx > 0
          GROUP BY c.doc_id)
        SELECT a.doc_id, a.total_matches, a.n_patterns_hit,
               s.top_pattern,
               CAST(CASE WHEN a.mx > 0 THEN a.mx ELSE 0 END AS BIGINT)
                 AS top_count
        FROM agg a LEFT JOIN sel s ON a.doc_id = s.doc_id
        ORDER BY a.doc_id"""))
  )
}

package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** CBOR (RFC 8949) (path, type) census — the web/IoT sibling of the
  * MessagePack census (q324, [[MsgPack]]). The walk emits the same
  * path/type rows as the JSON census so the SAME drift machinery
  * ([[Json.schemaDrift]]) runs over CBOR corpora unchanged.
  *
  * Implemented per RFC 8949 §3: all eight major types with every
  * additional-information width (0–23 inline, 24–27 = 1/2/4/8-byte
  * arguments), indefinite-length byte/text strings (chunked, chunks
  * MUST be definite-length strings of the same major type — §3.2.3),
  * indefinite-length arrays and maps with the 0xFF "break", tags
  * (major 6 — surfaced as a `tag` row, content walked at the same
  * path), and major-7 simples: false/true/null/undefined, the
  * two-byte simple form (ill-formed below 32 — §3.3), and
  * half/single/double floats.
  *
  * Well-formedness posture matches the YAML/TOML reject-don't-guess
  * contract: reserved additional info 28–30, a break outside an
  * indefinite context, a nested indefinite string chunk, truncation,
  * trailing bytes, or depth > 128 → None. As in the MsgPack/JSON
  * census, map keys must be text strings (the JSON-compatible subset);
  * an integer or other non-text key → None.
  */
object Cbor {

  private final class Walker(b: Array[Byte]) {
    var i = 0
    var ok = true
    val out = Vector.newBuilder[(String, String)]

    private def u(k: Int): Long = {
      var v = 0L
      var j = 0
      while (j < k) { v = (v << 8) | (b(i + j) & 0xffL); j += 1 }
      v
    }

    def need(k: Long): Boolean =
      if (!ok || k < 0 || k > b.length - i) { ok = false; false } else true

    /** Decode a head: returns (major, argument, indefinite). The
      * argument of an indefinite head is -1. */
    private def head(): (Int, Long, Boolean) = {
      if (i >= b.length) { ok = false; return (0, 0L, false) }
      val t = b(i) & 0xff
      i += 1
      val major = t >>> 5
      val ai = t & 0x1f
      if (ai < 24) (major, ai.toLong, false)
      else if (ai <= 27) {
        val k = 1 << (ai - 24)
        if (!need(k.toLong)) (0, 0L, false)
        else { val v = u(k); i += k; (major, v, false) }
      } else if (ai == 31) (major, -1L, true)
      else { ok = false; (0, 0L, false) } // 28–30 reserved (§3)
    }

    /** Definite-length text payload as a String (for map keys). */
    private def text(len: Long): Option[String] = {
      if (!need(len)) return None
      val s = new String(b, i, len.toInt, "UTF-8")
      i += len.toInt
      Some(s)
    }

    /** Skip an entire string (major 2 or 3), definite or indefinite.
      * Indefinite chunks must be definite strings of `major`. */
    private def skipString(major: Int, arg: Long, indef: Boolean): Unit = {
      if (!indef) { if (need(arg)) i += arg.toInt; return }
      var done = false
      while (ok && !done) {
        if (i >= b.length) { ok = false; return }
        if ((b(i) & 0xff) == 0xff) { i += 1; done = true }
        else {
          val (m, a, ind) = head()
          if (!ok) return
          if (m != major || ind) { ok = false; return } // §3.2.3
          if (need(a)) i += a.toInt
        }
      }
    }

    def value(path: String, depth: Int): Unit = {
      if (!ok) return
      if (depth > 128) { ok = false; return }
      if (i >= b.length) { ok = false; return }
      val ai0 = b(i) & 0x1f // additional info, needed for major-7 forms
      val (major, arg, indef) = head()
      if (!ok) return
      major match {
        case 0 | 1 =>
          if (indef) ok = false else out += ((path, "int"))
        case 2 =>
          skipString(2, arg, indef)
          if (ok) out += ((path, "binary"))
        case 3 =>
          skipString(3, arg, indef)
          if (ok) out += ((path, "string"))
        case 4 => arr(path, arg, indef, depth)
        case 5 => map(path, arg, indef, depth)
        case 6 =>
          if (indef) { ok = false; return }
          out += ((path, "tag"))
          value(path, depth + 1) // tag content, same path
        case 7 =>
          if (indef) { ok = false; return } // lone break as a value
          ai0 match {
            case 20 | 21 => out += ((path, "boolean"))
            case 22      => out += ((path, "nil"))
            case 23      => out += ((path, "undefined"))
            case 24      =>
              // two-byte simple: ill-formed below 32 (§3.3)
              if (arg < 32) ok = false else out += ((path, "simple"))
            case 25 | 26 | 27 => out += ((path, "float"))
            case _            => out += ((path, "simple")) // ai 0–19
          }
      }
    }

    def arr(path: String, n: Long, indef: Boolean, depth: Int): Unit = {
      out += ((path, "array"))
      if (!indef) {
        var k = 0L
        while (ok && k < n) { value(path + "[]", depth + 1); k += 1 }
      } else {
        var done = false
        while (ok && !done) {
          if (i >= b.length) { ok = false; return }
          if ((b(i) & 0xff) == 0xff) { i += 1; done = true }
          else value(path + "[]", depth + 1)
        }
      }
    }

    def map(path: String, n: Long, indef: Boolean, depth: Int): Unit = {
      out += ((path, "object"))
      def entry(): Unit = {
        val (m, a, ind) = head()
        if (!ok) return
        if (m != 3) { ok = false; return } // non-text key
        val key =
          if (!ind) text(a)
          else {
            // indefinite text key: concatenate definite chunks
            val sb = new StringBuilder
            var done = false
            while (ok && !done) {
              if (i >= b.length) { ok = false }
              else if ((b(i) & 0xff) == 0xff) { i += 1; done = true }
              else {
                val (cm, ca, cind) = head()
                if (ok) {
                  if (cm != 3 || cind) ok = false
                  else text(ca).foreach(sb ++= _)
                }
              }
            }
            if (ok) Some(sb.result()) else None
          }
        key match {
          case Some(kk) => value(path + "." + kk, depth + 1)
          case None     => ok = false
        }
      }
      if (!indef) {
        var k = 0L
        while (ok && k < n) { entry(); k += 1 }
      } else {
        var done = false
        while (ok && !done) {
          if (i >= b.length) { ok = false; return }
          if ((b(i) & 0xff) == 0xff) { i += 1; done = true }
          else entry()
        }
      }
    }
  }

  /** (path, type) pairs, or None on ill-formed/truncated/trailing
    * bytes — the CBOR twin of [[Json.pathTypes]]/[[MsgPack.pathTypes]]. */
  def pathTypes(b: Array[Byte]): Option[Vector[(String, String)]] = {
    if (b == null || b.isEmpty) return None
    val w = new Walker(b)
    w.value("$", 0)
    if (w.ok && w.i == b.length) Some(w.out.result()) else None
  }

  /** CBOR Sequences (RFC 8742): back-to-back top-level items. Each
    * item must be well-formed; (itemIndex, path, type) rows. An empty
    * buffer is a VALID empty sequence (per the RFC) but null is not. */
  def seqPathTypes(b: Array[Byte]): Option[Vector[(Int, String, String)]] = {
    if (b == null) return None
    val out = Vector.newBuilder[(Int, String, String)]
    var i = 0
    var item = 0
    while (i < b.length) {
      val w = new Walker(b)
      w.i = i
      w.value("$", 0)
      if (!w.ok) return None
      w.out.result().foreach { case (p, t) => out += ((item, p, t)) }
      i = w.i
      item += 1
    }
    Some(out.result())
  }

  // --------------------------------------------------- fixture emitter

  private def writeHead(out: ByteArrayOutputStream, major: Int, v: Long): Unit = {
    val m = major << 5
    if (v < 24) out.write(m | v.toInt)
    else if (v < 256) { out.write(m | 24); out.write(v.toInt) }
    else if (v < 65536) {
      out.write(m | 25); out.write((v >>> 8).toInt); out.write(v.toInt)
    } else if (v < (1L << 32)) {
      out.write(m | 26)
      var k = 3
      while (k >= 0) { out.write(((v >>> (8 * k)) & 0xff).toInt); k -= 1 }
    } else {
      out.write(m | 27)
      var k = 7
      while (k >= 0) { out.write(((v >>> (8 * k)) & 0xff).toInt); k -= 1 }
    }
  }

  def packInt(out: ByteArrayOutputStream, v: Long): Unit =
    if (v >= 0) writeHead(out, 0, v) else writeHead(out, 1, -1L - v)

  def packStr(out: ByteArrayOutputStream, s: String): Unit = {
    val sb = s.getBytes("UTF-8")
    writeHead(out, 3, sb.length.toLong)
    out.write(sb, 0, sb.length)
  }

  def packBytes(out: ByteArrayOutputStream, b: Array[Byte]): Unit = {
    writeHead(out, 2, b.length.toLong)
    out.write(b, 0, b.length)
  }

  def packArrayHeader(out: ByteArrayOutputStream, n: Int): Unit =
    writeHead(out, 4, n.toLong)

  def packMapHeader(out: ByteArrayOutputStream, n: Int): Unit =
    writeHead(out, 5, n.toLong)

  def packTag(out: ByteArrayOutputStream, n: Long): Unit =
    writeHead(out, 6, n)

  def packFloat64(out: ByteArrayOutputStream, d: Double): Unit = {
    out.write(0xfb)
    val bits = java.lang.Double.doubleToLongBits(d)
    var k = 7
    while (k >= 0) { out.write(((bits >>> (8 * k)) & 0xff).toInt); k -= 1 }
  }

  def packBool(out: ByteArrayOutputStream, v: Boolean): Unit =
    out.write(if (v) 0xf5 else 0xf4)

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // CBOR census with the SAME oracle shape as q301/q324 — one census
    // schema across JSONL, msgpack, and CBOR corpora. Fixture map per
    // doc: id (uint, width by magnitude), neg (negative int — major 1),
    // name (text), tags (INDEFINITE array of two strings — exercises
    // 0x9f/0xff), meta map with a float64 and a bool gated on id%2, a
    // byte string on id%3=0, and a tag(0)-wrapped timestamp string on
    // id%5=0. Every count replays from mod arithmetic.
    QueryDef(
      "q422_cbor_schema_census",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
          .select($"doc_id")
          .fanout.as[Long]
          .map { id =>
            val out = new ByteArrayOutputStream()
            val nEntries = 5 +
              (if (id % 3 == 0) 1 else 0) + (if (id % 5 == 0) 1 else 0)
            packMapHeader(out, nEntries)
            packStr(out, "id"); packInt(out, id)
            packStr(out, "neg"); packInt(out, -1L - id)
            packStr(out, "name"); packStr(out, s"doc $id")
            packStr(out, "tags")
            out.write(0x9f) // indefinite array
            packStr(out, "a"); packStr(out, "b")
            out.write(0xff)
            packStr(out, "meta")
            packMapHeader(out, 1 + (if (id % 2 == 0) 1 else 0))
            packStr(out, "score"); packFloat64(out, 1.5)
            if (id % 2 == 0) { packStr(out, "flag"); packBool(out, v = true) }
            if (id % 3 == 0) {
              packStr(out, "blob"); packBytes(out, Array[Byte](1, 2, 3))
            }
            if (id % 5 == 0) {
              packStr(out, "ts"); packTag(out, 0L)
              packStr(out, "2026-01-01T00:00:00Z")
            }
            (id, out.toByteArray)
          }
          .toDF("doc_id", "cb")
        docs.flatMap { row =>
          Cbor.pathTypes(row.getAs[Array[Byte]]("cb")) match {
            case Some(pts) => pts.map { case (p, t) => (row.getLong(0), p, t) }
            case None      => Seq.empty
          }
        }.toDF("doc_id", "path", "type")
          .groupBy($"path", $"type")
          .agg(count_distinct($"doc_id").as("n_docs"),
            count(lit(1)).as("n_values"))
          .orderBy($"path", $"type")
      },
      Some("""
        WITH c AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n2,
                 CAST(sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n3,
                 CAST(sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n5
          FROM documents)
        SELECT path, type, n_docs, n_values FROM (
          SELECT '$' AS path, 'object' AS type, n AS n_docs, n AS n_values FROM c
          UNION ALL SELECT '$.blob', 'binary', n3, n3 FROM c
          UNION ALL SELECT '$.id', 'int', n, n FROM c
          UNION ALL SELECT '$.meta', 'object', n, n FROM c
          UNION ALL SELECT '$.meta.flag', 'boolean', n2, n2 FROM c
          UNION ALL SELECT '$.meta.score', 'float', n, n FROM c
          UNION ALL SELECT '$.name', 'string', n, n FROM c
          UNION ALL SELECT '$.neg', 'int', n, n FROM c
          UNION ALL SELECT '$.tags', 'array', n, n FROM c
          UNION ALL SELECT '$.tags[]', 'string', n, 2 * n FROM c
          UNION ALL SELECT '$.ts', 'string', n5, n5 FROM c
          UNION ALL SELECT '$.ts', 'tag', n5, n5 FROM c)
        ORDER BY path, type""")),

    // CBOR Sequences (RFC 8742) — the streaming framing (one item
    // after another, no array wrapper) used by log pipelines. Items
    // per doc: an int (always), a {"a": text} map (id%3>=1), and a
    // two-bool array (id%3==2); the census keys on (item_idx, path,
    // type) so framing errors shift counts.
    QueryDef(
      "q439_cbor_seq_census",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id")
          .fanout.as[Long]
          .flatMap { id =>
            val out = new ByteArrayOutputStream()
            packInt(out, id)
            if (id % 3 >= 1) {
              packMapHeader(out, 1)
              packStr(out, "a"); packStr(out, s"v$id")
            }
            if (id % 3 == 2) {
              packArrayHeader(out, 2)
              packBool(out, v = true); packBool(out, v = false)
            }
            Cbor.seqPathTypes(out.toByteArray) match {
              case Some(rows) =>
                rows.map { case (k, p, t) => (id, k, p, t) }
              case None => Seq.empty
            }
          }
          .toDF("doc_id", "item_idx", "path", "type")
          .groupBy($"item_idx", $"path", $"type")
          .agg(count_distinct($"doc_id").as("n_docs"))
          .orderBy($"item_idx", $"path", $"type")
      },
      Some("""
        WITH c AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN doc_id % 3 >= 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n1,
                 CAST(sum(CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n2
          FROM documents)
        SELECT item_idx, path, type, n_docs FROM (
          SELECT 0 AS item_idx, '$' AS path, 'int' AS type, n AS n_docs
          FROM c
          UNION ALL SELECT 1, '$', 'object', n1 FROM c
          UNION ALL SELECT 1, '$.a', 'string', n1 FROM c
          UNION ALL SELECT 2, '$', 'array', n2 FROM c
          UNION ALL SELECT 2, '$[]', 'boolean', n2 FROM c)
        ORDER BY item_idx, path, type""")))
}

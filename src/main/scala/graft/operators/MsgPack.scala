package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** MessagePack (path, type) census — the third schemaless binary
  * census beside JSON (q301) and protobuf (q303). MessagePack is the
  * common "binary JSON" of log pipelines (fluentd et al.); the walk
  * emits the same path/type rows as the JSON census so the SAME drift
  * machinery ([[Json.schemaDrift]]) runs over msgpack corpora
  * unchanged.
  *
  * Implemented families of the public spec (msgpack/spec.md):
  * positive/negative fixint, (u)int 8–64, fixstr/str8/16/32,
  * bin8/16/32, fixarray/array16/32, fixmap/map16/32, nil, bool,
  * float32/64. Array elements collapse to `[]`, map keys must be
  * strings (a non-string key → malformed). Truncation or an unknown
  * byte → None; one bad record never fails a corpus pass. */
object MsgPack {

  private final class Walker(b: Array[Byte]) {
    var i = 0
    var ok = true
    val out = Vector.newBuilder[(String, String)]

    def u(k: Int): Long = {
      var v = 0L
      var j = 0
      while (j < k) { v = (v << 8) | (b(i + j) & 0xffL); j += 1 }
      v
    }

    def need(k: Long): Boolean = {
      if (!ok || k < 0 || k > b.length - i) { ok = false; false } else true
    }

    def str(len: Long): Option[String] = {
      if (!need(len)) return None
      val s = new String(b, i, len.toInt, "UTF-8")
      i += len.toInt
      Some(s)
    }

    def value(path: String, depth: Int): Unit = {
      if (!ok) return
      if (depth > 128) { ok = false; return }
      if (i >= b.length) { ok = false; return }
      val t = b(i) & 0xff
      i += 1
      if (t <= 0x7f || t >= 0xe0) out += ((path, "int")) // fixint
      else if (t >= 0x80 && t <= 0x8f) map(path, t - 0x80L, depth)
      else if (t >= 0x90 && t <= 0x9f) arr(path, t - 0x90L, depth)
      else if (t >= 0xa0 && t <= 0xbf) {
        if (str(t - 0xa0L).isDefined) out += ((path, "string"))
      } else t match {
        case 0xc0 => out += ((path, "nil"))
        case 0xc2 | 0xc3 => out += ((path, "boolean"))
        case 0xc4 | 0xc5 | 0xc6 => // bin 8/16/32
          val k = 1 << (t - 0xc4)
          if (need(k.toLong)) {
            val len = u(k); i += k
            if (need(len)) { i += len.toInt; out += ((path, "binary")) }
          }
        case 0xca => if (need(4)) { i += 4; out += ((path, "float")) }
        case 0xcb => if (need(8)) { i += 8; out += ((path, "float")) }
        case x if x >= 0xcc && x <= 0xcf => // uint 8/16/32/64
          val k = 1 << (x - 0xcc)
          if (need(k.toLong)) { i += k; out += ((path, "int")) }
        case x if x >= 0xd0 && x <= 0xd3 => // int 8/16/32/64
          val k = 1 << (x - 0xd0)
          if (need(k.toLong)) { i += k; out += ((path, "int")) }
        case 0xd9 | 0xda | 0xdb => // str 8/16/32
          val k = 1 << (t - 0xd9)
          if (need(k.toLong)) {
            val len = u(k); i += k
            if (str(len).isDefined) out += ((path, "string"))
          }
        case 0xdc | 0xdd => // array 16/32
          val k = 2 << (t - 0xdc)
          if (need(k.toLong)) { val n = u(k); i += k; arr(path, n, depth) }
        case 0xde | 0xdf => // map 16/32
          val k = 2 << (t - 0xde)
          if (need(k.toLong)) { val n = u(k); i += k; map(path, n, depth) }
        case _ => ok = false // ext types and reserved bytes: out of scope
      }
    }

    def arr(path: String, n: Long, depth: Int): Unit = {
      out += ((path, "array"))
      var k = 0L
      while (ok && k < n) { value(path + "[]", depth + 1); k += 1 }
    }

    def map(path: String, n: Long, depth: Int): Unit = {
      out += ((path, "object"))
      var k = 0L
      while (ok && k < n) {
        // key must be a string family
        if (i >= b.length) { ok = false; return }
        val t = b(i) & 0xff
        i += 1
        val key =
          if (t >= 0xa0 && t <= 0xbf) str(t - 0xa0L)
          else if (t == 0xd9 || t == 0xda || t == 0xdb) {
            val w = 1 << (t - 0xd9)
            if (need(w.toLong)) { val len = u(w); i += w; str(len) } else None
          } else None
        key match {
          case Some(kk) => value(path + "." + kk, depth + 1)
          case None => ok = false
        }
        k += 1
      }
    }
  }

  /** (path, type) pairs, or None on malformed/truncated/trailing
    * bytes — the msgpack twin of [[Json.pathTypes]]. */
  def pathTypes(b: Array[Byte]): Option[Vector[(String, String)]] = {
    if (b == null) return None
    val w = new Walker(b)
    w.value("$", 0)
    if (w.ok && w.i == b.length) Some(w.out.result()) else None
  }

  // --------------------------------------------------- fixture emitter

  def packStr(out: ByteArrayOutputStream, s: String): Unit = {
    val sb = s.getBytes("UTF-8")
    if (sb.length <= 31) out.write(0xa0 | sb.length)
    else { out.write(0xd9); out.write(sb.length & 0xff) }
    out.write(sb, 0, sb.length)
  }

  def packInt(out: ByteArrayOutputStream, v: Long): Unit = {
    if (v >= 0 && v <= 0x7f) out.write(v.toInt)
    else { // uint64 for simplicity above fixint range
      out.write(0xcf)
      var k = 7
      while (k >= 0) { out.write(((v >>> (8 * k)) & 0xff).toInt); k -= 1 }
    }
  }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // msgpack census with the SAME oracle shape as q301 — the point:
    // binary log records and JSONL yield one census schema, so one
    // drift alarm covers both. Fixture map: id (fixint or uint64 by
    // magnitude), name (fixstr/str8 by id length), tags array of two
    // strings, meta map with a float and a bool gated on id%2, and a
    // bin blob on id%3=0. Every count replays from mod arithmetic.
    QueryDef(
      "q324_msgpack_schema_census",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
          .select($"doc_id")
          .fanout.as[Long]
          .map { id =>
            val out = new ByteArrayOutputStream()
            val nEntries = 4 + (if (id % 3 == 0) 1 else 0)
            out.write(0x80 | nEntries)
            packStr(out, "id"); packInt(out, id)
            packStr(out, "name"); packStr(out, s"doc $id")
            packStr(out, "tags")
            out.write(0x92); packStr(out, "a"); packStr(out, "b")
            packStr(out, "meta")
            out.write(0x80 | (1 + (if (id % 2 == 0) 1 else 0)))
            packStr(out, "score"); out.write(0xcb)
            val bits = java.lang.Double.doubleToLongBits(1.5)
            var k = 7
            while (k >= 0) { out.write(((bits >>> (8 * k)) & 0xff).toInt); k -= 1 }
            if (id % 2 == 0) { packStr(out, "flag"); out.write(0xc3) }
            if (id % 3 == 0) {
              packStr(out, "blob"); out.write(0xc4); out.write(3)
              out.write(1); out.write(2); out.write(3)
            }
            (id, out.toByteArray)
          }
          .toDF("doc_id", "mp")
        docs.flatMap { row =>
          MsgPack.pathTypes(row.getAs[Array[Byte]]("mp")) match {
            case Some(pts) => pts.map { case (p, t) => (row.getLong(0), p, t) }
            case None => Seq.empty
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
                      AS BIGINT) AS n3
          FROM documents)
        SELECT path, type, n_docs, n_values FROM (
          SELECT '$' AS path, 'object' AS type, n AS n_docs, n AS n_values FROM c
          UNION ALL SELECT '$.blob', 'binary', n3, n3 FROM c
          UNION ALL SELECT '$.id', 'int', n, n FROM c
          UNION ALL SELECT '$.meta', 'object', n, n FROM c
          UNION ALL SELECT '$.meta.flag', 'boolean', n2, n2 FROM c
          UNION ALL SELECT '$.meta.score', 'float', n, n FROM c
          UNION ALL SELECT '$.name', 'string', n, n FROM c
          UNION ALL SELECT '$.tags', 'array', n, n FROM c
          UNION ALL SELECT '$.tags[]', 'string', n, 2 * n FROM c)
        ORDER BY path, type""")))
}

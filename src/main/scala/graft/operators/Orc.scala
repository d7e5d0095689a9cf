package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** ORC column reader — from the public ORC v1 specification
  * (orc.apache.org/specification), no orc-core classes. Completes the
  * columnar-format trio beside the parquet page reader (q441) and the
  * avro record reader (q442): the file tail (postscript → compressed
  * footer → stripe list and type tree), the chunked compression
  * framing (3-byte little-endian headers with the isOriginal bit;
  * NONE/ZLIB/SNAPPY/ZSTD chunk codecs — the latter two through THIS
  * repo's own decoders), stripe footers (stream list + column
  * encodings), byte-RLE boolean PRESENT bitmaps, and the full RLEv2
  * integer coder: SHORT_REPEAT, DIRECT, DELTA (fixed and
  * variable-width with sign-of-delta-base semantics), and
  * PATCHED_BASE (sign-magnitude base, bit-packed patch list with
  * 255-gap extension entries). String columns decode in both
  * DIRECT_V2 (DATA + LENGTH) and DICTIONARY_V2 (ids + DICTIONARY_DATA
  * + LENGTH) encodings.
  *
  * Scope: flat structs of LONG/INT/STRING leaves — the audit subset;
  * other types, RLEv1 encodings, and ACID tables → None.
  *
  * Referee: Spark's own ORC writer — the spec and q443 have Spark
  * write real files across codecs and value distributions chosen to
  * force EVERY RLEv2 sub-encoding, and this reader must reproduce the
  * exact values Spark reads back.
  */
object Orc {

  /** Allocation cap for per-stripe row counts (GitPack.MaxObject
    * style): a declared count beyond this is treated as corrupt. */
  private val MaxRowsPerStripe: Long = 1L << 26

  // ---- minimal protobuf walk with payload slices ----------------------

  private def protoFields(b: Array[Byte], from: Int, until: Int)(
      f: (Int, Int, Long, Int, Int) => Unit): Boolean = {
    var i = from
    while (i < until) {
      val tag = Protobuf.varint(b, i).getOrElse(return false)
      i = tag._2
      val no = (tag._1 >>> 3).toInt
      val wt = (tag._1 & 7).toInt
      if (no <= 0) return false
      wt match {
        case 0 =>
          val v = Protobuf.varint(b, i).getOrElse(return false)
          f(no, 0, v._1, 0, 0)
          i = v._2
        case 1 =>
          if (i + 8 > until) return false
          f(no, 1, 0L, i, 8)
          i += 8
        case 2 =>
          val len = Protobuf.varint(b, i).getOrElse(return false)
          if (len._1 < 0 || len._1 > until - len._2) return false
          f(no, 2, len._1, len._2, len._1.toInt)
          i = len._2 + len._1.toInt
        case 5 =>
          if (i + 4 > until) return false
          f(no, 5, 0L, i, 4)
          i += 4
        case _ => return false
      }
    }
    true
  }

  // ---- chunked compression --------------------------------------------

  private def inflateRaw(b: Array[Byte], off: Int, len: Int): Option[Array[Byte]] =
    try {
      val inf = new java.util.zip.Inflater(true)
      inf.setInput(b, off, len)
      val out = new ByteArrayOutputStream(len * 3)
      val buf = new Array[Byte](8192)
      var stuck = false
      while (!inf.finished() && !stuck) {
        val k = inf.inflate(buf)
        if (k == 0 && inf.needsInput()) stuck = true else out.write(buf, 0, k)
        if (out.size > (1 << 26)) stuck = true
      }
      val ok = inf.finished()
      inf.end()
      if (ok) Some(out.toByteArray) else None
    } catch { case _: Exception => None }

  /** Decode one (possibly chunk-framed) stream region. kind: 0 NONE,
    * 1 ZLIB, 2 SNAPPY, 5 ZSTD. */
  private def decodeStream(b: Array[Byte], off: Int, len: Int,
      kind: Int): Option[Array[Byte]] = {
    if (off < 0 || len < 0 || off + len > b.length) return None
    if (kind == 0)
      return Some(java.util.Arrays.copyOfRange(b, off, off + len))
    val out = new ByteArrayOutputStream(len * 2)
    var i = off
    val end = off + len
    while (i < end) {
      if (i + 3 > end) return None
      val h = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16)
      val original = (h & 1) == 1
      val clen = h >>> 1
      i += 3
      if (clen < 0 || i + clen > end) return None
      if (original) out.write(b, i, clen)
      else {
        val chunk = kind match {
          case 1 => inflateRaw(b, i, clen)
          case 2 => SnappyCodec.decompressRaw(
            java.util.Arrays.copyOfRange(b, i, i + clen), 1 << 26)
          case 5 => ZstdCodec.zstdDecompress(
            java.util.Arrays.copyOfRange(b, i, i + clen))
          case _ => None
        }
        chunk match {
          case Some(c) => out.write(c, 0, c.length)
          case None    => return None
        }
      }
      i += clen
      if (out.size > (1 << 26)) return None
    }
    Some(out.toByteArray)
  }

  // ---- byte RLE + booleans --------------------------------------------

  private def byteRle(b: Array[Byte], need: Int): Option[Array[Byte]] = {
    val out = new Array[Byte](need)
    var n = 0
    var i = 0
    while (n < need) {
      if (i >= b.length) return None
      val h = b(i)
      i += 1
      if (h >= 0) {
        val run = h + 3
        if (i >= b.length || n + run > need) return None
        java.util.Arrays.fill(out, n, n + run, b(i))
        i += 1
        n += run
      } else {
        val lit = -h.toInt
        if (i + lit > b.length || n + lit > need) return None
        System.arraycopy(b, i, out, n, lit)
        i += lit
        n += lit
      }
    }
    Some(out)
  }

  private def presentBits(stream: Array[Byte], n: Int): Option[Array[Boolean]] =
    byteRle(stream, (n + 7) / 8).map { bytes =>
      Array.tabulate(n)(i => ((bytes(i >>> 3) >>> (7 - (i & 7))) & 1) == 1)
    }

  // ---- RLEv2 -----------------------------------------------------------

  private val Fbs: Array[Int] = Array.tabulate(32)(c =>
    if (c < 24) c + 1
    else c match {
      case 24 => 26; case 25 => 28; case 26 => 30; case 27 => 32
      case 28 => 40; case 29 => 48; case 30 => 56; case _ => 64
    })

  private def closestFbs(w: Int): Int = {
    var i = 0
    while (Fbs(i) < w) i += 1
    Fbs(i)
  }

  private final class BitIn(b: Array[Byte], var pos: Int) {
    private var bit = 0
    def read(w: Int): Long = {
      var v = 0L
      var k = 0
      while (k < w) {
        if (pos >= b.length) throw new MatchError("bits")
        v = (v << 1) | ((b(pos) >>> (7 - bit)) & 1)
        bit += 1
        if (bit == 8) { bit = 0; pos += 1 }
        k += 1
      }
      v
    }
    def align(): Int = { if (bit != 0) { bit = 0; pos += 1 }; pos }
  }

  /** Decode exactly `n` RLEv2 values. */
  private def rlev2(b: Array[Byte], signed: Boolean,
      n: Int): Option[Array[Long]] =
    try {
      val out = new Array[Long](n)
      var k = 0
      var i = 0
      def zz(u: Long): Long = (u >>> 1) ^ -(u & 1L)
      while (k < n) {
        if (i >= b.length) return None
        val h = b(i) & 0xff
        (h >>> 6) match {
          case 0 => // SHORT_REPEAT
            val width = ((h >>> 3) & 7) + 1
            val count = (h & 7) + 3
            if (i + 1 + width > b.length || k + count > n) return None
            var v = 0L
            var w = 0
            while (w < width) { v = (v << 8) | (b(i + 1 + w) & 0xffL); w += 1 }
            val value = if (signed) zz(v) else v
            var c = 0
            while (c < count) { out(k) = value; k += 1; c += 1 }
            i += 1 + width
          case 1 => // DIRECT
            if (i + 1 >= b.length) return None
            val w = Fbs((h >>> 1) & 0x1f)
            val len = (((h & 1) << 8) | (b(i + 1) & 0xff)) + 1
            if (k + len > n) return None
            val bits = new BitIn(b, i + 2)
            var c = 0
            while (c < len) {
              val u = bits.read(w)
              out(k) = if (signed) zz(u) else u
              k += 1
              c += 1
            }
            i = bits.align()
          case 3 => // DELTA
            if (i + 1 >= b.length) return None
            val wCode = (h >>> 1) & 0x1f
            val len = (((h & 1) << 8) | (b(i + 1) & 0xff)) + 1
            if (k + len > n) return None
            var p = i + 2
            val baseR = Protobuf.varint(b, p).getOrElse(return None)
            val base = if (signed) zz(baseR._1) else baseR._1
            p = baseR._2
            val dbR = Protobuf.varint(b, p).getOrElse(return None)
            val deltaBase = zz(dbR._1)
            p = dbR._2
            out(k) = base; k += 1
            if (len >= 2) { out(k) = base + deltaBase; k += 1 }
            if (wCode == 0) {
              var c = 2
              var cur = base + deltaBase
              while (c < len) { cur += deltaBase; out(k) = cur; k += 1; c += 1 }
              i = p
            } else {
              val w = Fbs(wCode)
              val bits = new BitIn(b, p)
              var cur = base + deltaBase
              var c = 2
              val sign = if (deltaBase < 0) -1L else 1L
              while (c < len) {
                val d = bits.read(w)
                cur += sign * d
                out(k) = cur
                k += 1
                c += 1
              }
              i = bits.align()
            }
          case _ => // PATCHED_BASE (signed streams only in practice)
            if (i + 3 >= b.length) return None
            val w = Fbs((h >>> 1) & 0x1f)
            val len = (((h & 1) << 8) | (b(i + 1) & 0xff)) + 1
            val b3 = b(i + 2) & 0xff
            val bw = ((b3 >>> 5) & 7) + 1
            val pw = Fbs(b3 & 0x1f)
            val b4 = b(i + 3) & 0xff
            val pgw = ((b4 >>> 5) & 7) + 1
            val pll = b4 & 0x1f
            if (k + len > n || i + 4 + bw > b.length) return None
            var baseU = 0L
            var q = 0
            while (q < bw) { baseU = (baseU << 8) | (b(i + 4 + q) & 0xffL); q += 1 }
            // sign-magnitude in the top bit of the base width
            val signBit = 1L << (bw * 8 - 1)
            val base =
              if ((baseU & signBit) != 0) -(baseU & (signBit - 1)) else baseU
            val bits = new BitIn(b, i + 4 + bw)
            val data = new Array[Long](len)
            var c = 0
            while (c < len) { data(c) = bits.read(w); c += 1 }
            bits.align()
            val pew = closestFbs(pw + pgw)
            val patches = new Array[Long](pll)
            c = 0
            while (c < pll) { patches(c) = bits.read(pew); c += 1 }
            i = bits.align()
            // gaps are cumulative from position 0; a (255, 0) entry
            // only extends the gap past the 8-bit field
            var pos = 0
            c = 0
            while (c < pll) {
              val gap = (patches(c) >>> pw).toInt
              val patch = patches(c) & ((1L << pw) - 1)
              pos += gap
              if (!(gap == 255 && patch == 0)) {
                if (pos >= len) return None
                data(pos) |= patch << w
              }
              c += 1
            }
            c = 0
            while (c < len) { out(k) = base + data(c); k += 1; c += 1 }
        }
      }
      Some(out)
    } catch { case _: MatchError => None }

  // ---- file walk --------------------------------------------------------

  final case class OrcMeta(compression: Int, numRows: Long,
      fields: Vector[(String, Int)], // (name, type kind)
      stripes: Vector[(Long, Long, Long, Long, Long)])
      // (offset, indexLen, dataLen, footerLen, rows)

  def parseTail(file: Array[Byte]): Option[OrcMeta] = {
    if (file == null || file.length < 32) return None
    val psLen = file(file.length - 1) & 0xff
    val psOff = file.length - 1 - psLen
    if (psOff < 0) return None
    var footerLen = -1L
    var comp = 0
    if (!protoFields(file, psOff, file.length - 1) { (no, wt, v, _, _) =>
      (no, wt) match {
        case (1, 0) => footerLen = v
        case (2, 0) => comp = v.toInt
        case _      =>
      }
    }) return None
    if (footerLen <= 0 || psOff - footerLen < 0) return None
    val footer = decodeStream(file, (psOff - footerLen).toInt,
      footerLen.toInt, comp).getOrElse(return None)
    var numRows = -1L
    val stripes = Vector.newBuilder[(Long, Long, Long, Long, Long)]
    val typeKinds = Vector.newBuilder[Int]
    val typeNames = Vector.newBuilder[Vector[String]]
    if (!protoFields(footer, 0, footer.length) { (no, wt, v, po, pl) =>
      (no, wt) match {
        case (3, 2) => // StripeInformation
          var off = -1L; var il = 0L; var dl = 0L; var fl = 0L; var nr = 0L
          protoFields(footer, po, po + pl) { (sno, swt, sv, _, _) =>
            (sno, swt) match {
              case (1, 0) => off = sv
              case (2, 0) => il = sv
              case (3, 0) => dl = sv
              case (4, 0) => fl = sv
              case (5, 0) => nr = sv
              case _      =>
            }
          }
          stripes += ((off, il, dl, fl, nr))
        case (4, 2) => // Type
          var kind = -1
          val names = Vector.newBuilder[String]
          protoFields(footer, po, po + pl) { (tno, twt, tv, tpo, tpl) =>
            (tno, twt) match {
              case (1, 0) => kind = tv.toInt
              case (3, 2) =>
                names += new String(footer, tpo, tpl, "UTF-8")
              case _ =>
            }
          }
          typeKinds += kind
          typeNames += names.result()
        case (6, 0) => numRows = v
        case _      =>
      }
    }) return None
    val kinds = typeKinds.result()
    val nameLists = typeNames.result()
    if (kinds.isEmpty || kinds(0) != 12) return None // root must be STRUCT
    val rootNames = nameLists(0)
    if (rootNames.length != kinds.length - 1) return None // flat only
    val fields = rootNames.zipWithIndex.map { case (nm, i) =>
      (nm, kinds(i + 1))
    }
    if (numRows < 0) None
    else Some(OrcMeta(comp, numRows, fields, stripes.result()))
  }

  /** Decode one column across all stripes: Right(long) / Left(string)
    * values, None = null. Column kinds: 3 INT, 4 LONG, 7 STRING. */
  def readColumn(file: Array[Byte], meta: OrcMeta,
      name: String): Option[Vector[Option[Either[String, Long]]]] = {
    val idx = meta.fields.indexWhere(_._1 == name)
    if (idx < 0) return None
    val kind = meta.fields(idx)._2
    if (kind != 3 && kind != 4 && kind != 7) return None
    val colId = idx + 1 // root is column 0
    val out = Vector.newBuilder[Option[Either[String, Long]]]
    meta.stripes.foreach { case (off, il, dl, fl, nRowsL) =>
      // Hostile stripe row counts drive Array.fill allocations below;
      // cap in Long BEFORE narrowing (an OOM is an Error and would
      // escape the corrupt→None contract).
      if (nRowsL < 0L || nRowsL > MaxRowsPerStripe) return None
      val nRows = nRowsL.toInt
      val sfOff = off + il + dl
      val sfooter = decodeStream(file, sfOff.toInt, fl.toInt,
        meta.compression).getOrElse(return None)
      // streams and encodings
      final case class Stream(kind: Int, col: Int, len: Long)
      val streams = Vector.newBuilder[Stream]
      val encodings = Vector.newBuilder[(Int, Int)] // (kind, dictSize)
      if (!protoFields(sfooter, 0, sfooter.length) { (no, wt, v, po, pl) =>
        (no, wt) match {
          case (1, 2) =>
            var sk = 0; var sc = 0; var sl = 0L
            protoFields(sfooter, po, po + pl) { (sno, swt, sv, _, _) =>
              (sno, swt) match {
                case (1, 0) => sk = sv.toInt
                case (2, 0) => sc = sv.toInt
                case (3, 0) => sl = sv
                case _      =>
              }
            }
            streams += Stream(sk, sc, sl)
          case (2, 2) =>
            var ek = 0; var ds = 0
            protoFields(sfooter, po, po + pl) { (eno, ewt, ev, _, _) =>
              (eno, ewt) match {
                case (1, 0) => ek = ev.toInt
                case (2, 0) => ds = ev.toInt
                case _      =>
              }
            }
            encodings += ((ek, ds))
          case _ =>
        }
      }) return None
      val encs = encodings.result()
      if (colId >= encs.length) return None
      val (encKind, dictSize) = encs(colId)
      // walk stream offsets in declared order
      var cursor = off
      var present: Option[Array[Byte]] = None
      var data: Option[Array[Byte]] = None
      var lengths: Option[Array[Byte]] = None
      var dictData: Option[Array[Byte]] = None
      streams.result().foreach { st =>
        if (st.col == colId) {
          def dec(): Option[Array[Byte]] =
            decodeStream(file, cursor.toInt, st.len.toInt, meta.compression)
          st.kind match {
            case 0 => present = dec()
            case 1 => data = dec()
            case 2 => lengths = dec()
            case 3 => dictData = dec()
            case _ => // row index / bloom / secondary: skip
          }
        }
        cursor += st.len
      }
      val pres: Array[Boolean] = present match {
        case Some(p) => presentBits(p, nRows).getOrElse(return None)
        case None    => Array.fill(nRows)(true)
      }
      val nPresent = pres.count(identity)
      if (kind == 3 || kind == 4) {
        if (encKind != 2) return None // DIRECT_V2 expected for ints
        val vals = rlev2(data.getOrElse(return None), signed = true,
          nPresent).getOrElse(return None)
        var vi = 0
        pres.foreach { p =>
          if (p) { out += Some(Right(vals(vi))); vi += 1 }
          else out += None
        }
      } else {
        encKind match {
          case 2 => // DIRECT_V2: DATA bytes + LENGTH
            val lens = rlev2(lengths.getOrElse(return None), signed = false,
              nPresent).getOrElse(return None)
            val bytes = data.getOrElse(return None)
            var p0 = 0
            val strs = lens.map { l =>
              if (l < 0 || p0 + l > bytes.length) return None
              val s = new String(bytes, p0, l.toInt, "UTF-8")
              p0 += l.toInt
              s
            }
            var vi = 0
            pres.foreach { p =>
              if (p) { out += Some(Left(strs(vi))); vi += 1 }
              else out += None
            }
          case 3 => // DICTIONARY_V2
            val dlens = rlev2(lengths.getOrElse(return None), signed = false,
              dictSize).getOrElse(return None)
            val dbytes = dictData.getOrElse(return None)
            var p0 = 0
            val dict = dlens.map { l =>
              if (l < 0 || p0 + l > dbytes.length) return None
              val s = new String(dbytes, p0, l.toInt, "UTF-8")
              p0 += l.toInt
              s
            }
            val ids = rlev2(data.getOrElse(return None), signed = false,
              nPresent).getOrElse(return None)
            var vi = 0
            pres.foreach { p =>
              if (p) {
                val id = ids(vi).toInt
                if (id < 0 || id >= dict.length) return None
                out += Some(Left(dict(id)))
                vi += 1
              } else out += None
            }
          case _ => return None
        }
      }
    }
    Some(out.result())
  }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // Spark writes REAL ORC (zlib default chunking, RLEv2, dictionary
    // strings); this reader decodes the raw bytes back and the
    // aggregates must match the oracle's view of the logical table —
    // the q441 shape for the other columnar format.
    QueryDef(
      "q443_orc_column_decode",
      (s, dir) => {
        import s.implicits._
        val tmp = java.nio.file.Files
          .createTempDirectory("graft_orc_q443").toString
        Tables.load(s, dir, "documents")
          .select($"doc_id",
            concat(lit("o"), ($"doc_id" % 60).cast("string")).as("name"))
          .repartition(4)
          .write.mode("overwrite").option("compression", "zlib").orc(tmp)
        s.read.format("binaryFile")
          .load(tmp + "/part-*.orc")
          .select($"content")
          .as[Array[Byte]]
          .map { bytes =>
            val res = for {
              meta <- parseTail(bytes)
              ids <- readColumn(bytes, meta, "doc_id")
              names <- readColumn(bytes, meta, "name")
            } yield {
              val idv = ids.flatten.collect { case Right(v) => v }
              val nv = names.flatten.collect { case Left(v) => v }
              (meta.numRows, idv.sum, nv.map(_.length.toLong).sum,
                idv.length == meta.numRows && nv.length == meta.numRows)
            }
            res.getOrElse((-1L, -1L, -1L, false))
          }
          .toDF("n_rows", "sum_ids", "sum_name_len", "ok")
          .agg(count(lit(1)).as("n_files"),
            sum($"n_rows").as("n_rows"),
            sum($"sum_ids").as("sum_ids"),
            sum($"sum_name_len").as("sum_name_len"),
            count(when($"ok", 1)).as("n_ok"))
      },
      Some("""
        SELECT CAST(4 AS BIGINT) AS n_files,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(doc_id) AS BIGINT) AS sum_ids,
               CAST(sum(1 + length(CAST(doc_id % 60 AS VARCHAR)))
                    AS BIGINT) AS sum_name_len,
               CAST(4 AS BIGINT) AS n_ok
        FROM documents"""))
  )
}

package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** cpio archives, from the public POSIX/pax format description: the
  * `newc` ASCII form ("070701": 110-char headers, 13 8-hex-digit
  * fields, name and data each padded to 4-byte alignment), its CRC
  * sibling ("070702": same layout, check = 32-bit sum of the data
  * bytes, verified here), and the portable ASCII `odc` form
  * ("070707": 76-char octal headers, no padding). RPM payloads,
  * initramfs images, and kernel-adjacent source drops all ship cpio
  * inside gz/xz/zstd — the same corpus channel as `ar`/`.deb`
  * (`Ar.scala`).
  *
  * This was a standing deferral ("no cpio referee in-container",
  * re-checked every round since round 14); libarchive's `bsdcpio`
  * landed in /root/miniconda/bin this round, so the operator
  * promotes with the WOFF2→Brotli template: refereed BOTH
  * directions in CpioSpec (bsdcpio-built archives decode here;
  * archives built here list and extract byte-exactly through
  * bsdcpio, all three formats).
  *
  * Decode contract: corrupt/truncated input, non-numeric header
  * fields, hostile name/file sizes (bounds-checked in Long before
  * any allocation), a missing TRAILER!!!, or a CRC lie → None.
  */
object Cpio {

  final case class CpioEntry(name: String, mode: Int, mtime: Long,
      data: Array[Byte])

  /** Allocation cap for declared name sizes; file sizes are bounded
    * by the archive bytes themselves. */
  private val MaxName: Long = 1L << 16

  private def hex8(b: Array[Byte], i: Int): Long = {
    var v = 0L
    var k = 0
    while (k < 8) {
      val c = b(i + k)
      val d =
        if (c >= '0' && c <= '9') c - '0'
        else if (c >= 'a' && c <= 'f') c - 'a' + 10
        else if (c >= 'A' && c <= 'F') c - 'A' + 10
        else return -1L
      v = (v << 4) | d
      k += 1
    }
    v
  }

  private def oct(b: Array[Byte], i: Int, n: Int): Long = {
    var v = 0L
    var k = 0
    while (k < n) {
      val c = b(i + k)
      if (c < '0' || c > '7') return -1L
      v = (v << 3) | (c - '0')
      k += 1
    }
    v
  }

  /** Parse a cpio archive (newc, newc+CRC, or odc — detected from
    * the per-entry magic), ending at TRAILER!!!; only zero padding
    * may follow. Returns every member including directories (data
    * empty). */
  def decode(b: Array[Byte]): Option[Vector[CpioEntry]] = {
    if (b == null || b.length < 76) return None
    val out = Vector.newBuilder[CpioEntry]
    var i = 0
    try {
      while (true) {
        if (i + 6 > b.length) return None
        val magic = new String(b, i, 6, "US-ASCII")
        var name: String = null
        var mode = 0L
        var mtime = 0L
        var fsize = 0L
        var check = -1L
        var dataOff = 0
        var next = 0
        if (magic == "070701" || magic == "070702") {
          if (i + 110 > b.length) return None
          mode = hex8(b, i + 14)
          mtime = hex8(b, i + 46)
          fsize = hex8(b, i + 54)
          val nsize = hex8(b, i + 94)
          check = hex8(b, i + 102)
          if (mode < 0 || mtime < 0 || fsize < 0 || nsize <= 0 ||
            check < 0 || nsize > MaxName) return None
          if (i + 110L + nsize > b.length) return None
          if (b(i + 110 + nsize.toInt - 1) != 0) return None
          name = new String(b, i + 110, nsize.toInt - 1, "UTF-8")
          val hdrEnd = i + 110L + nsize
          dataOff = (((hdrEnd + 3) / 4) * 4).toInt
          if (dataOff + fsize > b.length) return None
          next = ((((dataOff + fsize) + 3) / 4) * 4).toInt
          if (magic == "070702" && name != "TRAILER!!!") {
            var sum = 0L
            var k = 0
            while (k < fsize) {
              sum = (sum + (b(dataOff + k) & 0xff)) & 0xffffffffL
              k += 1
            }
            if (sum != check) return None
          }
        } else if (magic == "070707") {
          if (i + 76 > b.length) return None
          mode = oct(b, i + 18, 6)
          mtime = oct(b, i + 48, 11)
          val nsize = oct(b, i + 59, 6)
          fsize = oct(b, i + 65, 11)
          if (mode < 0 || mtime < 0 || fsize < 0 || nsize <= 0 ||
            nsize > MaxName) return None
          if (i + 76L + nsize > b.length) return None
          if (b(i + 76 + nsize.toInt - 1) != 0) return None
          name = new String(b, i + 76, nsize.toInt - 1, "UTF-8")
          dataOff = i + 76 + nsize.toInt
          if (dataOff + fsize > b.length) return None
          next = (dataOff + fsize).toInt
        } else return None
        if (name == "TRAILER!!!") {
          // only NUL block padding may follow the trailer
          var k = next
          while (k < b.length) {
            if (b(k) != 0) return None
            k += 1
          }
          return Some(out.result())
        }
        out += CpioEntry(name, mode.toInt, mtime,
          java.util.Arrays.copyOfRange(b, dataOff,
            (dataOff + fsize).toInt))
        i = next
      }
      None // unreachable
    } catch {
      case _: ArrayIndexOutOfBoundsException |
        _: NegativeArraySizeException => None
    }
  }

  private def padTo(out: ByteArrayOutputStream, align: Int): Unit =
    while (out.size % align != 0) out.write(0)

  /** Emit a newc ("070701") or newc+CRC ("070702") archive, trailer
    * included and NUL-padded to a 512 block like bsdcpio. */
  def encodeNewc(entries: Seq[CpioEntry],
      withCrc: Boolean = false): Array[Byte] = {
    val out = new ByteArrayOutputStream(entries.map(_.data.length + 160)
      .sum + 640)
    def h8(v: Long): String = f"${v & 0xffffffffL}%08x"
    var ino = 1L
    def one(name: String, mode: Int, mtime: Long,
        data: Array[Byte]): Unit = {
      val nb = name.getBytes("UTF-8")
      val crc =
        if (!withCrc) 0L
        else data.foldLeft(0L)((a, x) => (a + (x & 0xff)) & 0xffffffffL)
      val hdr = (if (withCrc) "070702" else "070701") +
        h8(ino) + h8(mode.toLong) + h8(0) + h8(0) + h8(1) + h8(mtime) +
        h8(data.length.toLong) + h8(0) + h8(0) + h8(0) + h8(0) +
        h8(nb.length + 1L) + h8(crc)
      ino += 1
      out.write(hdr.getBytes("US-ASCII"))
      out.write(nb); out.write(0)
      padTo(out, 4)
      out.write(data)
      padTo(out, 4)
    }
    entries.foreach(e => one(e.name, e.mode, e.mtime, e.data))
    one("TRAILER!!!", 0, 0, Array.emptyByteArray)
    padTo(out, 512)
    out.toByteArray
  }

  /** Emit a portable-ASCII odc ("070707") archive. */
  def encodeOdc(entries: Seq[CpioEntry]): Array[Byte] = {
    val out = new ByteArrayOutputStream(entries.map(_.data.length + 120)
      .sum + 128)
    def o(v: Long, n: Int): String = {
      val s = java.lang.Long.toOctalString(v)
      ("0" * (n - s.length)) + s
    }
    var ino = 1L
    def one(name: String, mode: Int, mtime: Long,
        data: Array[Byte]): Unit = {
      val nb = name.getBytes("UTF-8")
      val hdr = "070707" + o(0, 6) + o(ino, 6) + o(mode.toLong & 0x3ffff, 6) +
        o(0, 6) + o(0, 6) + o(1, 6) + o(0, 6) + o(mtime, 11) +
        o(nb.length + 1L, 6) + o(data.length.toLong, 11)
      ino += 1
      out.write(hdr.getBytes("US-ASCII"))
      out.write(nb); out.write(0)
      out.write(data)
    }
    entries.foreach(e => one(e.name, e.mode, e.mtime, e.data))
    one("TRAILER!!!", 0, 0, Array.emptyByteArray)
    out.toByteArray
  }

  val defs: Seq[QueryDef] = Seq(

    // cpio member census: each doc packs a two-file archive (odc on
    // odd ids; newc on even ids, upgraded to the 070702 CRC form
    // when id%3==0), decodes it back, and ships ONLY the per-doc
    // counters through the shuffle — keys, never blobs.
    QueryDef(
      "q450_cpio_census",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text")
          .fanout.as[(Long, String)]
          .map { case (id, text) =>
            val entries = Seq(
              CpioEntry(s"docs/d$id.txt", 0x81a4, 1000000L + id,
                text.getBytes("UTF-8")),
              CpioEntry(s"meta/m${id % 50}.json", 0x81a4, 2000000L,
                s"""{"id":$id}""".getBytes("UTF-8")))
            val arch =
              if (id % 2 == 1) encodeOdc(entries)
              else encodeNewc(entries, withCrc = id % 3 == 0)
            decode(arch) match {
              case Some(ms) =>
                (id, ms.length.toLong,
                  ms.map(_.data.length.toLong).sum,
                  ms.map(_.name.length.toLong).sum)
              case None => (id, -1L, -1L, -1L)
            }
          }
          .toDF("doc_id", "n_members", "data_bytes", "name_bytes")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(2 AS BIGINT) AS n_members,
               CAST(octet_length(encode(text)) + 7 +
                    length(CAST(doc_id AS VARCHAR)) AS BIGINT)
                 AS data_bytes,
               CAST(10 + length(CAST(doc_id AS VARCHAR)) + 11 +
                    length(CAST(doc_id % 50 AS VARCHAR)) AS BIGINT)
                 AS name_bytes
        FROM documents
        ORDER BY doc_id""")))
}

package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Unix `ar` archive walk + the `.deb` package composition. Debian
  * packages — a major source-code and docs corpus channel (mirror
  * pools carry millions of them) — are ar archives holding
  * `debian-binary`, `control.tar.*`, and `data.tar.*` members, each
  * tarball wrapped in gz/xz/zst. Static libraries (`.a`) are the same
  * container. The format is public (the common `!<arch>` layout
  * shared by GNU/BSD ar): a global 8-byte magic then 60-byte member
  * headers — name(16) mtime(12) uid(6) gid(6) mode(8) size(10) +
  * "`\n" — with data 2-byte aligned. GNU long names resolve through
  * the `//` string table (`/offset` references); the `/` symbol table
  * is skipped as metadata.
  *
  * Referees: `/usr/bin/ar` (archives it builds parse here; archives
  * built here list/extract identically through it) and
  * `/usr/bin/dpkg-deb` (a real dpkg-built .deb walks end-to-end; our
  * emitted .deb satisfies `dpkg-deb --info/--contents`). Corrupt
  * headers, bad magics, truncation, and size lies → None.
  */
object Ar {

  final case class ArMember(name: String, mtime: Long, size: Long,
      dataOffset: Long)

  /** Parse an ar archive; GNU `//` long-name table resolved, the
    * symbol-table member (`/`) skipped. None on any malformed
    * header/magic/bound. */
  def arMembers(b: Array[Byte]): Option[Vector[ArMember]] = {
    if (b == null || b.length < 8) return None
    if (new String(b, 0, 8, "US-ASCII") != "!<arch>\n") return None
    val out = Vector.newBuilder[ArMember]
    var longNames: Array[Byte] = null
    var i = 8
    try {
      while (i < b.length) {
        if (i + 60 > b.length) return None
        def field(off: Int, len: Int): String =
          new String(b, i + off, len, "US-ASCII").trim
        if (b(i + 58) != '`' || b(i + 59) != '\n') return None
        val rawName = field(0, 16)
        val mtime = { val s = field(16, 12); if (s.isEmpty) 0L else s.toLong }
        val size = field(48, 10).toLong
        if (size < 0 || i + 60 + size > b.length) return None
        val dataOff = i + 60
        if (rawName == "//") {
          longNames = java.util.Arrays.copyOfRange(b, dataOff,
            (dataOff + size).toInt)
        } else if (rawName != "/" && rawName != "/SYM64/") {
          val name =
            if (rawName.startsWith("/") && rawName.length > 1) {
              // GNU long-name reference into the // table
              val off = rawName.substring(1).toInt
              if (longNames == null || off < 0 || off >= longNames.length)
                return None
              var e = off
              while (e < longNames.length && longNames(e) != '\n') e += 1
              new String(longNames, off, e - off, "UTF-8")
                .stripSuffix("/")
            } else rawName.stripSuffix("/")
          if (name.isEmpty) return None
          out += ArMember(name, mtime, size, dataOff.toLong)
        }
        i = (dataOff + size + (size & 1)).toInt // 2-byte alignment
      }
      Some(out.result())
    } catch { case _: NumberFormatException => None }
  }

  def memberBytes(b: Array[Byte], m: ArMember): Array[Byte] =
    java.util.Arrays.copyOfRange(b, m.dataOffset.toInt,
      (m.dataOffset + m.size).toInt)

  /** Emit a byte-valid ar archive (GNU style: short names get a
    * trailing '/', long names go through the // table). */
  def encodeAr(members: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new ByteArrayOutputStream(256)
    out.write("!<arch>\n".getBytes("US-ASCII"))
    val needTable = members.exists(_._1.length > 15)
    var table: Array[Byte] = Array.emptyByteArray
    val refs = scala.collection.mutable.HashMap.empty[String, Int]
    if (needTable) {
      val tb = new ByteArrayOutputStream()
      members.foreach { case (n, _) =>
        if (n.length > 15) {
          refs(n) = tb.size
          tb.write((n + "/\n").getBytes("UTF-8"))
        }
      }
      table = tb.toByteArray
    }
    def header(name: String, size: Long): Unit = {
      val h = new StringBuilder
      h.append(name.padTo(16, ' '))
      h.append("0".padTo(12, ' '))             // mtime
      h.append("0".padTo(6, ' '))              // uid
      h.append("0".padTo(6, ' '))              // gid
      h.append("100644".padTo(8, ' '))         // mode
      h.append(size.toString.padTo(10, ' '))
      h.append("`\n")
      out.write(h.toString.getBytes("US-ASCII"))
    }
    if (needTable) {
      header("//", table.length.toLong)
      out.write(table)
      if ((table.length & 1) == 1) out.write('\n')
    }
    members.foreach { case (n, data) =>
      val name = if (n.length > 15) s"/${refs(n)}" else n + "/"
      header(name, data.length.toLong)
      out.write(data, 0, data.length)
      if ((data.length & 1) == 1) out.write('\n')
    }
    out.toByteArray
  }

  /** Emit a .deb-shaped archive: debian-binary + control.tar.gz +
    * data.tar.xz (the modern dpkg layout). */
  def encodeDeb(controlTar: Array[Byte], dataTar: Array[Byte],
      dataXz: Boolean): Array[Byte] =
    encodeAr(Seq(
      ("debian-binary", "2.0\n".getBytes("US-ASCII")),
      ("control.tar.gz", Compression.encodeGzip(controlTar, 0L, None, None)),
      (if (dataXz) "data.tar.xz" else "data.tar.gz",
        if (dataXz) XzCodec.encodeXz(dataTar, checkType = 1, literal = true)
        else Compression.encodeGzip(dataTar, 0L, None, None))))

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // .deb package census: each doc is one package — ar outer walk,
    // the control tarball (gz) yields the parsed control fields, the
    // data tarball (xz on odd ids) yields the payload inventory. All
    // map-side; the oracle replays fields from doc_id arithmetic.
    QueryDef(
      "q434_deb_package_census",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select($"doc_id", $"text")
          .fanout.as[(Long, String)]
          .map { case (id, text) =>
            val control = (s"Package: pkg-${id % 100}\n" +
              s"Version: 1.${id % 20}\n" +
              "Architecture: all\n" +
              s"Installed-Size: ${100 + id % 900}\n").getBytes("UTF-8")
            val controlTar = Archive.encodeTar(Seq(
              Archive.TarEntry("./control", control, 1L)))
            val dataTar = Archive.encodeTar(Seq(
              Archive.TarEntry(s"./usr/share/doc/pkg-${id % 100}/README",
                text.getBytes("UTF-8"), 2L)))
            val deb = encodeDeb(controlTar, dataTar, dataXz = id % 2 == 1)
            val walked = for {
              members <- Ar.arMembers(deb)
              ctrlM <- members.find(_.name == "control.tar.gz")
              ctrl <- Compression.gunzip(memberBytes(deb, ctrlM))
              ctrlFile <- Archive.tarMembers(ctrl).find(_.name == "./control")
              dataM <- members.find(_.name.startsWith("data.tar"))
              dataRaw <- if (dataM.name.endsWith(".xz"))
                XzCodec.xzDecompress(memberBytes(deb, dataM))
              else Compression.gunzip(memberBytes(deb, dataM))
            } yield {
              val fields = new String(ctrl,
                (ctrlFile.headerOffset + 512).toInt,
                ctrlFile.size.toInt, "UTF-8")
                .linesIterator.flatMap { l =>
                  val c = l.indexOf(": ")
                  if (c > 0) Some(l.substring(0, c) -> l.substring(c + 2))
                  else None
                }.toMap
              val payload = Archive.tarMembers(dataRaw)
              (members.length.toLong,
                fields.getOrElse("Package", ""),
                fields.get("Installed-Size").map(_.toLong).getOrElse(-1L),
                payload.length.toLong,
                payload.map(_.size).sum)
            }
            walked match {
              case Some((nm, pkg, isz, np, pb)) => (id, nm, pkg, isz, np, pb)
              case None => (id, -1L, "", -1L, -1L, -1L)
            }
          }
          .toDF("doc_id", "n_members", "package", "installed_size",
            "n_payload", "payload_bytes")
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(3 AS BIGINT) AS n_members,
               'pkg-' || (doc_id % 100) AS package,
               CAST(100 + doc_id % 900 AS BIGINT) AS installed_size,
               CAST(1 AS BIGINT) AS n_payload,
               CAST(octet_length(encode(text)) AS BIGINT) AS payload_bytes
        FROM documents
        ORDER BY doc_id""")))
}

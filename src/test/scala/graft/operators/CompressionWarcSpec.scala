package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class CompressionWarcSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("gzip round-trip: gunzip(encodeGzip(data)) == data across " +
      "optional FNAME/FCOMMENT combinations; metadata recovers") {
    import Compression._
    checkProp(Prop.forAll(Gen.asciiPrintableStr, Gen.choose(0L, 0xffffffffL),
        Gen.option(Gen.alphaNumStr), Gen.option(Gen.alphaNumStr)) {
      (s, mtime, fn, fc) =>
        val data = s.getBytes("UTF-8")
        val blob = encodeGzip(data, mtime, fn, fc)
        val meta = decodeGzipHeader(blob)
        gunzip(blob).exists(_.sameElements(data)) &&
          meta.exists(m => m.mtime == mtime && m.fname == fn &&
            m.fcomment == fc && m.isize == data.length.toLong)
    })
  }

  test("gzip interop: the JDK's own GZIPInputStream reads our member, " +
      "and we read GZIPOutputStream's") {
    import Compression._
    val data = "interop payload - both directions".getBytes("UTF-8")
    val ours = encodeGzip(data, 0L, Some("x"), None)
    val jdkRead = new java.io.ByteArrayInputStream(ours)
    val in = new java.util.zip.GZIPInputStream(jdkRead)
    assert(in.readAllBytes().sameElements(data))
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(data); gz.close()
    assert(gunzip(bos.toByteArray).exists(_.sameElements(data)))
  }

  test("corrupt gzip yields None, never throws or returns bad bytes: " +
      "flipped payload bit (CRC), wrong ISIZE, truncation, bad magic") {
    import Compression._
    val good = encodeGzip("verify me please".getBytes, 7L, None, None)
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone; f(c); c
    }
    assert(gunzip(mut(b => b(12) = (b(12) ^ 0x01).toByte)).isEmpty,
      "a flipped deflate bit must fail the CRC check")
    assert(gunzip(mut(b => b(b.length - 1) = 0x7f)).isEmpty,
      "a wrong declared ISIZE must be rejected")
    assert(gunzip(good.take(good.length - 3)).isEmpty)
    assert(gunzip(mut(b => b(0) = 0x1e)).isEmpty)
    assert(decodeGzipHeader(mut(b => b(3) = 0xe0.toByte)).isEmpty,
      "reserved FLG bits must be rejected")
  }

  test("concatenated gzip members split by inflater-consumed bytes: " +
      "every member independently verified, torn tail keeps the prefix") {
    import Compression._
    val parts = Seq("first member", "", "third member with more bytes")
      .map(_.getBytes("UTF-8"))
    val blob = parts.zipWithIndex.map { case (p, i) =>
      encodeGzip(p, i.toLong, if (i == 1) Some(s"n$i") else None, None)
    }.reduce(_ ++ _)
    val got = gunzipMembers(blob)
    assert(got.size == 3)
    got.zip(parts).foreach { case (g, p) => assert(g.sameElements(p)) }
    // single-member gunzip REJECTS the concatenation (trailing member
    // is not "one clean member")
    assert(gunzip(blob).isEmpty)
    assert(gunzip(encodeGzip(parts(0), 0L, None, None)).isDefined)
    // torn tail: cut into the last member -> first two still decode
    val torn = gunzipMembers(blob.dropRight(5))
    assert(torn.size == 2)
    // a flipped bit in member 2 stops the walk after member 1 (the
    // member boundary itself is unrecoverable without the CRC passing)
    val m1len = encodeGzip(parts(0), 0L, None, None).length
    val bad = blob.clone
    bad(m1len + 14) = (bad(m1len + 14) ^ 0x01).toByte
    assert(gunzipMembers(bad).size == 1)
  }

  test("zstd header round-trip across descriptor-driven field sizes; " +
      "single-segment and malformed forms handled") {
    import Compression._
    checkProp(Prop.forAll(Gen.choose(10, 31),
        Gen.oneOf(0L, 7L, 300L, 70000L, 4000000000L),
        Gen.option(Gen.choose(0L, 1L << 40)), Gen.oneOf(true, false)) {
      (wlog, did, cs, ck) =>
        val blob = encodeZstdHeader(wlog, did, cs, ck, "pay".getBytes)
        decodeZstdHeader(blob).exists { m =>
          m.dictId == did && m.contentSize == cs && m.checksum == ck &&
            m.windowSize.contains(1L << wlog)
        }
    })
    // hand-built single-segment frame: no window descriptor, 1-byte FCS
    val ss = Array(0x28, 0xb5, 0x2f, 0xfd, 0x20, 42).map(_.toByte)
    assert(decodeZstdHeader(ss).contains(
      ZstdMeta(Some(42L), 0L, Some(42L), checksum = false)))
    // reserved descriptor bit set -> None; skippable magic -> None
    assert(decodeZstdHeader(Array(0x28, 0xb5, 0x2f, 0xfd, 0x08, 0)
      .map(_.toByte)).isEmpty)
    assert(decodeZstdHeader(Array(0x50, 0x2a, 0x4d, 0x18, 0, 0)
      .map(_.toByte)).isEmpty)
    assert(decodeZstdHeader("not zstd at all".getBytes).isEmpty)
  }

  test("sniffContent routes every family format and never misroutes " +
      "text that happens to start with a magic-ish prefix") {
    import Multimodal.sniffContent
    assert(sniffContent(ImageHeaders.encodePng(10, 9, 8,
      Array.emptyByteArray)) == (("png", Some(10L))))
    assert(sniffContent(AudioHeaders.encodeFlac(48000, 2, 16, 5L,
      Array.emptyByteArray)) == (("flac", Some(48000L))))
    assert(sniffContent(Compression.encodeGzip("x".getBytes, 0L, None,
      None)) == (("gzip", Some(1L))))
    assert(sniffContent(Warc.encodeRecord("response", None, "<u>",
      "p".getBytes)) == (("warc", Some(1L))))
    // magic-ish text prefixes stay text: the decoders are strict
    assert(sniffContent("BMW is a carmaker".getBytes)._1 == "ascii")
    assert(sniffContent("ID3 tags are metadata".getBytes)._1 == "ascii")
    assert(sniffContent("RIFFle through it".getBytes)._1 == "ascii")
    assert(sniffContent(Array.emptyByteArray)._1 == "empty")
  }

  test("WARC: length-jump splitting survives payloads that CONTAIN " +
      "record-header text; records round-trip in order") {
    import Warc._
    val trap = "WARC/1.1\r\nWARC-Type: fake\r\n\r\nnot a record"
    val blob =
      encodeRecord("response", Some("https://a.example/1"), "<urn:1>",
        trap.getBytes("ISO-8859-1")) ++
      encodeRecord("metadata", None, "<urn:2>",
        "plain".getBytes) ++
      encodeRecord("request", Some("https://a.example/3"), "<urn:3>",
        Array.emptyByteArray)
    val recs = parse(blob)
    assert(recs.map(r => (r.recordIdx, r.warcType, r.targetUri,
      r.recordId, r.contentLength)) == Vector(
      (0, "response", Some("https://a.example/1"), Some("<urn:1>"),
        trap.length.toLong),
      (1, "metadata", None, Some("<urn:2>"), 5L),
      (2, "request", Some("https://a.example/3"), Some("<urn:3>"), 0L)))
    assert(new String(recs(0).payload, "ISO-8859-1") == trap)
  }

  test("WARC: a torn tail returns the good prefix records, not nothing") {
    import Warc._
    val good = encodeRecord("response", None, "<urn:1>", "abc".getBytes)
    // second record declares more payload than the buffer carries
    val torn = good ++ ("WARC/1.1\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:2>\r\nContent-Length: 99999\r\n\r\nxx")
      .getBytes("ISO-8859-1")
    val recs = parse(torn)
    assert(recs.size == 1 && recs(0).recordId.contains("<urn:1>"))
    // header-less garbage after a good record also ends the walk clean
    assert(parse(good ++ "garbage".getBytes).size == 1)
    // missing Content-Length is malformed
    assert(parse(("WARC/1.1\r\nWARC-Type: x\r\n\r\n").getBytes).isEmpty)
    assert(parse(Array.emptyByteArray).isEmpty)
    assert(parse(null).isEmpty)
  }

  test("WARC header names are case-insensitive; values trim") {
    import Warc._
    val raw = ("WARC/1.1\r\ncontent-length:  4 \r\n" +
      "warc-TYPE:   response  \r\n\r\nbody\r\n\r\n").getBytes("ISO-8859-1")
    val recs = parse(raw)
    assert(recs.size == 1)
    assert(recs(0).warcType == "response" && recs(0).contentLength == 4L)
    assert(new String(recs(0).payload) == "body")
  }

  test("parquet shell: round-trip, strict trailer/bounds checks, and " +
      "dispatcher routing") {
    import Compression._
    for (fl <- Seq(1, 100, 4096); enc <- Seq(false, true);
         payLen <- Seq(0, 37)) {
      val blob = encodeParquetShell(Array.fill(payLen)('d'.toByte), fl, enc)
      assert(decodeParquetShell(blob).contains(ParquetShell(fl.toLong, enc)),
        s"fl=$fl enc=$enc payLen=$payLen")
      assert(blob.length == 12 + payLen + fl)
    }
    val good = encodeParquetShell("data".getBytes, 64, encryptedFooter = false)
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone; f(c); c
    }
    val e = good.length
    val cases: Seq[(String, Array[Byte])] = Seq(
      "empty" -> Array.emptyByteArray,
      "truncated below minimum" -> good.take(11),
      "bad leading magic" -> mut(b => b(0) = 'Q'.toByte),
      "bad trailing magic" -> mut(b => b(e - 1) = 'X'.toByte),
      "footer length exceeds file" -> mut(b => b(e - 6) = 0x7f.toByte),
      "zero footer length" -> mut { b =>
        b(e - 8) = 0; b(e - 7) = 0; b(e - 6) = 0; b(e - 5) = 0
      },
      // 'PAR1' text prefix alone is not a parquet file
      "textual PAR1 prefix" -> "PAR1 is a magic string".getBytes)
    cases.foreach { case (why, b) =>
      assert(decodeParquetShell(b).isEmpty, why)
    }
    assert(Multimodal.sniffContent(good) == (("parquet", Some(64L))))
    val encd = encodeParquetShell("d".getBytes, 32, encryptedFooter = true)
    assert(Multimodal.sniffContent(encd) == (("parquet", Some(32L))))
  }
}

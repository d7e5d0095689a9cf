package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Pdf._

class PdfSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("PDF round-trip across versions, page counts, encryption, payload") {
    checkProp(Prop.forAll(Gen.oneOf("1.4", "1.5", "1.7", "2.0"),
        Gen.choose(1, 50), Gen.oneOf(true, false),
        Gen.choose(0, 500)) { (v, np, enc, plen) =>
      val blob = encodePdf(v, np, enc, Array.fill(plen)('x'.toByte))
      val objs = 3 + np + (if (enc) 1 else 0)
      decodePdf(blob).contains(PdfMeta(v, np, objs, enc))
    })
  }

  test("payload containing PDF keywords does not derail the parse") {
    // startxref / trailer / endobj text INSIDE the content stream must
    // be invisible: the anchor scan is tail-only and the object walk
    // follows xref offsets, never content scans
    val evil = ("startxref\n0\n%%EOF\ntrailer << /Size 1 >>\n" +
      "endobj\n1 0 obj\n/Count 999 /Type /Catalog").getBytes("ISO-8859-1")
    val blob = encodePdf("1.6", 3, encrypted = false, evil)
    assert(decodePdf(blob).contains(PdfMeta("1.6", 3, 6, false)))
  }

  test("xref offsets are real: payload length shifts them and the walk " +
      "still lands on every object") {
    (0 to 64).foreach { plen =>
      val blob = encodePdf("1.4", 2, encrypted = true,
        Array.fill(plen)('y'.toByte))
      assert(decodePdf(blob).contains(PdfMeta("1.4", 2, 6, true)))
    }
  }

  test("malformed PDF yields None, never a throw") {
    val good = encodePdf("1.7", 4, encrypted = false, "body".getBytes)
    assert(decodePdf(null) === None)
    assert(decodePdf(Array.emptyByteArray) === None)
    assert(decodePdf("%PDF-1.4\n".getBytes) === None)
    assert(decodePdf("not a pdf at all, but long enough to scan".getBytes)
      === None)
    // truncation sweep must never throw
    (1 until good.length by 11).foreach(n => decodePdf(good.take(n)))
    // startxref pointing past the end
    val s = new String(good, "ISO-8859-1")
    val broken = s.replaceAll("startxref\n\\d+", "startxref\n99999999")
      .getBytes("ISO-8859-1")
    assert(decodePdf(broken) === None)
    // a corrupted xref offset must fail the object-number sanity check
    val badOff = good.clone()
    val xrefAt = new String(good, "ISO-8859-1").indexOf("xref\n0 ")
    // first real entry row starts after "xref\n0 N\n" + 20 (the free row)
    val row1 = new String(good, "ISO-8859-1").indexOf("\n", xrefAt + 5) + 1 + 20
    badOff(row1) = '9'; badOff(row1 + 1) = '9'
    assert(decodePdf(badOff) === None)
  }

  test("dispatcher routes a PDF blob with its page count") {
    val blob = encodePdf("1.5", 7, encrypted = false, "hello".getBytes)
    assert(Multimodal.sniffContent(blob) === (("pdf", Some(7L))))
  }

  // ---- content-stream text extraction (round 14) ---------------------

  test("extractText is the identity on planted lines, plain and flate") {
    val pages = Seq(
      Seq("first line", "second (with parens)", "third\\backslash",
        "fourth goes hex"),
      Seq("page two opens", "tabs\tandéaccents"),
      Seq("lone line on page three"))
    for (flate <- Seq(false, true)) {
      val blob = encodeTextPdf("1.6", pages, flate)
      assert(decodePdf(blob).exists(_.nPages == 3))
      assert(extractText(blob) === Some(pages.flatten), s"flate=$flate")
    }
  }

  test("extractText handles every operator shape the emitter uses") {
    // one long page cycles Td/TD/TJ/Tm renderings incl. escapes
    val lines = (0 until 9).map(i => s"l$i (x)\\ ${i * 37}")
    val blob = encodeTextPdf("1.4", Seq(lines), flate = true)
    assert(extractText(blob) === Some(lines))
  }

  test("text-free and malformed streams") {
    // the classic emitter writes a non-text payload stream: no BT/ET
    val plain = encodePdf("1.7", 2, encrypted = false,
      "no text operators here".getBytes)
    assert(extractText(plain) === Some(Seq.empty))
    // truncation sweep: never a throw, and never fabricated text
    val good = encodeTextPdf("1.5", Seq(Seq("abc", "def")), flate = true)
    (1 until good.length by 7).foreach { n =>
      val got = extractText(good.take(n))
      assert(got == None || got == Some(Seq.empty) ||
        got.exists(_.forall(l => l == "abc" || l == "def")))
    }
    // unbalanced paren inside the stream -> None
    val s = new String(encodeTextPdf("1.5", Seq(Seq("abc")), flate = false),
      "ISO-8859-1")
    val broken = s.replace("(abc)", "(abc").getBytes("ISO-8859-1")
    assert(extractText(broken) === None)
  }
  // ---- cross-reference streams + object streams (round 15) -----------

  test("xref-stream round-trip: versions, page counts, predictor, " +
      "encryption; extractText identity on the modern layout") {
    checkProp(Prop.forAll(Gen.oneOf("1.5", "1.6", "1.7", "2.0"),
        Gen.choose(1, 6), Gen.oneOf(1, 12), Gen.oneOf(true, false),
        Gen.choose(0L, 4000L)) { (v, np, pred, enc, seed) =>
      val pages = (0 until np).map { p =>
        (0 until (1 + (seed + p) % 4).toInt).map(k =>
          s"s$seed p$p l$k (${(seed * 7 + p * 3 + k) % 100})")
      }
      val blob = encodeXrefPdf(v, pages, enc, pred)
      val nObjs = 5 + 2 * np + (if (enc) 1 else 0)
      val metaOk = decodePdf(blob).contains(PdfMeta(v, np, nObjs, enc))
      val textOk =
        if (enc) extractText(blob).isEmpty // ciphertext is not text
        else extractText(blob).contains(pages.flatten)
      metaOk && textOk
    })
  }

  test("predictor coding changes the bytes, not the decode") {
    val pages = Seq(Seq("alpha", "beta"), Seq("gamma"))
    val plain = encodeXrefPdf("1.6", pages, encrypted = false, 1)
    val coded = encodeXrefPdf("1.6", pages, encrypted = false, 12)
    assert(!plain.sameElements(coded))
    assert(decodePdf(plain) === decodePdf(coded))
    assert(extractText(plain) === extractText(coded))
    assert(extractText(plain) === Some(Seq("alpha", "beta", "gamma")))
  }

  test("an incremental update chains through /Prev with " +
      "newest-section-wins merge") {
    val base = encodeXrefPdf("1.7", Seq(Seq("kept line")),
      encrypted = false, 12)
    val s = new String(base, "ISO-8859-1")
    val oldXref = s.substring(s.lastIndexOf("startxref") + 10).trim
      .takeWhile(_.isDigit)
    // the update appends one new object and an xref stream indexing it
    val sizeOld = decodePdf(base).get.nObjects + 1
    val bos = new java.io.ByteArrayOutputStream()
    bos.write(base, 0, base.length)
    val newObjNum = sizeOld // next free number
    val newObjOff = bos.size()
    bos.write((s"$newObjNum 0 obj (noise) endobj\n")
      .getBytes("ISO-8859-1"))
    val xrefOff2 = bos.size()
    // two rows: the new object and this xref stream, W=[1 4 2]
    val rows = new Array[Byte](14)
    def put(o: Int, off: Int): Unit = {
      rows(o) = 1
      rows(o + 1) = ((off >> 24) & 0xff).toByte
      rows(o + 2) = ((off >> 16) & 0xff).toByte
      rows(o + 3) = ((off >> 8) & 0xff).toByte
      rows(o + 4) = (off & 0xff).toByte
    }
    put(0, newObjOff)
    put(7, xrefOff2)
    val d = new java.util.zip.Deflater()
    d.setInput(rows); d.finish()
    val cbuf = new Array[Byte](256)
    val clen = d.deflate(cbuf); d.end()
    val xnum = newObjNum + 1
    bos.write((s"$xnum 0 obj << /Type /XRef /Size ${xnum + 1} " +
      s"/Root 1 0 R /Prev $oldXref /W [1 4 2] " +
      s"/Index [$newObjNum 2] /Length $clen /Filter /FlateDecode " +
      ">> stream\n").getBytes("ISO-8859-1"))
    bos.write(cbuf, 0, clen)
    bos.write(("\nendstream endobj\n" +
      s"startxref\n$xrefOff2\n%%EOF\n").getBytes("ISO-8859-1"))
    val updated = bos.toByteArray
    val m = decodePdf(updated).get
    assert(m.nPages === 1)
    assert(m.nObjects === xnum) // /Size grew by the two new objects
    assert(extractText(updated) === Some(Seq("kept line")))
  }

  test("malformed xref-stream PDFs yield None, never a throw") {
    val good = encodeXrefPdf("1.7", Seq(Seq("abc", "def"), Seq("ghi")),
      encrypted = false, 12)
    // truncation sweep across the whole file
    (1 until good.length by 5).foreach { n =>
      decodePdf(good.take(n)); extractText(good.take(n))
    }
    assert(decodePdf(good.take(good.length - 8)) === None)
    // startxref pointing at a non-object
    val s = new String(good, "ISO-8859-1")
    val broken = s.replaceAll("startxref\\n\\d+", "startxref\n17")
      .getBytes("ISO-8859-1")
    assert(decodePdf(broken) === None)
    // corrupt the compressed xref stream payload
    val bad = good.clone
    val xAt = s.lastIndexOf("stream\n") + 7
    bad(xAt + 4) = (bad(xAt + 4) ^ 0x55).toByte
    assert(decodePdf(bad) === None)
  }

  test("the dispatcher and sniff route a modern-layout PDF") {
    val blob = encodeXrefPdf("1.6", Seq(Seq("x"), Seq("y"), Seq("z")),
      encrypted = false, 12)
    assert(Multimodal.sniffContent(blob) === (("pdf", Some(3L))))
  }

  // ---- document outlines / TOC (round 16) -----------------------------

  test("outline round-trip: pre-order titles, count and depth; parens " +
      "and backslashes in titles survive; ObjStm-compressed items") {
    checkProp(Prop.forAll(Gen.choose(1, 4), Gen.choose(0L, 4000L)) {
      (nTop, seed) =>
        val items = (0 until nTop).map { t =>
          val nK = ((seed + t) % 3).toInt
          OItem(s"s$seed (t$t)", (0 until nK).map { j =>
            val g = if ((seed + t + j) % 4 == 0)
              Seq(OItem(s"g\\$t deep")) else Nil
            OItem(s"s$seed t$t k$j", g)
          })
        }
        def pre(it: OItem): Seq[String] = it.title +: it.kids.flatMap(pre)
        def dep(it: OItem): Int =
          1 + (if (it.kids.isEmpty) 0 else it.kids.map(dep).max)
        val titles = items.flatMap(pre)
        val blob = encodeXrefPdf("1.7", Seq(Seq("x")), encrypted = false,
          predictor = 12, outline = items)
        decodeOutline(blob).contains(
          PdfOutline(titles.length, items.map(dep).max, titles)) &&
          // the rest of the decode surface is undisturbed
          decodePdf(blob).exists(_.nPages == 1) &&
          extractText(blob).contains(Seq("x"))
    })
  }

  test("a PDF without /Outlines yields the EMPTY outline, not None") {
    val blob = encodeXrefPdf("1.6", Seq(Seq("x")), encrypted = false, 1)
    assert(decodeOutline(blob) === Some(PdfOutline(0, 0, Nil)))
    // classic layout too
    val classic = encodePdf("1.4", 2, encrypted = false,
      "BT (t) Tj ET".getBytes("ISO-8859-1"))
    assert(decodeOutline(classic) === Some(PdfOutline(0, 0, Nil)))
  }

  test("outline malformations: reference cycles, missing /Title, " +
      "truncation — None, never a throw or an infinite walk") {
    def classicWith(objs: Seq[String]): Array[Byte] = {
      val out = new StringBuilder
      val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
      out.append("%PDF-1.4\n")
      objs.zipWithIndex.foreach { case (body, i) =>
        offs += out.length
        out.append(s"${i + 1} 0 obj $body endobj\n")
      }
      val size = objs.length + 1
      val xref = out.length
      out.append(s"xref\n0 $size\n0000000000 65535 f \n")
      offs.foreach(o => out.append(f"$o%010d 00000 n \n"))
      out.append(s"trailer << /Size $size /Root 1 0 R >>\n" +
        s"startxref\n$xref\n%%EOF\n")
      out.toString.getBytes("ISO-8859-1")
    }
    val base = Seq(
      "<< /Type /Catalog /Pages 2 0 R /Outlines 3 0 R >>",
      "<< /Type /Pages /Kids [] /Count 0 >>",
      "<< /Type /Outlines /First 4 0 R /Last 5 0 R /Count 2 >>")
    // well-formed two-item chain decodes
    val good = classicWith(base ++ Seq(
      "<< /Title (a) /Parent 3 0 R /Next 5 0 R >>",
      "<< /Title (b) /Parent 3 0 R /Prev 4 0 R >>"))
    assert(decodeOutline(good) === Some(PdfOutline(2, 1, Seq("a", "b"))))
    // /Next cycling back to a visited item must stop cleanly
    val cycle = classicWith(base ++ Seq(
      "<< /Title (a) /Parent 3 0 R /Next 5 0 R >>",
      "<< /Title (b) /Parent 3 0 R /Prev 4 0 R /Next 4 0 R >>"))
    assert(decodeOutline(cycle) === None)
    // an item without the REQUIRED /Title rejects
    val untitled = classicWith(base ++ Seq(
      "<< /Parent 3 0 R /Next 5 0 R >>",
      "<< /Title (b) /Parent 3 0 R >>"))
    assert(decodeOutline(untitled) === None)
    // truncation sweep over an outline-bearing modern blob
    val blob = encodeXrefPdf("1.7", Seq(Seq("x")), encrypted = false, 12,
      outline = Seq(OItem("top", Seq(OItem("kid")))))
    (1 until blob.length by 5).foreach(n => decodeOutline(blob.take(n)))
  }

  // ---- classic incremental updates (round 16) --------------------------

  test("incremental updates: sparse multi-subsection sections chain " +
      "through /Prev with newest-wins; original bytes untouched") {
    checkProp(Prop.forAll(Gen.choose(2, 5), Gen.choose(0L, 4000L),
        Gen.oneOf(true, false)) { (np, seed, flate) =>
      val pages = (0 until np).map(p =>
        (0 until (1 + (seed + p) % 3).toInt).map(k => s"v1 p$p l$k ($seed)"))
      val base = encodeTextPdf("1.4", pages, flate)
      val p1 = (seed % np).toInt
      val up1 = appendIncrementalUpdate(base, np, p1,
        Seq(s"v2 p$p1 ($seed)"), flate)
      // a second update touching a DIFFERENT page
      val p2 = ((seed + 1) % np).toInt
      val up2 = appendIncrementalUpdate(up1, np, p2,
        Seq(s"v3 p$p2 ($seed)", "extra"), !flate)
      val want = pages.zipWithIndex.map { case (orig, p) =>
        if (p == p2) Seq(s"v3 p$p2 ($seed)", "extra")
        else if (p == p1) Seq(s"v2 p$p1 ($seed)")
        else orig
      }
      up2.startsWith(up1) && up1.startsWith(base) && // append-only
        extractText(up2).contains(want.flatten) &&
        decodePdf(up2).contains(PdfMeta("1.4", np, 3 + 2 * np, false))
    })
  }

  test("re-updating the SAME page twice: the newest section wins " +
      "over the middle one, not just over the base") {
    val base = encodeTextPdf("1.5", Seq(Seq("first")), flate = false)
    val up1 = appendIncrementalUpdate(base, 1, 0, Seq("second"), true)
    val up2 = appendIncrementalUpdate(up1, 1, 0, Seq("third"), false)
    assert(extractText(up1) === Some(Seq("second")))
    assert(extractText(up2) === Some(Seq("third")))
  }

  test("incremental malformations: /Prev cycles, dangling /Prev, " +
      "truncation — None, never a throw or an endless chain") {
    val base = encodeTextPdf("1.4", Seq(Seq("a"), Seq("b")), false)
    val up = appendIncrementalUpdate(base, 2, 0, Seq("c"), false)
    val s = new String(up, "ISO-8859-1")
    // self-loop: /Prev pointing at the NEWEST section's own offset
    val ownOff = s.substring(s.lastIndexOf("startxref") + 9).trim
      .takeWhile(_.isDigit)
    val cycle = s.replaceAll("/Prev \\d+", s"/Prev $ownOff")
      .getBytes("ISO-8859-1")
    assert(decodePdf(cycle) === None)
    // dangling /Prev into the middle of nowhere
    val dangling = s.replaceAll("/Prev \\d+", "/Prev 17")
      .getBytes("ISO-8859-1")
    assert(decodePdf(dangling) === None)
    (1 until up.length by 5).foreach { n =>
      decodePdf(up.take(n)); extractText(up.take(n))
    }
  }

  // ---- hybrid-reference files (round 16) ------------------------------

  test("hybrid-reference round-trip: the classic table's free entries " +
      "resolve through the trailer's /XRefStm stream") {
    checkProp(Prop.forAll(Gen.oneOf("1.4", "1.5", "1.6", "1.7"),
        Gen.choose(1, 6), Gen.oneOf(1, 12), Gen.choose(0L, 4000L)) {
      (v, np, pred, seed) =>
        val pages = (0 until np).map { p =>
          (0 until (1 + (seed + p) % 4).toInt).map(k =>
            s"h$seed p$p l$k (${(seed * 5 + p * 3 + k) % 100})")
        }
        val blob = encodeHybridPdf(v, pages, pred)
        // size = 6 + 2*np objects incl. the free head → nObjects 5+2np
        decodePdf(blob).contains(PdfMeta(v, np, 5 + 2 * np, false)) &&
          extractText(blob).contains(pages.flatten)
    })
  }

  test("hybrid precedence: the classic table's in-use entries win " +
      "over the /XRefStm stream where both define an object") {
    val blob = encodeHybridPdf("1.6", Seq(Seq("alpha"), Seq("beta")), 1)
    assert(extractText(blob) === Some(Seq("alpha", "beta")))
    val s = new String(blob, "ISO-8859-1")
    // Both indexes define the /ObjStm's offset (object 8 here: n=2 →
    // objStmNum = 4+2n). Break the CLASSIC row only — the stream still
    // carries the correct offset. Table-wins means the broken table
    // entry is operative, the lookup's object-number check fails, and
    // the decode returns None; a stream-wins reader would succeed.
    val objStmNum = 8
    val tableAt = s.lastIndexOf("xref\n0 10\n")
    assert(tableAt > 0)
    val rowAt = tableAt + "xref\n0 10\n".length + 20 * objStmNum
    val goodOff = s.substring(rowAt, rowAt + 10).toLong
    val patched = s.substring(0, rowAt) + f"${goodOff + 2}%010d" +
      s.substring(rowAt + 10)
    assert(patched.length === s.length)
    assert(decodePdf(patched.getBytes("ISO-8859-1")) === None)
    // a trailer whose /XRefStm points at a non-object rejects (hidden
    // objects would silently vanish otherwise)
    val broken = s.replaceAll("/XRefStm \\d+", "/XRefStm 17")
      .getBytes("ISO-8859-1")
    assert(decodePdf(broken) === None)
  }

  test("hybrid malformed sweep: truncation never throws") {
    val good = encodeHybridPdf("1.7", Seq(Seq("abc", "def"), Seq("g")), 12)
    (1 until good.length by 5).foreach { n =>
      decodePdf(good.take(n)); extractText(good.take(n))
    }
    assert(decodePdf(good.take(good.length - 8)) === None)
    // the classic-only view of the same file (drop /XRefStm): the
    // table alone no longer reaches the hidden catalog → clean None
    val classicOnly = new String(good, "ISO-8859-1")
      .replaceAll("/XRefStm \\d+ ", "").getBytes("ISO-8859-1")
    assert(decodePdf(classicOnly) === None)
  }

  test("multi-level page trees: intermediate /Pages nodes walk in " +
      "tree order; flat and tree layouts extract identically") {
    checkProp(Prop.forAll(Gen.choose(3, 12), Gen.choose(2, 4),
        Gen.choose(0L, 999L)) { (np, fanout, seed) =>
      val pages = (0 until np).map(p =>
        (0 until (1 + (seed + p) % 3).toInt).map(k => s"p$p l$k ($seed)"))
      val flat = encodeXrefPdf("1.7", pages, encrypted = false, 12)
      val tree = encodeXrefPdf("1.7", pages, encrypted = false, 12,
        treeFanout = fanout)
      val nInt = { val g = (np + fanout - 1) / fanout
        if (g >= 2) g else 0 }
      decodePdf(tree).contains(PdfMeta("1.7", np, 5 + 2 * np + nInt,
        false)) &&
        extractText(tree) == extractText(flat) &&
        extractText(tree).contains(pages.flatten)
    })
  }

}

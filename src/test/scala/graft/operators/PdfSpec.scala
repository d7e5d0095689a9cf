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
}

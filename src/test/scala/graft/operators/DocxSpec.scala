package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Docx._

class DocxSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("round-trip: split runs reassemble, tabs render, entities " +
      "decode, empty paragraphs survive") {
    checkProp(Prop.forAll(Gen.alphaNumStr.map("T " + _),
        Gen.alphaNumStr.map("C" + _), Gen.choose(1, 8),
        Gen.choose(0L, 9999L)) { (title, creator, nP, seed) =>
      val paras = (0 until nP).map {
        case 0 => s"first <p> & last ($seed)"
        case 1 => "" // empty paragraph
        case 2 => "col a\tcol b\tcol c"
        case k => s"paragraph $k body ${seed * k}"
      }
      val m = decodeDocx(encodeDocx(title, creator, paras)).get
      m == DocxMeta(Some(title), Some(creator), nP, paras.mkString("\n"))
    })
  }

  test("the main part path resolves through _rels, not a hard-coded " +
      "name") {
    val m = decodeDocx(encodeDocx("t", "c", Seq("body text"),
      mainPath = "word/other-name.xml")).get
    assert(m.text === "body text")
  }

  test("leading/trailing spaces survive via xml:space=preserve runs") {
    val m = decodeDocx(encodeDocx("t", "c", Seq("  padded  "))).get
    assert(m.text === "  padded  ")
  }

  test("w:br renders as a newline inside one paragraph") {
    // patch the emitted tab element into a br element and re-zip
    val blob = encodeDocx("t", "c", Seq("a\tb"))
    val entries = Archive.zipEntries(blob).get
    val patched = Archive.encodeZip(entries.map { e =>
      val data = Archive.unzipEntry(blob, e).get
      val out =
        if (e.name == "word/document.xml")
          new String(data, "UTF-8").replace("<w:tab/>", "<w:br/>")
            .getBytes("UTF-8")
        else data
      (e.name, out, true)
    })
    assert(decodeDocx(patched).get.text === "a\nb")
  }

  test("tab-stop DEFINITIONS in w:pPr never render as text tabs") {
    // the emitter plants <w:tabs><w:tab w:pos=.../></w:tabs> stop
    // definitions whenever a paragraph uses tabs; only the run-level
    // <w:tab/> elements may surface as '\t'
    assert(decodeDocx(encodeDocx("t", "c", Seq("a\tb"))).get.text
      === "a\tb")
    // a paragraph with stops but NO run tabs yields zero tabs
    val blob = encodeDocx("t", "c", Seq("plain"))
    val entries = Archive.zipEntries(blob).get
    val patched = Archive.encodeZip(entries.map { e =>
      val data = Archive.unzipEntry(blob, e).get
      val out =
        if (e.name == "word/document.xml")
          new String(data, "UTF-8").replace("</w:pPr>",
            "<w:tabs><w:tab w:val=\"left\" w:pos=\"720\"/></w:tabs>" +
              "</w:pPr>").getBytes("UTF-8")
        else data
      (e.name, out, true)
    })
    assert(decodeDocx(patched).get.text === "plain")
    // a torn pPr block rejects
    val torn = Archive.encodeZip(entries.map { e =>
      val data = Archive.unzipEntry(blob, e).get
      val out =
        if (e.name == "word/document.xml")
          new String(data, "UTF-8").replace("</w:pPr>", "")
            .getBytes("UTF-8")
        else data
      (e.name, out, true)
    })
    assert(decodeDocx(torn) === None)
  }

  test("missing core props degrade per-field; torn XML rejects") {
    val good = encodeDocx("T", "C", Seq("hello", "world"))
    // strip docProps/core.xml by re-zipping without it
    val entries = Archive.zipEntries(good).get
    val without = Archive.encodeZip(entries
      .filterNot(_.name == "docProps/core.xml")
      .map(e => (e.name, Archive.unzipEntry(good, e).get, true)))
    val m = decodeDocx(without).get
    assert(m.title === None && m.creator === None)
    assert(m.text === "hello\nworld")
    // a torn run: truncate document.xml mid-<w:t>
    val doc = entries.find(_.name == "word/document.xml").get
    val docXml = new String(Archive.unzipEntry(good, doc).get, "UTF-8")
    val torn = Archive.encodeZip(entries.map { e =>
      val data =
        if (e.name == "word/document.xml")
          docXml.replace("</w:t>", "<x>").getBytes("UTF-8")
        else Archive.unzipEntry(good, e).get
      (e.name, data, true)
    })
    assert(decodeDocx(torn) === None)
    // not a wordprocessing package: EPUB routes to None here
    val epub = Epub.encodeEpub("t", "a", "en", "id", 1)
    assert(decodeDocx(epub) === None)
    // truncation sweep over the zip: never a throw
    (1 until good.length by 7).foreach(n => decodeDocx(good.take(n)))
    assert(decodeDocx(null) === None)
  }
  test("the dispatcher routes OOXML and EPUB containers by real " +
      "decode; plain zips stay zip") {
    import Multimodal.sniffContent
    assert(sniffContent(encodeDocx("t", "c", Seq("a", "b")))
      === (("docx", Some(2L))))
    assert(sniffContent(Xlsx.encodeXlsx(Seq(("s",
      Seq(Seq(Left("x"), Right(1L)))))))
      === (("xlsx", Some(2L))))
    assert(sniffContent(Pptx.encodePptx(Seq(("t", Seq("p")), ("u", Nil))))
      === (("pptx", Some(2L))))
    assert(sniffContent(Epub.encodeEpub("t", "a", "en", "i", 3))
      === (("epub", Some(3L))))
    assert(sniffContent(Archive.encodeZip(Seq(
      ("a.txt", "hello".getBytes, true),
      ("b.txt", "world".getBytes, false))))
      === (("zip", Some(2L))))
  }

}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Pptx._

class PptxSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("round-trip: split runs reassemble, deck order follows " +
      "sldIdLst despite scrambled part names") {
    checkProp(Prop.forAll(Gen.choose(1, 5), Gen.choose(0, 4),
        Gen.choose(0L, 9999L)) { (nSlides, nParas, seed) =>
      val slides = (0 until nSlides).map { s =>
        (s"Title $s <&> $seed",
          (0 until nParas).map(p => s"bullet $s.$p ($seed)"))
      }
      val m = decodePptx(encodePptx(slides)).get
      val expText = slides.map { case (t, ps) =>
        if (ps.isEmpty) t else t + "\n" + ps.mkString("\n")
      }.mkString("\n")
      val expShapes = slides.map { case (_, ps) =>
        1 + (if (ps.isEmpty) 0 else 1) }.sum
      m == PptxMeta(nSlides, expShapes, expText)
    })
  }

  test("slide order is sldIdLst order, not file-name order") {
    val m = decodePptx(encodePptx(Seq(
      ("first", Seq("a")), ("second", Seq("b")), ("third", Nil)))).get
    // emitter stores deck slide 0 in slide3.xml etc. — a file-name
    // walk would yield "third" first
    assert(m.text === "first\na\nsecond\nb\nthird")
    assert(m.nSlides === 3)
    assert(m.nShapes === 5)
  }

  test("a:br renders as a newline inside one paragraph") {
    val blob = encodePptx(Seq(("t", Seq("x"))))
    val entries = Archive.zipEntries(blob).get
    val patched = Archive.encodeZip(entries.map { e =>
      val data = Archive.unzipEntry(blob, e).get
      val out =
        if (e.name == "ppt/slides/slide1.xml")
          new String(data, "UTF-8").replace("<a:t>x</a:t>",
            "<a:t>x</a:t><a:br/><a:t>y</a:t>").getBytes("UTF-8")
        else data
      (e.name, out, true)
    })
    assert(decodePptx(patched).get.text === "t\nx\ny")
  }

  test("non-presentation packages and torn XML reject") {
    assert(decodePptx(null) === None)
    assert(decodePptx(Docx.encodeDocx("t", "c", Seq("p"))) === None)
    assert(decodePptx(Xlsx.encodeXlsx(Seq(("s", Seq(Seq(Left("x")))))))
      === None)
    val good = encodePptx(Seq(("t", Seq("body"))))
    val entries = Archive.zipEntries(good).get
    val torn = Archive.encodeZip(entries.map { e =>
      val data = Archive.unzipEntry(good, e).get
      val out =
        if (e.name == "ppt/slides/slide1.xml")
          new String(data, "UTF-8").replace("</a:t>", "<z>")
            .getBytes("UTF-8")
        else data
      (e.name, out, true)
    })
    assert(decodePptx(torn) === None)
    (1 until good.length by 7).foreach(n => decodePptx(good.take(n)))
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Svg._

class SvgSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 80): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("all four emitter variants round-trip their planted fields") {
    checkProp(Prop.forAll(Gen.choose(1, 2000), Gen.choose(1, 2000),
        Gen.choose(0, 6), Gen.choose(0, 6), Gen.choose(0, 3)) {
      (w, h, np, nr, v) =>
        val m = decodeSvg(encodeSvg(w, h, "A & B <t>", np, nr, v)).get
        val dimsOk =
          if (v == 2) m.width.isEmpty && m.height.isEmpty &&
            m.viewBoxW.contains(w.toDouble) && m.viewBoxH.contains(h.toDouble)
          else if (v == 3) m.width.contains(w.toDouble) &&
            m.height.contains(h.toDouble) && m.viewBoxW.isEmpty
          else m.width.contains(w.toDouble) && m.height.contains(h.toDouble) &&
            m.viewBoxW.contains(w.toDouble) && m.viewBoxH.contains(h.toDouble)
        val titleOk =
          if (v == 3) m.title.isEmpty else m.title.contains("A & B <t>")
        dimsOk && titleOk && m.nPaths == np && m.nShapes == nr
    })
  }

  test("non-px units are rejected, not guessed") {
    val em = """<svg width="10em" height="50%" viewBox="0 0 30 40" xmlns="x">
      |</svg>""".stripMargin.getBytes("UTF-8")
    val m = decodeSvg(em).get
    assert(m.width === None)
    assert(m.height === None)
    assert(m.viewBoxW.contains(30.0))
    assert(m.viewBoxH.contains(40.0))
  }

  test("attribute word boundary: data-width does not satisfy width") {
    val svg = """<svg data-width="99" viewBox="0 0 7 8"></svg>"""
      .getBytes("UTF-8")
    val m = decodeSvg(svg).get
    assert(m.width === None)
    assert(m.viewBoxW.contains(7.0))
  }

  test("element-name prefixes do not inflate counts") {
    val svg = ("""<svg viewBox="0 0 1 1">""" +
      """<linearGradient id="g"/><pathological x="1"/>""" +
      """<polyline points="0,0 1,1"/><path d="M0 0"/></svg>""")
      .getBytes("UTF-8")
    val m = decodeSvg(svg).get
    assert(m.nPaths === 1) // <pathological is not <path
    assert(m.nShapes === 1) // <linearGradient is not <line
  }

  test("non-SVG XML, HTML, and truncated streams yield None") {
    assert(decodeSvg(null) === None)
    assert(decodeSvg("<html><body>hi</body></html>".getBytes) === None)
    assert(decodeSvg("<?xml version=\"1.0\"?><rss></rss>".getBytes) === None)
    assert(decodeSvg("<svgfoo></svgfoo>".getBytes) === None)
    val good = encodeSvg(100, 50, "t", 2, 1, 0)
    (1 until good.length by 3).foreach(n => decodeSvg(good.take(n)))
    // cut inside the root tag: no '>' yet
    val rootAt = new String(good, "UTF-8").indexOf("<svg")
    assert(decodeSvg(good.take(rootAt + 10)) === None)
  }

  test("UTF-8 BOM is tolerated") {
    val svg = Array[Byte](0xef.toByte, 0xbb.toByte, 0xbf.toByte) ++
      encodeSvg(20, 10, "t", 0, 0, 1)
    assert(decodeSvg(svg).get.width.contains(20.0))
  }

  test("attribute names inside QUOTED VALUES are never matched (the " +
      "tokenizer is quote-aware, not substring-scanning)") {
    // a single-quoted decoy inside a double-quoted value must not
    // yield a plausible-wrong width, nor abort the later real attr
    val decoy = ("""<svg desc="width='999'" viewBox="0 0 10 20">""" +
      "<path d=\"M0 0\"/></svg>").getBytes("UTF-8")
    val m = decodeSvg(decoy).get
    assert(m.width === None)
    assert(m.viewBoxW.contains(10.0))
    assert(m.viewBoxH.contains(20.0))
    // an unquoted decoy inside a quoted value: the REAL width later in
    // the tag must still be read
    val decoy2 = ("""<svg data="width=7 h" width="30" height="40">""" +
      "</svg>").getBytes("UTF-8")
    val m2 = decodeSvg(decoy2).get
    assert(m2.width.contains(30.0))
    assert(m2.height.contains(40.0))
    // '>' inside a quoted value must not end the root tag early
    val gt = ("""<svg desc="a > b" viewBox="0 0 5 6">""" +
      "<path d=\"M0 0\"/></svg>").getBytes("UTF-8")
    assert(decodeSvg(gt).get.viewBoxW.contains(5.0))
    assert(decodeSvg(gt).get.nPaths === 1)
    // a genuinely unquoted attribute is not well-formed XML -> None
    assert(decodeSvg("<svg width=30></svg>".getBytes("UTF-8")) === None)
  }

}

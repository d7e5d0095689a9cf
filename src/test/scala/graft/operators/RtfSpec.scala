package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Rtf._

class RtfSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 80): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("round-trip: destination decoys never leak; title captured; " +
      "escapes, accents, tabs survive") {
    checkProp(Prop.forAll(Gen.alphaNumStr.map("T " + _),
        Gen.choose(1, 5), Gen.choose(0L, 9999L)) { (title, nP, seed) =>
      val paras = (0 until nP).map {
        case 0 => s"brace {x} and back\\slash ($seed)"
        case 1 => "café naïve" // \'hh path
        case 2 => "cols\ta\tb"
        case k => s"para $k of $seed"
      }
      val m = decodeRtf(encodeRtf(title, paras)).get
      m == RtfMeta(Some(title), paras.mkString("\n")) &&
        !m.text.contains("DECOY")
    })
  }

  test("unicode control words honor the uc fallback-skip protocol") {
    // \u945 alpha with uc1: the '?' fallback must be skipped
    val rtf = "{\\rtf1\\uc1 pre \\u945? post}".getBytes("ISO-8859-1")
    assert(decodeRtf(rtf).get.text === "pre α post")
    // uc2 skips TWO fallback chars, including \'hh forms
    val rtf2 = "{\\rtf1\\uc2 a\\u8364\\'80? b}".getBytes("ISO-8859-1")
    assert(decodeRtf(rtf2).get.text === "a€ b")
    // emitter path: a >255 char emits \uN with the uc1 fallback
    assert(decodeRtf(encodeRtf("t", Seq("x € y"))).get.text === "x € y")
  }

  test("negative \\uN carries the signed 16-bit value (Word's " +
      "encoding for codepoints >= U+8000, incl. surrogate pairs)") {
    // \u-10179\u-8704 is the surrogate pair for U+1F600 (😀)
    val rtf = "{\\rtf1\\uc1 hi \\u-10179?\\u-8704? !}"
      .getBytes("ISO-8859-1")
    assert(decodeRtf(rtf).get.text === "hi 😀 !")
    // round-trip through the emitter: astral + BMP-high chars survive
    val body = "emoji 😀 and hangul 한"
    assert(decodeRtf(encodeRtf("t", Seq(body))).get.text === body)
    // out-of-range magnitudes still reject
    assert(decodeRtf("{\\rtf1 \\u-70000?}".getBytes) === None)
    assert(decodeRtf("{\\rtf1 \\u70000?}".getBytes) === None)
  }

  test("control-word delimiter rules: one space consumed, digit " +
      "params self-delimit, \\line and \\~ render") {
    val rtf = ("{\\rtf1 a\\line b\\~c\\fs24 d}").getBytes("ISO-8859-1")
    assert(decodeRtf(rtf).get.text === "a\nb cd")
  }

  test("nested groups inside skipped destinations stay skipped") {
    val rtf = ("{\\rtf1{\\fonttbl{\\f0 Inner {deep} text;}}visible}")
      .getBytes("ISO-8859-1")
    assert(decodeRtf(rtf).get.text === "visible")
  }

  test("malformed streams reject: wrong header, unbalanced braces, " +
      "torn escapes; truncation never throws") {
    assert(decodeRtf(null) === None)
    assert(decodeRtf("not rtf at all".getBytes) === None)
    assert(decodeRtf("{\\rtf2 x}".getBytes) === None)
    assert(decodeRtf("{\\rtf1 {unclosed".getBytes) === None)
    assert(decodeRtf("{\\rtf1 bad\\'g".getBytes) === None)
    assert(decodeRtf("{\\rtf1 tail\\".getBytes) === None)
    val good = encodeRtf("T", Seq("some body", "more"))
    (1 until good.length by 3).foreach(n => decodeRtf(good.take(n)))
  }
  test("\\binN raw bytes are skipped, not walked as RTF") {
    // 4 raw bytes including { and \\ that would desync a naive scan
    val rtf = ("{\\rtf1{\\pict\\bin4 " + "{\\}x" + "}after}")
      .getBytes("ISO-8859-1")
    assert(decodeRtf(rtf).get.text === "after")
    // a declared run past the end is a tear
    assert(decodeRtf("{\\rtf1\\bin999 x}".getBytes) === None)
  }

}

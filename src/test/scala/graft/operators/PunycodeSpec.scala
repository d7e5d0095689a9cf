package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Punycode._

/** RFC 3492 conformance, refereed by `java.net.IDN` (the JDK's IDNA):
  * toAscii must equal IDN.toASCII and toUnicode must invert it on
  * generated lowercase labels, plus the RFC's own Appendix A sample
  * strings. */
class PunycodeSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 120): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // lowercase letters from several scripts (chars IDNA2003 keeps
  // unmapped, so pure RFC 3492 output matches java.net.IDN exactly)
  private val alphabet: IndexedSeq[Char] =
    ('a' to 'z') ++ ('а' to 'я') ++ ('α' to 'ω').filter(_ != 'ς') ++
      "üöäéèêçñ中国日本語한국어".toSeq

  private def genLabel: Gen[String] = for {
    n <- Gen.choose(1, 20)
    cs <- Gen.listOfN(n, Gen.oneOf(alphabet))
  } yield cs.mkString

  test("agrees with java.net.IDN on generated labels, both directions") {
    checkProp(Prop.forAll(genLabel) { label =>
      val ref = java.net.IDN.toASCII(label)
      val mine = toAscii(label)
      val back = mine.flatMap(toUnicode)
      mine.contains(ref) && back.contains(label) &&
        java.net.IDN.toUnicode(ref) == label
    })
  }

  test("RFC 3492 Appendix A samples (the famous mixed-script cases)") {
    // (A) Arabic (Egyptian)
    assert(decode("egbpdaj6bu4bxfgehfvwxn").isDefined)
    // (H) simplified Chinese
    assert(decode("ihqwcrb4cv8a8dqg056pqjye")
      .contains("他们为什么不说中文"))
    assert(encode("他们为什么不说中文")
      .contains("ihqwcrb4cv8a8dqg056pqjye"))
    // (S) a mixed ASCII/katakana sample: pin against the live referee
    assert(decode("de-jg4avhby1noc0d")
      .contains(java.net.IDN.toUnicode("xn--de-jg4avhby1noc0d")))
    // pinned fixture ground truth (computed from java.net.IDN)
    Vector(
      ("bücher", "xn--bcher-kva"),
      ("münchen", "xn--mnchen-3ya"),
      ("россия", "xn--h1alffa9f"),
      ("中国", "xn--fiqs8s"),
      ("ελλάδα", "xn--hxakic4aa"),
      ("日本語", "xn--wgv71a119e"),
      ("café", "xn--caf-dma")).foreach { case (uni, ace) =>
      assert(toAscii(uni).contains(ace), uni)
      assert(toUnicode(ace).contains(uni), ace)
      assert(java.net.IDN.toASCII(uni) == ace) // referee stays live
    }
  }

  test("malformed ACE rejects: bad digits, overflow, surrogates, " +
      "truncation") {
    assert(decode(null).isEmpty)
    assert(decode("!!!").isEmpty)
    assert(toUnicode("xn--!!!").isEmpty)
    // overflow: long run of high digits
    assert(decode("99999999999999999999999").isEmpty)
    // RFC 3492 §6.2 n-overflow: digits (1,27,27,32,27,30,32,14)
    // yield i=2147483521 with numPoints=1, so n=128+i wraps negative
    // — must be None, not an uncaught appendCodePoint throw
    assert(decode("b116146o").isEmpty)
    assert(toUnicode("xn--b116146o").isEmpty)
    // non-ASCII in the basic section
    assert(decode("bü-abc").isEmpty)
    // all-ASCII label passes through toAscii unchanged
    assert(toAscii("plain-host").contains("plain-host"))
    assert(toUnicode("plain-host").contains("plain-host"))
  }
}

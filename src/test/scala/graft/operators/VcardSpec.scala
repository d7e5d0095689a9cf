package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Vcard._

class VcardSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 80): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def card(fn: String, fam: String = "Fam", giv: String = "Giv",
      org: String = "Org", nE: Int = 1, nT: Int = 1): CardFixture =
    CardFixture(fn, fam, giv, org,
      (0 until nE).map(i => s"e$i@example.test"),
      (0 until nT).map(i => s"+1-555-000$i"))

  test("round-trip across versions, counts, and multiple cards") {
    checkProp(Prop.forAll(Gen.oneOf("2.1", "3.0", "4.0"),
        Gen.choose(0, 5), Gen.choose(0, 5), Gen.choose(1, 4)) {
      (v, nE, nT, nCards) =>
        val cards = (0 until nCards).map(i =>
          card(s"Person $i", s"Family$i", s"Given$i", s"Org $i", nE, nT))
        val m = decodeVcard(encodeVcard(v, cards)).get
        m == VcardMeta(v, Some("Person 0"),
          Some("Family0"), Some("Given0"), Some("Org 0"), nE, nT, nCards)
    })
  }

  test("escapes unescape and folded lines unfold (75-octet folds)") {
    val long = "A" * 200 // folded across three physical lines
    val m = decodeVcard(encodeVcard("4.0",
      Seq(card(fn = long + "; end, \\done",
        fam = "O'Brien;jr", org = "ACME, Inc.")))).get
    assert(m.fn === Some(long + "; end, \\done"))
    assert(m.family === Some("O'Brien;jr"))
    assert(m.org === Some("ACME, Inc."))
  }

  test("repeated FN keeps the first; group prefixes dispatch; " +
      "params do not leak into values") {
    val m = decodeVcard(encodeVcard("3.0",
      Seq(card("Real Name", nE = 2, nT = 3)))).get
    assert(m.fn === Some("Real Name")) // the DECOY line is ignored
    assert(m.nEmails === 2) // item1.EMAIL counted as EMAIL
    assert(m.nTels === 3) // TEL;TYPE=cell,voice value starts at ':'
  }

  test("structural rejects: unterminated, nested, stray content, " +
      "missing or bad VERSION, non-vcard bytes") {
    val good = new String(encodeVcard("4.0", Seq(card("P"))), "UTF-8")
    assert(decodeVcard(null) === None)
    assert(decodeVcard("BEGIN:VCALENDAR\nEND:VCALENDAR".getBytes) === None)
    assert(decodeVcard(good.replace("END:VCARD", "X:1").getBytes) === None)
    assert(decodeVcard(("BEGIN:VCARD\r\nBEGIN:VCARD\r\nEND:VCARD\r\n" +
      "END:VCARD\r\n").getBytes) === None) // nested
    assert(decodeVcard((good + "FN:stray\r\n").getBytes) === None)
    assert(decodeVcard(good.replace("VERSION:4.0", "X-V:1").getBytes)
      === None) // VERSION is REQUIRED
    assert(decodeVcard(good.replace("VERSION:4.0", "VERSION:9.9")
      .getBytes) === None)
    // truncation sweep: never a throw, never a plausible-wrong card
    val blob = good.getBytes("UTF-8")
    (1 until blob.length by 5).foreach(n => decodeVcard(blob.take(n)))
  }

  test("later cards contribute to the card count only") {
    val m = decodeVcard(encodeVcard("4.0", Seq(
      card("First", nE = 1, nT = 0),
      card("Second", nE = 4, nT = 4)))).get
    assert(m.fn === Some("First"))
    assert(m.nEmails === 1 && m.nTels === 0)
    assert(m.nCards === 2)
  }
}

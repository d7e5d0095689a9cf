package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Eml._

class EmlSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("multipart round-trip: B and Q subjects, QP body, base64 skipped") {
    checkProp(Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty),
        Gen.oneOf(true, false)) { (word, useB) =>
      val subject = s"Re: $word — naïve ü"
      val body = s"hello $word with = sign"
      val m = parseEmail(encodeMultipart("a@b.test", subject,
        "Mon, 1 Jan 2020 00:00:00 +0000", body, useB)).get
      m.from.contains("a@b.test") &&
        m.subject.contains(subject) &&
        m.contentType == "multipart/alternative" &&
        m.nParts == 2 &&
        m.textBody.contains(body + "soft-wrapped tail")
    })
  }

  test("jakarta-free referee: the JDK MimeDecoder agrees on our B subject") {
    // decode the B-encoded word with the JDK's own base64 and compare
    val blob = new String(encodeMultipart("a@b.test", "tëst", "d",
      "x", useB = true), "UTF-8")
    val line = blob.linesIterator.find(_.startsWith("Subject:")).get
    val payload = line.substring(line.indexOf("?B?") + 3,
      line.lastIndexOf("?="))
    assert(new String(java.util.Base64.getDecoder.decode(payload),
      "UTF-8") === "tëst")
  }

  test("encoded-word edge cases: adjacent words join, gap kept for " +
      "plain text, malformed stays literal") {
    assert(decodeEncodedWords("=?UTF-8?Q?a?= =?UTF-8?Q?b?=") === "ab")
    assert(decodeEncodedWords("plain =?UTF-8?Q?x?=") === "plain x")
    assert(decodeEncodedWords("=?bogus-charset?Q?x?=")
      === "=?bogus-charset?Q?x?=")
    assert(decodeEncodedWords("no words at all") === "no words at all")
    assert(decodeEncodedWords("=?UTF-8?Q?a_b?=") === "a b")
    assert(decodeEncodedWords("=?UTF-8?Q?=C3=A9?=") === "é")
  }

  test("quoted-printable: escapes, soft breaks CRLF and LF, hard error") {
    assert(decodeQuotedPrintable("a=3Db") === Some("a=b"))
    assert(decodeQuotedPrintable("line=\ncont") === Some("linecont"))
    assert(decodeQuotedPrintable("line=\r\ncont") === Some("linecont"))
    assert(decodeQuotedPrintable("=C3=A9") === Some("é"))
    assert(decodeQuotedPrintable("bad=Z9") === None)
  }

  test("folded headers unfold; repeated headers keep the first value") {
    val msg = ("From: a@b.test\nSubject: one\n two\nSubject: ignored\n" +
      "Date: d\n\nbody\n").getBytes("UTF-8")
    val m = parseEmail(msg).get
    assert(m.subject.contains("one two"))
    assert(m.textBody.contains("body"))
    assert(m.nParts === 1)
  }

  test("multipart without the closing boundary rejects; non-mail " +
      "bytes reject") {
    val good = new String(encodeMultipart("a@b.test", "s", "d", "b",
      useB = false), "UTF-8")
    val unclosed = good.replace("--b0undary42--", "--b0undary42")
    assert(parseEmail(unclosed.getBytes("UTF-8")) === None)
    assert(parseEmail(null) === None)
    assert(parseEmail("just some text\nno headers here".getBytes) === None)
    assert(parseEmail("Content-Type: text/plain\n\nbody".getBytes) === None)
    // truncation sweep
    val blob = good.getBytes("UTF-8")
    (1 until blob.length by 7).foreach(n => parseEmail(blob.take(n)))
  }

  test("boundary delimiters anchor at line starts (RFC 2046): mid-line " +
      "mentions and prefix-sharing sibling boundaries are content") {
    val msg = ("From: a@b.test\nSubject: s\nDate: d\n" +
      "Content-Type: multipart/mixed; boundary=\"b\"\n\n" +
      "preamble mentions --b inline\n" +
      "--b\nContent-Type: text/plain\n\n" +
      "first part\nmid-line --b stays content\n--bxx\nsibling kept\n" +
      "--b\nContent-Type: text/html\n\n<p>x</p>\n" +
      "--b--\n").getBytes("UTF-8")
    val m = parseEmail(msg).get
    assert(m.nParts === 2)
    assert(m.textBody.contains("first part\nmid-line --b stays " +
      "content\n--bxx\nsibling kept"))
  }

}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Http._

class HttpSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("response round-trip: status, headers, body — both plain " +
      "content-length and REAL chunked decoding") {
    checkProp(Prop.forAll(Gen.oneOf(200, 301, 404, 500),
        Gen.asciiPrintableStr, Gen.oneOf(true, false)) {
      (status, bodyStr, chunked) =>
        val body = bodyStr.getBytes("UTF-8")
        val blob = encodeResponse(status, "text/html; charset=utf-8",
          body, chunked)
        parseResponse(blob).exists { r =>
          r.status == status && r.body.sameElements(body) &&
            r.headers.get("content-type")
              .contains("text/html; charset=utf-8")
        }
    })
  }

  test("chunked bodies with CRLF and hex-digit content do not derail " +
      "the chunk walk; chunk extensions are tolerated") {
    val tricky = "ab\r\ncd0\r\n12ef".getBytes("ISO-8859-1")
    val blob = encodeResponse(200, "x/y", tricky, chunked = true)
    assert(parseResponse(blob).exists(_.body.sameElements(tricky)))
    // hand-built with a chunk extension after the size
    val ext = ("HTTP/1.1 200 X\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4;name=val\r\nabcd\r\n0\r\n\r\n").getBytes("ISO-8859-1")
    assert(parseResponse(ext).exists(r =>
      new String(r.body) == "abcd"))
  }

  test("malformed responses yield None: bad status line, truncated " +
      "chunk, over-declared content-length, missing header terminator") {
    val cases = Seq(
      "NOTHTTP 200 X\r\n\r\nbody",
      "HTTP/1.1 abc X\r\n\r\nbody",
      "HTTP/1.1 200 X\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nab",
      "HTTP/1.1 200 X\r\nTransfer-Encoding: chunked\r\n\r\nff\r\nshort",
      "HTTP/1.1 200 X\r\nContent-Length: 9999\r\n\r\nshort",
      "HTTP/1.1 200 X no terminator")
    cases.foreach { s =>
      assert(parseResponse(s.getBytes("ISO-8859-1")).isEmpty,
        s"expected None for: $s")
    }
    assert(parseResponse(null).isEmpty)
  }

  test("trailers after the zero chunk parse, verify, and gate " +
      "strictly (RFC 9112 trailer section)") {
    val body = "streamed payload".getBytes("ISO-8859-1")
    val blob = encodeResponse(200, "x/y", body, chunked = true,
      trailers = Seq("X-Digest" -> "abc123", "x-len" -> "16"))
    val r = parseResponse(blob).get
    assert(r.body.sameElements(body))
    assert(r.trailers == Map("x-digest" -> "abc123", "x-len" -> "16"))
    // the declaring Trailer header is emitted
    assert(r.headers.get("trailer").contains("X-Digest, x-len"))
    // no trailers -> empty map, same walk
    assert(parseResponse(encodeResponse(200, "x/y", body,
      chunked = true)).exists(_.trailers.isEmpty))
    // torn trailer sections are rejected: a non-field line, and a
    // section that never closes
    val torn = Seq(
      "HTTP/1.1 200 X\r\nTransfer-Encoding: chunked\r\n\r\n" +
        "4\r\nabcd\r\n0\r\nnotafield\r\n\r\n",
      "HTTP/1.1 200 X\r\nTransfer-Encoding: chunked\r\n\r\n" +
        "4\r\nabcd\r\n0\r\nx: 1\r\n")
    torn.foreach(t =>
      assert(parseResponse(t.getBytes("ISO-8859-1")).isEmpty,
        s"expected None for: $t"))
    // stray bytes after the closing CRLF are record-boundary slop, not
    // a reason to discard a verified body (real-capture tolerance)
    val padded = "HTTP/1.1 200 X\r\nTransfer-Encoding: chunked\r\n\r\n" +
      "4\r\nabcd\r\n0\r\nx: 1\r\n\r\n\r\n"
    assert(parseResponse(padded.getBytes("ISO-8859-1")).exists(r =>
      new String(r.body) == "abcd" && r.trailers == Map("x" -> "1")))
  }

  test("content-type and charset parameter parsing") {
    assert(contentType("text/HTML; charset=UTF-8").contains("text/html"))
    assert(charsetParam("text/html; charset=UTF-8").contains("utf-8"))
    assert(charsetParam("text/html; charset=\"ISO-8859-1\"")
      .contains("iso-8859-1"))
    assert(charsetParam("text/html").isEmpty)
    assert(contentType("").isEmpty)
    assert(charsetParam(null).isEmpty)
  }
}

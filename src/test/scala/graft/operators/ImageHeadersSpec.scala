package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import ImageHeaders._

class ImageHeadersSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("PNG round-trip: decode(encode(w,h,d)) recovers the header") {
    checkProp(Prop.forAll(Gen.choose(1, 65535), Gen.choose(1, 65535),
        Gen.oneOf(1, 2, 4, 8, 16)) { (w, h, d) =>
      val blob = encodePng(w, h, d, "payload".getBytes)
      decode(blob).contains(ImageMeta("png", w, h, d))
    })
  }

  test("PNG round-trip survives large u32 dimensions (sign trap)") {
    // width 0x7fffffff: the naive Int read stays positive, but a byte
    // with the high bit set inside the field would go negative without
    // the & 0xff masking — exercise a value with high bytes set
    val blob = encodePng(0x12f4c689, 0x0abcde1, 8, Array.emptyByteArray)
    assert(decode(blob).contains(ImageMeta("png", 0x12f4c689, 0x0abcde1, 8)))
  }

  test("JPEG round-trip: decode(encode(w,h,p)) recovers the header " +
      "across variable-length COM segments") {
    checkProp(Prop.forAll(Gen.choose(1, 65535), Gen.choose(1, 65535),
        Gen.choose(0, 200)) { (w, h, clen) =>
      val blob = encodeJpeg(w, h, 8, Array.fill(clen)('x'.toByte))
      decode(blob).contains(ImageMeta("jpeg", w, h, 8))
    })
  }

  test("JPEG comment containing 0xFF bytes does not derail the walk") {
    // segment payloads are skipped via the length field, never scanned
    val blob = encodeJpeg(640, 480, 8, Array.fill(16)(0xff.toByte))
    assert(decode(blob).contains(ImageMeta("jpeg", 640, 480, 8)))
  }

  test("JPEG fill bytes (0xFF padding before a marker) are tolerated") {
    val base = encodeJpeg(100, 50, 8, Array.emptyByteArray)
    // splice extra 0xFF fill bytes before the SOF0 marker
    val sofIdx = base.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    assert(sofIdx > 0)
    val padded = base.take(sofIdx) ++ Array.fill(3)(0xff.toByte) ++
      base.drop(sofIdx + 1) // keep the 0xFF already there
    assert(decode(padded).contains(ImageMeta("jpeg", 100, 50, 8)))
  }

  test("progressive SOF2 is recognized and labeled") {
    val base = encodeJpeg(32, 16, 12, Array.emptyByteArray)
    val sofIdx = base.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    base(sofIdx + 1) = 0xc2.toByte
    assert(decode(base).contains(ImageMeta("jpeg_progressive", 32, 16, 12)))
  }

  test("DHT (C4) is NOT mistaken for a SOF marker") {
    val base = encodeJpeg(32, 16, 8, Array.emptyByteArray)
    // forge a DHT segment where COM was: same length walk, different id
    val comIdx = base.indexOfSlice(Seq(0xff.toByte, 0xfe.toByte))
    base(comIdx + 1) = 0xc4.toByte
    assert(decode(base).contains(ImageMeta("jpeg", 32, 16, 8)))
  }

  test("malformed inputs decode to None, never throw") {
    val cases: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      Array[Byte](1, 2, 3),
      "plain text, definitely not an image".getBytes,
      Array[Byte](0xff.toByte, 0xd8.toByte), // bare SOI
      Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xd9.toByte), // SOI+EOI
      encodePng(10, 10, 8, Array.emptyByteArray).take(20), // truncated IHDR
      encodeJpeg(10, 10, 8, Array.emptyByteArray).take(7)) // truncated APP0
    cases.foreach { b =>
      assert(decode(b).isEmpty, s"expected None for ${b.length}-byte input")
    }
  }

  test("PNG with zero dimensions is rejected") {
    assert(decode(encodePng(0, 10, 8, Array.emptyByteArray)).isEmpty)
  }

  test("SOS before SOF (scan data with no frame header) is malformed") {
    val base = encodeJpeg(32, 16, 8, Array.emptyByteArray)
    val sofIdx = base.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    base(sofIdx + 1) = 0xda.toByte // SOF0 -> SOS
    assert(decode(base).isEmpty)
  }
}

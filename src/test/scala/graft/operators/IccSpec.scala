package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Icc._

class IccSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 80): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("multi-segment assembly round-trips across segment counts " +
      "(parts emitted in reverse stream order)") {
    checkProp(Prop.forAll(Gen.choose(0, 3), Gen.choose(1, 64),
        Gen.choose(1, 8)) { (intent, nTags, nSeg) =>
      val prof = encodeProfile("mntr", "RGB ", "XYZ ", intent, nTags)
      val jpeg = encodeJpegWithIcc(100, 50, prof, nSeg)
      decodeJpegIcc(jpeg).contains(IccProfile("mntr", "RGB ", "XYZ ",
        intent, prof.length.toLong, nTags, nSeg)) &&
        ImageHeaders.decode(jpeg).contains(
          ImageHeaders.ImageMeta("jpeg", 100, 50, 8))
    })
  }

  test("java.awt referee: ICC_Profile reads our assembled profile's " +
      "class and color space") {
    val prof = encodeProfile("mntr", "GRAY", "XYZ ", 1, 3)
    val p = java.awt.color.ICC_Profile.getInstance(prof)
    assert(p.getProfileClass === java.awt.color.ICC_Profile.CLASS_DISPLAY)
    assert(p.getColorSpaceType === java.awt.color.ColorSpace.TYPE_GRAY)
  }

  test("missing and duplicate sequence numbers reject") {
    val prof = encodeProfile("mntr", "RGB ", "XYZ ", 0, 2)
    val jpeg = encodeJpegWithIcc(10, 10, prof, 3)
    // locate the seq byte of the FIRST emitted part (seq=3 at stream
    // order first): APP2 starts at 2; seq at 2+4+12 = 18
    assert((jpeg(18) & 0xff) === 3)
    val missing = jpeg.clone
    missing(18) = 2 // now seq 2 appears twice, seq 3 never
    assert(decodeJpegIcc(missing) === None)
  }

  test("declared-vs-assembled size mismatch rejects") {
    val prof = encodeProfile("mntr", "RGB ", "XYZ ", 0, 2)
    prof(3) = (prof(3) ^ 1).toByte // perturb declared size
    assert(decodeJpegIcc(encodeJpegWithIcc(10, 10, prof, 2)) === None)
  }

  test("no ICC APP2, bad signature, and truncation yield None") {
    assert(decodeJpegIcc(ImageHeaders.encodeJpeg(10, 10, 8,
      Array.emptyByteArray)) === None)
    assert(decodeJpegIcc(null) === None)
    val prof = encodeProfile("mntr", "RGB ", "XYZ ", 0, 1)
    val noAcsp = prof.clone
    noAcsp(36) = 'x'
    assert(decodeJpegIcc(encodeJpegWithIcc(10, 10, noAcsp, 1)) === None)
    val good = encodeJpegWithIcc(10, 10, prof, 2)
    (1 until good.length by 5).foreach(n => decodeJpegIcc(good.take(n)))
  }
}

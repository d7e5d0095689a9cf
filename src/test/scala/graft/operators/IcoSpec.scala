package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class IcoSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def ramp(w: Int, h: Int, seed: Long): Array[Int] =
    Array.tabulate(w * h)(i => ((seed + i * 7) % 256).toInt)

  test("single PNG entry round-trips to exact pixels") {
    checkProp(Prop.forAll(Gen.choose(1, 80), Gen.choose(1, 80),
        Gen.choose(0L, 255L)) { (w, h, seed) =>
      val px = ramp(w, h, seed)
      val ico = Ico.encodeIco(Seq(
        Pixels.encodeGrayPng(w, h, px, Array.emptyByteArray)))
      Ico.decodeIco(ico).exists { img =>
        img.nEntries == 1 && img.entryFormat == "png" &&
          img.width == w && img.height == h && img.luma.sameElements(px)
      }
    })
  }

  test("single DIB entry round-trips: height un-doubled, AND mask ignored") {
    checkProp(Prop.forAll(Gen.choose(1, 80), Gen.choose(1, 80),
        Gen.choose(0L, 255L)) { (w, h, seed) =>
      val px = ramp(w, h, seed)
      val ico = Ico.encodeIco(Seq(Pixels.encodeGrayBmp(w, h, px)))
      Ico.decodeIco(ico).exists { img =>
        img.entryFormat == "dib" && img.width == w && img.height == h &&
          img.luma.sameElements(px)
      }
    })
  }

  test("largest entry wins regardless of directory order") {
    val small = Pixels.encodeGrayBmp(8, 8, Array.fill(64)(1))
    val big = Pixels.encodeGrayPng(32, 16, ramp(32, 16, 5L),
      Array.emptyByteArray)
    val tiny = Pixels.encodeGrayPng(4, 4, Array.fill(16)(9),
      Array.emptyByteArray)
    Seq(Seq(small, big, tiny), Seq(big, small, tiny),
      Seq(tiny, small, big)).foreach { order =>
      val img = Ico.decodeIco(Ico.encodeIco(order)).get
      assert(img.nEntries === 3)
      assert((img.width, img.height) === (32, 16))
      assert(img.entryFormat === "png")
      assert(img.luma.sameElements(ramp(32, 16, 5L)))
    }
  }

  test("256-pixel dims encode as the 0 byte and decode back") {
    val px = ramp(256, 31, 3L)
    val ico = Ico.encodeIco(Seq(
      Pixels.encodeGrayPng(256, 31, px, Array.emptyByteArray)))
    assert((ico(6) & 0xff) === 0) // width byte: 0 encodes 256
    assert((ico(7) & 0xff) === 31)
    val img = Ico.decodeIco(ico).get
    assert((img.width, img.height) === (256, 31))
    assert(img.luma.sameElements(px))
  }

  test("the pixel dispatcher routes ICO blobs") {
    val px = ramp(24, 16, 11L)
    val ico = Ico.encodeIco(Seq(
      Pixels.encodeGrayBmp(8, 8, Array.fill(64)(0)),
      Pixels.encodeGrayPng(24, 16, px, Array.emptyByteArray)))
    val (fmt, w, h, got) = Pixels.decodeImage(ico).get
    assert(fmt === "ico")
    assert((w, h) === (24, 16))
    assert(got.sameElements(px))
  }

  test("corrupt ICO yields None, never a throw") {
    assert(Ico.decodeIco(null) === None)
    assert(Ico.decodeIco(Array.emptyByteArray) === None)
    val good = Ico.encodeIco(Seq(
      Pixels.encodeGrayBmp(16, 12, ramp(16, 12, 2L))))
    // type must be 1 (icon, not a .cur cursor = 2)
    val cur = good.clone(); cur(2) = 2
    assert(Ico.decodeIco(cur) === None)
    // hostile entry offset past the buffer
    val badOff = good.clone()
    badOff(18) = 0xff.toByte; badOff(19) = 0xff.toByte
    badOff(20) = 0xff.toByte; badOff(21) = 0x7f.toByte
    assert(Ico.decodeIco(badOff) === None)
    // odd doubled height in the DIB (entry payload at 22, biHeight at +8)
    val oddH = good.clone()
    oddH(22 + 8) = 25 // was 24 (2×12)
    assert(Ico.decodeIco(oddH) === None)
    // truncation sweep
    (1 until good.length by 7).foreach(n => Ico.decodeIco(good.take(n)))
    assert(Ico.decodeIco(good.take(good.length / 2)) === None)
  }
}

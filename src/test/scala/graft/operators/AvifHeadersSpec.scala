package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import ImageHeaders.ImageMeta
import VideoHeaders._

class AvifHeadersSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("AVIF/HEIC round-trip across brands, depths, and note length") {
    checkProp(Prop.forAll(Gen.choose(1, 100000), Gen.choose(1, 100000),
        Gen.oneOf("avif" -> "avif", "heic" -> "heic", "mif1" -> "avif",
          "heix" -> "heic"),
        Gen.oneOf(8, 10, 12), Gen.choose(0, 300)) { (w, h, brands, d, nlen) =>
      val blob = encodeAvif(brands._1, w, h, d, Array.fill(nlen)('x'.toByte))
      decodeAvif(blob).contains(ImageMeta(brands._2, w, h, d))
    })
  }

  test("AVIF reaches the main image decode chain (dispatcher coverage)") {
    val blob = encodeAvif("avif", 640, 480, 8, "note".getBytes)
    assert(ImageHeaders.decode(blob).contains(ImageMeta("avif", 640, 480, 8)))
  }

  test("an MP4 (ftyp isom, moov) is NOT an AVIF, and vice versa") {
    val mp4 = encodeMp4("isom", 600, 5000L, 64, 48, 1, "n".getBytes)
    assert(decodeAvif(mp4) === None)
    val avif = encodeAvif("heic", 64, 48, 8, "n".getBytes)
    assert(decodeMp4(avif) === None)
  }

  test("note bytes containing a fake meta box do not derail the walk") {
    // the free box is hopped by declared size; a scanner would find the
    // planted 'meta' fourcc inside it
    val evil = Array[Byte](0, 0, 0, 16) ++ "meta".getBytes ++
      Array.fill(8)(0x7f.toByte)
    val blob = encodeAvif("avif", 33, 44, 8, evil)
    assert(decodeAvif(blob).contains(ImageMeta("avif", 33, 44, 8)))
  }

  test("malformed AVIF yields None, never a throw") {
    val good = encodeAvif("avif", 64, 32, 8, "pad".getBytes)
    assert(decodeAvif(null) === None)
    assert(decodeAvif(Array.emptyByteArray) === None)
    assert(decodeAvif(good.take(12)) === None)
    // unknown brand
    val badBrand = good.clone()
    System.arraycopy("zzzz".getBytes, 0, badBrand, 8, 4)
    assert(decodeAvif(badBrand) === None)
    // truncation sweep must never throw
    (1 until good.length by 5).foreach(n => decodeAvif(good.take(n)))
    // hostile declared meta size (u32 max) ends the walk cleanly
    val hostile = good.clone()
    val metaIdx = {
      var i = -1
      var p = 0
      while (i < 0 && p + 8 <= hostile.length) {
        if (new String(hostile, p + 4, 4, "US-ASCII") == "meta") i = p
        else p += 1
      }
      i
    }
    assert(metaIdx > 0)
    hostile(metaIdx) = 0xff.toByte; hostile(metaIdx + 1) = 0xff.toByte
    hostile(metaIdx + 2) = 0xff.toByte; hostile(metaIdx + 3) = 0xfe.toByte
    assert(decodeAvif(hostile) === None)
  }

  test("missing ispe (meta tree without dims) is malformed") {
    val good = encodeAvif("avif", 10, 10, 8, Array.emptyByteArray)
    // corrupt the ispe fourcc so the walk never sees dims
    val noIspe = good.clone()
    var p = 0
    var found = false
    while (!found && p + 8 <= noIspe.length) {
      if (new String(noIspe, p + 4, 4, "US-ASCII") == "ispe") {
        noIspe(p + 4) = 'x'.toByte; found = true
      } else p += 1
    }
    assert(found)
    assert(decodeAvif(noIspe) === None)
  }

  test("item resolution: pitm -> ipma -> ipco picks the PRIMARY " +
      "item's ispe past a thumbnail decoy; both pitm versions and " +
      "both ipma association widths") {
    checkProp(Prop.forAll(Gen.oneOf("avif", "heic"), Gen.choose(2, 9),
        Gen.oneOf(true, false), Gen.oneOf(true, false),
        Gen.choose(0L, 9999L)) { (brand, nItems, wp, wa, seed) =>
      val w = (16 + seed % 2000).toInt
      val h = (16 + (seed * 7) % 1200).toInt
      val blob = encodeAvifItems(brand, w, h,
        thumbW = 160, thumbH = 90, nItems, widePitm = wp,
        wideAssoc = wa)
      val fmt = if (brand == "heic") "heic" else "avif"
      decodeAvifItems(blob).contains(
        AvifItems(fmt, w.toLong, h.toLong, nItems, 3)) &&
        // the first-ispe sniff reads the DECOY here — exactly why the
        // item-resolving decoder exists
        decodeAvif(blob).exists(m => m.width == 160 || m.width == w)
    })
  }

  test("item-resolution strictness: missing pitm/ipma, out-of-range " +
      "property index, primary without an ispe, truncation") {
    val good = encodeAvifItems("avif", 800, 600, 160, 90, 3,
      widePitm = false, wideAssoc = false)
    assert(decodeAvifItems(good).isDefined)
    (1 until good.length by 3).foreach(n =>
      decodeAvifItems(good.take(n)))
    // surgically blank the pitm box type -> strict decode rejects
    val s = new String(good, "ISO-8859-1")
    def blank(tag: String): Array[Byte] = {
      val at = s.indexOf(tag)
      val c = good.clone
      c(at) = 'X'.toByte
      c
    }
    assert(decodeAvifItems(blank("pitm")) === None)
    assert(decodeAvifItems(blank("ipma")) === None)
    assert(decodeAvifItems(blank("iinf")) === None)
    // point the primary's first association past ipco's 3 properties:
    // the 0x83 byte (essential | index 3) follows "ipma"+ver+count+id+cnt
    val ipmaAt = s.indexOf("ipma")
    val bad = good.clone
    bad(ipmaAt + 4 + 4 + 4 + 2 + 1) = 0x87.toByte // index 7 of 3
    assert(decodeAvifItems(bad) === None)
  }
}

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

  test("JDK ImageIO agrees on PNG dimensions — an INDEPENDENT referee " +
      "(its reader parses the same IHDR our chunk walk does)") {
    // JPEG is referee'd by round-trip only: the JDK's JPEG reader
    // validates FULL file structure ("missing SOS marker") and rejects
    // our intentionally header-only streams, while its PNG reader
    // answers getWidth/getHeight from IHDR alone.
    def imageIoDims(b: Array[Byte]): Option[(Int, Int)] = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(b))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val r = readers.next()
          r.setInput(iis)
          try Some((r.getWidth(0), r.getHeight(0)))
          finally r.dispose()
        }
      } finally iis.close()
    }
    checkProp(Prop.forAll(Gen.choose(1, 4096), Gen.choose(1, 4096)) {
      (w, h) =>
        // scalacheck shrinking can step outside the generator's range
        (w < 1 || h < 1) || {
          val png = encodePng(w, h, 8, Array.fill(4)(0.toByte))
          imageIoDims(png).contains((w, h)) &&
            decode(png).contains(ImageMeta("png", w, h, 8))
        }
    }, n = 60)
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

  test("huge declared chunk length yields None, not an index crash " +
      "(Int-offset overflow)") {
    // non-IHDR first chunk declaring ~u32-max length: advancing by it
    // would wrap the Int offset negative and crash the walk un-guarded
    val b = new java.io.ByteArrayOutputStream()
    b.write(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte), 0, 8)
    b.write(Array(0x7f, 0xff, 0xff, 0xf0).map(_.toByte), 0, 4) // length
    b.write("tEXt".getBytes("US-ASCII"), 0, 4)
    b.write(Array.fill(16)(0x41.toByte), 0, 16)
    assert(decode(b.toByteArray).isEmpty)
  }

  test("GIF87a/89a logical-screen descriptor decodes (little-endian); " +
      "depth reads the COLOR-RESOLUTION bits, not the table exponent") {
    // hand-built: signature + w=321 (0x41,0x01) + h=65 (0x41,0x00) +
    // packed 0xF4 = 1111_0100: color resolution bits 4-6 = 111 -> 8
    // bits/primary, while the low table-exponent bits say 100 (5) —
    // a packed byte where the two fields DIFFER pins which one we read
    def gif(sig: String) = sig.getBytes("US-ASCII") ++
      Array[Byte](0x41, 0x01, 0x41, 0x00, 0xf4.toByte, 0, 0)
    assert(decode(gif("GIF89a")).contains(ImageMeta("gif", 321, 65, 8)))
    assert(decode(gif("GIF87a")).contains(ImageMeta("gif", 321, 65, 8)))
    assert(decode(gif("GIF88a")).isEmpty)
  }

  test("BMP BITMAPINFOHEADER decodes; top-down (negative height) " +
      "yields the magnitude") {
    def bmp(w: Int, h: Int, bits: Int): Array[Byte] = {
      val b = new Array[Byte](54)
      b(0) = 'B'; b(1) = 'M'
      def le32(i: Int, v: Int): Unit = {
        b(i) = (v & 0xff).toByte; b(i + 1) = ((v >> 8) & 0xff).toByte
        b(i + 2) = ((v >> 16) & 0xff).toByte
        b(i + 3) = ((v >> 24) & 0xff).toByte
      }
      le32(14, 40); le32(18, w); le32(22, h)
      b(28) = (bits & 0xff).toByte; b(29) = ((bits >> 8) & 0xff).toByte
      b
    }
    assert(decode(bmp(1920, 1080, 24))
      .contains(ImageMeta("bmp", 1920, 1080, 24)))
    assert(decode(bmp(640, -480, 32))
      .contains(ImageMeta("bmp", 640, 480, 32)))
    assert(decode(bmp(0, 480, 24)).isEmpty)
    // bit counts outside the BMP-legal set {1,4,8,16,24,32} are as
    // malformed as a zero dimension
    assert(decode(bmp(640, 480, 0)).isEmpty)
    assert(decode(bmp(640, 480, 7)).isEmpty)
    assert(decode(bmp(640, 480, 64)).isEmpty)
    assert(decode(bmp(640, 480, 1))
      .contains(ImageMeta("bmp", 640, 480, 1)))
  }

  test("encodeJpeg clamps an over-long COM payload instead of throwing " +
      "(a corpus-scale document must not fail the encode on an executor)") {
    val big = Array.fill(70000)('y'.toByte)
    val blob = encodeJpeg(320, 240, 8, big)
    // stream stays byte-valid and decodes; length = 45 + clamped COM
    assert(decode(blob).contains(ImageMeta("jpeg", 320, 240, 8)))
    assert(blob.length == 45 + MaxComBytes)
  }

  test("WEBP round-trip: all three variants recover dims across " +
      "variable-length hopped EXIF chunks incl. odd lengths (padding)") {
    val fmt = Map("vp8" -> "webp", "vp8l" -> "webp_lossless",
      "vp8x" -> "webp_extended")
    checkProp(Prop.forAll(Gen.oneOf("vp8", "vp8l", "vp8x"),
        Gen.choose(1, 16383), Gen.choose(1, 16383),
        Gen.choose(0, 99)) { (variant, w, h, noteLen) =>
      val blob = encodeWebp(variant, w, h, Array.fill(noteLen)('x'.toByte))
      decode(blob).contains(ImageMeta(fmt(variant), w, h, 8))
    })
  }

  test("WEBP VP8X carries 24-bit canvas dims beyond the 14-bit formats") {
    val blob = encodeWebp("vp8x", 100000, 65536, Array.emptyByteArray)
    assert(decode(blob)
      .contains(ImageMeta("webp_extended", 100000, 65536, 8)))
  }

  test("malformed WEBP decodes to None, never throws") {
    val good = encodeWebp("vp8", 320, 240, "note!".getBytes)
    val goodL = encodeWebp("vp8l", 320, 240, Array.emptyByteArray)
    def mut(b: Array[Byte])(f: Array[Byte] => Unit): Array[Byte] = {
      val c = b.clone; f(c); c
    }
    val vp8Idx = good.indexOfSlice("VP8 ".getBytes)
    val vp8lIdx = goodL.indexOfSlice("VP8L".getBytes)
    val cases: Seq[Array[Byte]] = Seq(
      good.take(11), // truncated container header
      good.take(vp8Idx + 9), // truncated image chunk
      mut(good)(b => b(11) = '2'.toByte), // RIFF but not WEBP
      mut(good)(b => b(vp8Idx + 11) = 0x00), // bad VP8 start code
      mut(goodL)(b => b(vp8lIdx + 8) = 0x30), // bad VP8L signature byte
      // VP8L version bits != 0 (set the top bit of the u32 bitfield)
      mut(goodL)(b => b(vp8lIdx + 12) =
        (b(vp8lIdx + 12) | 0x80).toByte),
      // hostile declared EXIF size near u32 max: Long-math hop must
      // end the walk cleanly, not overflow into an index crash
      mut(good) { b =>
        val e = b.indexOfSlice("EXIF".getBytes)
        b(e + 4) = 0xf0.toByte; b(e + 5) = 0xff.toByte
        b(e + 6) = 0xff.toByte; b(e + 7) = 0x7f.toByte
      })
    cases.foreach { b =>
      assert(decodeWebp(b).isEmpty,
        s"expected None for ${b.length}-byte mutant")
    }
    // a container with ONLY metadata chunks (no image chunk) is None
    val noImg = good.take(vp8Idx)
    assert(decodeWebp(noImg).isEmpty)
  }

  test("SOS before SOF (scan data with no frame header) is malformed") {
    val base = encodeJpeg(32, 16, 8, Array.emptyByteArray)
    val sofIdx = base.indexOfSlice(Seq(0xff.toByte, 0xc0.toByte))
    base(sofIdx + 1) = 0xda.toByte // SOF0 -> SOS
    assert(decode(base).isEmpty)
  }

  // ----- WebP VP8X EXIF/XMP metadata (round 14) -------------------------

  test("VP8X EXIF round-trips with and without the Exif prefix; XMP " +
      "comes back verbatim; the plain sniff reads canvas dims") {
    Seq(true, false).foreach { prefix =>
      val blob = encodeWebpExif(640, 360, 6, "CamQ", bigEndian = prefix,
        exifPrefix = prefix, xmp = "<x:xmpmeta>hi</x:xmpmeta>")
      val (exif, xmp) = decodeWebpMeta(blob).get
      assert(exif.contains(TiffHeaders.ExifMeta(6, Some("CamQ"))))
      assert(xmp.contains("<x:xmpmeta>hi</x:xmpmeta>"))
      assert(decode(blob).contains(ImageMeta("webp_extended", 640, 360, 8)))
    }
  }

  test("VP8X without the XMP flag bit ignores an XMP chunk (flag gate)") {
    val blob = encodeWebpExif(100, 50, 2, "CamQ", bigEndian = false,
      exifPrefix = false, xmp = "gated")
    // clear the XMP flag (0x04) in the VP8X payload byte at offset 20
    blob(20) = (blob(20) & ~0x04).toByte
    val (exif, xmp) = decodeWebpMeta(blob).get
    assert(exif.nonEmpty)
    assert(xmp === None)
  }

  test("flagged-but-corrupt EXIF chunk rejects the stream") {
    val blob = encodeWebpExif(100, 50, 2, "CamQ", bigEndian = false,
      exifPrefix = false, xmp = "")
    // EXIF payload (bare TIFF) starts after RIFF 12 + VP8X 18 + hdr 8
    blob(38) = 'X'; blob(39) = 'X' // destroy the byte-order mark
    assert(decodeWebpMeta(blob) === None)
  }

  test("plain (non-extended) WebP and truncated streams yield None") {
    assert(decodeWebpMeta(encodeWebp("vp8l", 10, 10,
      Array.emptyByteArray)) === None)
    val blob = encodeWebpExif(64, 64, 1, "CamQ", bigEndian = true,
      exifPrefix = true, xmp = "x")
    (1 until blob.length by 5).foreach(n => decodeWebpMeta(blob.take(n)))
    assert(decodeWebpMeta(blob.take(blob.length - 3)) === None)
    assert(decodeWebpMeta(null) === None)
  }

  test("a VP8X declaring a size other than the spec-fixed 10 rejects " +
      "(a hard-coded hop would desync the chunk walk)") {
    val blob = encodeWebpExif(64, 64, 1, "CamQ", bigEndian = false,
      exifPrefix = false, xmp = "")
    val patched = blob.clone
    patched(16) = 12 // declared VP8X payload size 12 (LE u32 at 16)
    assert(decodeWebpMeta(patched) === None)
  }

}

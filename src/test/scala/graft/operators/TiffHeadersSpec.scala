package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import ImageHeaders.ImageMeta
import TiffHeaders._

class TiffHeadersSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("TIFF round-trip across endianness, samples, and note length") {
    checkProp(Prop.forAll(Gen.choose(1, 100000), Gen.choose(1, 100000),
        Gen.oneOf(1, 8, 16), Gen.oneOf(1, 3), Gen.oneOf(true, false),
        Gen.choose(0, 300)) { (w, h, bits, samples, be, nlen) =>
      val blob = encodeTiff(w, h, bits, samples, be, Array.fill(nlen)('x'.toByte))
      decodeTiff(blob).contains(ImageMeta("tiff", w, h, bits))
    })
  }

  test("TIFF reaches the main decode chain (dispatcher coverage)") {
    val blob = encodeTiff(640, 480, 8, 3, bigEndian = true,
      "note".getBytes)
    assert(ImageHeaders.decode(blob).contains(ImageMeta("tiff", 640, 480, 8)))
  }

  test("offset-valued BitsPerSample (count 3) is followed, not read inline") {
    // samples=3 stores the three SHORTs past the IFD; an inline read
    // would see the offset's low bytes instead of the bit depth
    val blob = encodeTiff(10, 10, 16, 3, bigEndian = false, Array.emptyByteArray)
    assert(decodeTiff(blob).contains(ImageMeta("tiff", 10, 10, 16)))
  }

  test("note bytes containing II/MM magic do not derail the IFD jump") {
    // the IFD offset must JUMP the note; a scanner would find the fake
    // magic inside it
    val evil = ("II*\u0000garbageMM\u0000*more").getBytes("ISO-8859-1")
    val blob = encodeTiff(33, 44, 8, 1, bigEndian = true, evil)
    assert(decodeTiff(blob).contains(ImageMeta("tiff", 33, 44, 8)))
  }

  test("malformed TIFF yields None, never a throw") {
    val good = encodeTiff(64, 32, 8, 3, bigEndian = false, "pad".getBytes)
    assert(decodeTiff(null) === None)
    assert(decodeTiff(Array.emptyByteArray) === None)
    assert(decodeTiff("II".getBytes) === None)
    assert(decodeTiff("XX\u0000*....".getBytes("ISO-8859-1")) === None)
    // magic not 42
    val badMagic = good.clone(); badMagic(2) = 7
    assert(decodeTiff(badMagic) === None)
    // IFD offset beyond the buffer
    val badOff = good.clone()
    badOff(4) = 0xff.toByte; badOff(5) = 0xff.toByte
    badOff(6) = 0xff.toByte; badOff(7) = 0x7f.toByte
    assert(decodeTiff(badOff) === None)
    // truncated mid-IFD
    assert(decodeTiff(good.take(good.length - 20)) === None)
    // hostile value offset near u32 max must not Int-overflow
    val hostile = encodeTiff(10, 10, 8, 3, bigEndian = true, Array.emptyByteArray)
    // entry 3 (BitsPerSample) value field: ifd at 8, entries at 10,
    // third entry's value at 10 + 2*12 + 8 = 42
    hostile(42) = 0xff.toByte; hostile(43) = 0xff.toByte
    hostile(44) = 0xff.toByte; hostile(45) = 0xfe.toByte
    assert(decodeTiff(hostile) === None)
  }

  test("BitsPerSample absent defaults to 1 (TIFF 6.0 optional tag — " +
      "bilevel fax/scan TIFFs omit it)") {
    // disable entry 3 (tag 258) by renaming it to an ignored tag id:
    // LE blob, empty note → IFD at 8, entry 3's tag bytes at 8+2+24
    val blob = encodeTiff(64, 32, 8, 1, bigEndian = false,
      Array.emptyByteArray)
    blob(34) = 0x0f; blob(35) = 0x27 // tag 9999
    assert(decodeTiff(blob).contains(ImageMeta("tiff", 64, 32, 1)))
  }

  test("zero-dimension TIFF is malformed") {
    // the emitter refuses w=0, so build by patching a valid stream
    val blob = encodeTiff(1, 10, 8, 1, bigEndian = true, Array.emptyByteArray)
    // ImageWidth LONG value: ifd at 8, first entry's value at 8+2+8 = 18
    blob(18) = 0; blob(19) = 0; blob(20) = 0; blob(21) = 0
    assert(decodeTiff(blob) === None)
  }

  test("JDK ImageIO referee: independent reader agrees on TIFF dims") {
    // Java 9+ ships a TIFF ImageReader; it reads dims from the same IFD
    val blob = encodeTiff(321, 123, 8, 3, bigEndian = false,
      "payload".getBytes)
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(blob))
    val readers = javax.imageio.ImageIO.getImageReaders(in)
    assert(readers.hasNext, "JDK TIFF reader expected on Java 17")
    val r = readers.next()
    r.setInput(in)
    assert(r.getWidth(0) === 321)
    assert(r.getHeight(0) === 123)
    r.dispose(); in.close()
  }

  test("EXIF round-trip across endianness, orientation, and comment") {
    checkProp(Prop.forAll(Gen.choose(1, 65535), Gen.choose(1, 65535),
        Gen.choose(1, 8), Gen.oneOf(true, false),
        Gen.choose(0, 200)) { (w, h, orient, be, clen) =>
      val blob = encodeJpegExif(w, h, orient, "TestCam", be,
        Array.fill(clen)('y'.toByte))
      decodeJpegExif(blob).contains(ExifMeta(orient, Some("TestCam"))) &&
        ImageHeaders.decode(blob).contains(ImageMeta("jpeg", w, h, 8))
    })
  }

  test("inline ASCII Make (count ≤ 4 fits the value field) round-trips") {
    // 'abc' + NUL = count 4: per spec the value sits INLINE in the
    // entry's 4-byte field, the other value encoding than 'TestCam'
    val blob = encodeJpegExif(10, 10, 3, "abc", bigEndian = false,
      Array.emptyByteArray)
    assert(decodeJpegExif(blob).contains(ExifMeta(3, Some("abc"))))
    val be = encodeJpegExif(10, 10, 3, "ab", bigEndian = true,
      Array.emptyByteArray)
    assert(decodeJpegExif(be).contains(ExifMeta(3, Some("ab"))))
  }

  test("JPEG without an EXIF APP1 yields None (plain APP0 stream)") {
    val plain = ImageHeaders.encodeJpeg(100, 50, 8, "comment".getBytes)
    assert(decodeJpegExif(plain) === None)
    assert(decodeJpegExif(null) === None)
    assert(decodeJpegExif("nota jpeg".getBytes) === None)
  }

  test("EXIF with orientation out of 1..8 is malformed") {
    val blob = encodeJpegExif(10, 10, 8, "Cam0", bigEndian = false,
      Array.emptyByteArray)
    // orientation SHORT sits in the 274 entry's value field; find it by
    // patching: LE stream, IFD at tiff offset 8, entry 2 value at
    // 8 + 2 + 12 + 8 = 30 within the TIFF, TIFF starts at byte 12
    blob(12 + 30) = 9
    assert(decodeJpegExif(blob) === None)
  }

  test("truncated EXIF APP1 yields None, never a throw") {
    val blob = encodeJpegExif(10, 10, 1, "CamX", bigEndian = true,
      Array.fill(50)('z'.toByte))
    (1 to blob.length - 1 by 7).foreach { n =>
      decodeJpegExif(blob.take(n)) // must not throw
    }
    assert(decodeJpegExif(blob.take(20)) === None)
  }

  // ----- GPS sub-IFD + IFD1 thumbnail (round 14) ----------------------

  private def gpsBlob(orient: Int = 3, be: Boolean = false,
      latRef: Char = 'N', latDeg: Long = 48, latMin: Long = 51,
      latSecNum: Long = 2957, latSecDen: Long = 100,
      lonRef: Char = 'E', lonDeg: Long = 2, lonMin: Long = 17,
      lonSecNum: Long = 4512, lonSecDen: Long = 100,
      thumbW: Int = 32, thumbH: Int = 24, thumbComment: Int = 7): Array[Byte] =
    encodeJpegExifGps(640, 480, orient, "CamX", be,
      latRef, latDeg, latMin, latSecNum, latSecDen,
      lonRef, lonDeg, lonMin, lonSecNum, lonSecDen,
      ImageHeaders.encodeJpeg(thumbW, thumbH, 8,
        Array.fill(thumbComment)('t'.toByte)))

  test("GPS + thumbnail round-trip across endianness and values") {
    checkProp(Prop.forAll(Gen.choose(1, 8), Gen.oneOf(true, false),
        Gen.oneOf('N', 'S'), Gen.choose(0L, 89L), Gen.choose(0L, 59L),
        Gen.choose(0L, 5999L), Gen.oneOf('E', 'W'), Gen.choose(0L, 179L)) {
      (orient, be, latRef, latDeg, latMin, latSec, lonRef, lonDeg) =>
        val blob = gpsBlob(orient, be, latRef, latDeg, latMin, latSec, 100,
          lonRef, lonDeg, 13, 999, 100)
        decodeJpegExifFull(blob).exists { e =>
          e.orientation == orient && e.make.contains("CamX") &&
            e.lat.contains(GpsCoord(latRef.toString,
              latDeg, 1, latMin, 1, latSec, 100)) &&
            e.lon.contains(GpsCoord(lonRef.toString,
              lonDeg, 1, 13, 1, 999, 100))
        }
    })
  }

  test("IFD1 thumbnail slices out as a decodable JPEG; length formulas hold") {
    val blob = gpsBlob(thumbW = 48, thumbH = 20, thumbComment = 11)
    val e = decodeJpegExifFull(blob).get
    val thumb = e.thumbnail.get
    assert(thumb.length === 45 + 11) // SOI+APP0+COM(4+c)+SOF0+EOI
    assert(ImageHeaders.decode(thumb).contains(ImageMeta("jpeg", 48, 20, 8)))
    // full-stream formula replayed by the q378 oracle (make 'CamX' = 4 chars)
    assert(blob.length === 265 + 11)
    // the host stream itself still decodes as a plain JPEG
    assert(ImageHeaders.decode(blob).contains(ImageMeta("jpeg", 640, 480, 8)))
  }

  test("signed decimal degrees: S/W negate, identical op order to oracle") {
    val e = decodeJpegExifFull(gpsBlob(latRef = 'S', latDeg = 33,
      latMin = 52, latSecNum = 412, latSecDen = 100,
      lonRef = 'W', lonDeg = 151, lonMin = 12, lonSecNum = 5700,
      lonSecDen = 100)).get
    val lat = e.lat.get
    assert(lat.signedDecimalDegrees ===
      -(33.0 + 52.0 / 60.0 + 412.0 / 100.0 / 3600.0))
    assert(e.lon.get.signedDecimalDegrees ===
      -(151.0 + 12.0 / 60.0 + 5700.0 / 100.0 / 3600.0))
  }

  test("legacy decodeJpegExif still reads orientation/make from GPS streams") {
    assert(decodeJpegExif(gpsBlob(orient = 6, be = true))
      .contains(ExifMeta(6, Some("CamX"))))
  }

  test("half-present GPS block yields None for that axis, not a guess") {
    // rename the GPSLatitudeRef tag (1 -> 99): latitude loses its ref,
    // longitude must still parse. LE stream: TIFF at 12, IFD0 at 8
    // (3 entries, 42 B), make at 50 (5 B), GPS IFD at 55; first GPS
    // entry tag bytes at TIFF-relative 55+2 = 57
    val blob = gpsBlob(be = false)
    assert(blob(12 + 57) === 1.toByte)
    blob(12 + 57) = 99
    val e = decodeJpegExifFull(blob).get
    assert(e.lat === None)
    assert(e.lon.isDefined)
  }

  test("zero GPS denominator rejects the coordinate") {
    // LE: lat rationals at TIFF-relative 55+54 = 109; first pair's
    // denominator at 109+4
    val blob = gpsBlob(be = false)
    var i = 0
    while (i < 4) { blob(12 + 109 + 4 + i) = 0; i += 1 }
    val e = decodeJpegExifFull(blob).get
    assert(e.lat === None)
    assert(e.lon.isDefined)
  }

  test("hostile thumbnail offset/length yields no thumbnail, no throw") {
    // LE: IFD1 at TIFF-relative 55+54+48 = 157; entry 513's value field
    // at 157+2+8 = 167 — point it past the buffer
    val blob = gpsBlob(be = false)
    blob(12 + 167) = 0xff.toByte; blob(12 + 168) = 0xff.toByte
    blob(12 + 169) = 0xff.toByte; blob(12 + 170) = 0x7f.toByte
    val e = decodeJpegExifFull(blob).get
    assert(e.thumbnail === None)
    assert(e.lat.isDefined) // the rest of the walk is unaffected
  }

  test("truncated GPS/thumbnail stream never throws") {
    val blob = gpsBlob()
    (1 until blob.length by 5).foreach { n =>
      decodeJpegExifFull(blob.take(n)) // must not throw
    }
  }

  test("Exif sub-IFD timestamp round-trips across endianness and lengths") {
    checkProp(Prop.forAll(Gen.choose(1, 8), Gen.oneOf(true, false),
        Gen.choose(0, 999), Gen.choose(1990, 2024)) { (orient, be, ss, yr) =>
      val dt = f"$yr:07:15 12:34:56"
      val blob = encodeJpegExifDated(320, 240, orient, "CamT", be, dt, s"$ss")
      decodeJpegExifFull(blob).exists { e =>
        e.orientation == orient && e.make.contains("CamT") &&
          e.dateTimeOriginal.contains(dt) &&
          e.subSecOriginal.contains(s"$ss") &&
          e.lat.isEmpty && e.thumbnail.isEmpty
      }
    })
  }

  test("dated stream length formula: 138 for a 4-char make") {
    val blob = encodeJpegExifDated(10, 10, 1, "CamX", bigEndian = false,
      "2011:01:02 03:04:05", "7")
    assert(blob.length === 138)
    assert(ImageHeaders.decode(blob).contains(ImageMeta("jpeg", 10, 10, 8)))
  }

  test("malformed Exif sub-IFD drops the timestamp, not the stream") {
    // LE: TIFF at 12; IFD0 entry 3 (0x8769) value field at 8+2+2*12+8=42;
    // point the sub-IFD pointer past the buffer
    val blob = encodeJpegExifDated(10, 10, 3, "CamX", bigEndian = false,
      "2011:01:02 03:04:05", "42")
    blob(12 + 42) = 0xff.toByte; blob(12 + 43) = 0xff.toByte
    blob(12 + 44) = 0xff.toByte; blob(12 + 45) = 0x7f.toByte
    val e = decodeJpegExifFull(blob).get
    assert(e.dateTimeOriginal === None && e.subSecOriginal === None)
    assert(e.orientation === 3 && e.make.contains("CamX"))
  }

  test("truncated dated stream never throws") {
    val blob = encodeJpegExifDated(10, 10, 1, "CamX", bigEndian = true,
      "1999:12:31 23:59:59", "999")
    (1 until blob.length by 5).foreach(n => decodeJpegExifFull(blob.take(n)))
  }

  test("stream without GPS or IFD1 decodes Full with empty options") {
    val plain = encodeJpegExif(10, 10, 5, "CamY", bigEndian = true,
      Array.emptyByteArray)
    val e = decodeJpegExifFull(plain).get
    assert(e.orientation === 5)
    assert(e.make.contains("CamY"))
    assert(e.lat === None && e.lon === None && e.thumbnail === None)
  }
}

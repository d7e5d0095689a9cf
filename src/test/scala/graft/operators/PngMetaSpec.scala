package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import PngMeta._

class PngMetaSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def basePng(seed: Long = 1L): Array[Byte] =
    Pixels.encodeGrayPng(16, 12,
      Array.tabulate(192)(i => ((seed + i * 7) % 256).toInt),
      Array.emptyByteArray)

  test("all four chunk kinds round-trip; pixel decode is undisturbed") {
    checkProp(Prop.forAll(Gen.alphaNumStr.suchThat(s =>
        s.nonEmpty && s.length <= 60), Gen.choose(1, 8),
        Gen.oneOf(true, false), Gen.choose(0L, 255L)) {
      (value, orient, compressed, seed) =>
        val png = basePng(seed)
        val blob = withChunks(png, Seq(
          textChunk("Title", value),
          ztxtChunk("Description", value * 3),
          itxtChunk("Comment", s"ü$value — é", "en-US", compressed),
          exifChunk(orient, "CamZ", bigEndian = compressed)))
        val m = decodePngMeta(blob).get
        m.texts.map(t => (t.keyword, t.value, t.kind)).containsSlice(Seq(
          ("Title", value, "text"),
          ("Description", value * 3, "ztxt"),
          ("Comment", s"ü$value — é", "itxt"))) &&
          m.texts.find(_.kind == "itxt").exists(_.lang == "en-US") &&
          m.exif.contains(TiffHeaders.ExifMeta(orient, Some("CamZ"))) &&
          Pixels.decodeGrayPng(blob).exists { case (w, h, px) =>
            w == 16 && h == 12 &&
              px.sameElements(Pixels.decodeGrayPng(png).get._3)
          }
    })
  }

  test("base encoder emits exactly 4 chunks (IHDR, tEXt, IDAT, IEND) — " +
      "the q382 count anchor") {
    val m = decodePngMeta(basePng()).get
    assert(m.nChunks === 4)
    assert(m.texts === Seq(PngText("Comment", "", "text", "")))
    assert(m.exif === None)
  }

  test("corrupted CRC on a consumed chunk rejects the stream") {
    val blob = withChunks(basePng(), Seq(textChunk("Title", "x")))
    assert(decodePngMeta(blob).nonEmpty)
    // the spliced tEXt sits right before the 12-byte IEND; flip a
    // payload byte without updating its CRC
    blob(blob.length - 12 - 2) = (blob(blob.length - 12 - 2) ^ 1).toByte
    assert(decodePngMeta(blob) === None)
  }

  // a structurally complete chunk with the given type and payload,
  // valid CRC — for planting payloads the decoders must reject
  private def rawChunk(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def w32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    val t = typ.getBytes("US-ASCII")
    val crc = new java.util.zip.CRC32()
    crc.update(t); crc.update(payload)
    w32(payload.length.toLong); out.write(t); out.write(payload)
    w32(crc.getValue)
    out.toByteArray
  }

  test("truncated zTXt deflate stream rejects; empty/overlong keywords reject") {
    val okZ = ztxtChunk("D", "value")
    // keep "D", 0, method 0 + only 3 deflate bytes, re-CRC'd
    val truncated = rawChunk("zTXt", okZ.slice(8, okZ.length - 4).take(6))
    assert(decodePngMeta(withChunks(basePng(), Seq(truncated))) === None)
    // keyword rules: empty and >79 bytes are both invalid per spec
    assert(decodePngMeta(withChunks(basePng(),
      Seq(textChunk("", "v")))) === None)
    assert(decodePngMeta(withChunks(basePng(),
      Seq(textChunk("k" * 80, "v")))) === None)
  }

  test("corrupt eXIf TIFF rejects the stream") {
    val bad = rawChunk("eXIf", "XXXXXXXX".getBytes("US-ASCII"))
    assert(decodePngMeta(withChunks(basePng(), Seq(bad))) === None)
  }

  test("truncated stream (no IEND) yields None, never a throw") {
    val blob = withChunks(basePng(), Seq(textChunk("Title", "value")))
    (1 until blob.length by 5).foreach(n => decodePngMeta(blob.take(n)))
    assert(decodePngMeta(blob.take(blob.length - 1)) === None)
    assert(decodePngMeta(null) === None)
    assert(decodePngMeta("not png".getBytes) === None)
  }
}

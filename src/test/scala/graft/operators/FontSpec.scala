package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Font._

class FontSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 80): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("sfnt round-trip across containers, names, glyphs, upem") {
    checkProp(Prop.forAll(Gen.oneOf("ttf", "otf"),
        Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(40)),
        Gen.oneOf("Regular", "Bold", "Italic éß"),
        Gen.choose(0, 65535), Gen.choose(16, 16384)) {
      (c, fam, sub, glyphs, upem) =>
        val blob = encodeSfnt(c, fam, sub, glyphs, upem)
        decodeFont(blob).contains(
          FontMeta(c, Some(fam), Some(sub), 3, Some(glyphs), Some(upem)))
    })
  }

  test("woff round-trip with a compressed name table, both flavors") {
    checkProp(Prop.forAll(Gen.oneOf("ttf", "otf"),
        Gen.alphaNumStr.suchThat(_.nonEmpty).map(_.take(40)),
        Gen.choose(0, 65535), Gen.choose(16, 16384)) {
      (fl, fam, glyphs, upem) =>
        val blob = encodeWoff(fl, fam, "Regular", glyphs, upem)
        decodeFont(blob).contains(FontMeta("woff", Some(fam),
          Some("Regular"), 3, Some(glyphs), Some(upem)))
    })
  }

  test("the Windows-Unicode name record wins over a differing Mac one " +
      "even when the Mac record comes first") {
    val blob = encodeSfnt("ttf", "RealFamily", "Regular", 5, 1000,
      macFamily = Some("LegacyMacName"))
    assert(decodeFont(blob).get.family === Some("RealFamily"))
  }

  test("non-Latin family names survive the UTF-16BE path") {
    val blob = encodeSfnt("otf", "思源黑体", "Regular", 9, 1000)
    assert(decodeFont(blob).get.family === Some("思源黑体"))
  }

  test("malformed fonts yield None, never a throw") {
    val good = encodeSfnt("ttf", "F", "Regular", 7, 2048)
    assert(decodeFont(null) === None)
    assert(decodeFont(Array.emptyByteArray) === None)
    assert(decodeFont("not a font at all".getBytes) === None)
    (1 until good.length by 3).foreach(n => decodeFont(good.take(n)))
    // head magic flipped -> corrupt table rejects the file
    val headOff = 12 + 16 * 3 // first table data (tags sorted: head)
    val bad = good.clone
    bad(headOff + 12) = 0x00
    assert(decodeFont(bad) === None)
    // a table whose declared extent overruns the file
    val over = good.clone
    over(12 + 12) = 0x7f // head length high byte
    assert(decodeFont(over) === None)
  }

  test("woff structural checks: total length, reserved field, " +
      "inflate-to-origLength") {
    val good = encodeWoff("ttf", "Fam", "Regular", 3, 1000)
    (1 until good.length by 3).foreach(n => decodeFont(good.take(n)))
    assert(decodeFont(good.take(good.length - 1)) === None) // length
    val resv = good.clone; resv(14) = 1
    assert(decodeFont(resv) === None)
    // corrupt the compressed name payload -> inflate fails -> None
    val nameDirOff = 44 + 20 * 2 // third entry (head, maxp, name)
    val nameOff = ((good(nameDirOff + 4) & 0xff) << 24) |
      ((good(nameDirOff + 5) & 0xff) << 16) |
      ((good(nameDirOff + 6) & 0xff) << 8) | (good(nameDirOff + 7) & 0xff)
    val tear = good.clone
    tear(nameOff + 2) = (tear(nameOff + 2) ^ 0x55).toByte
    assert(decodeFont(tear) === None)
  }

  test("a font without a name table degrades per-field, not to None") {
    // re-assemble a 2-table (head+maxp) sfnt from the emitter's output
    val full = encodeSfnt("ttf", "F", "R", 4, 1000)
    def u32(i: Int): Int = ((full(i) & 0xff) << 24) |
      ((full(i + 1) & 0xff) << 16) | ((full(i + 2) & 0xff) << 8) |
      (full(i + 3) & 0xff)
    // directory entries at 12 (head), 28 (maxp): [tag, csum, off, len]
    val slices = Seq(12, 28).map { r =>
      (new String(full, r, 4, "ISO-8859-1"),
        full.slice(u32(r + 8), u32(r + 8) + u32(r + 12)))
    }
    val bos = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { bos.write((v >> 8) & 0xff); bos.write(v & 0xff) }
    def w32o(v: Int): Unit = { w16(v >>> 16); w16(v & 0xffff) }
    w32o(0x00010000)
    w16(2); w16(32); w16(1); w16(0)
    var off = 12 + 16 * 2
    slices.foreach { case (tag, data) =>
      bos.write(tag.getBytes("ISO-8859-1"), 0, 4)
      w32o(0); w32o(off); w32o(data.length)
      off += (data.length + 3) & ~3
    }
    slices.foreach { case (_, data) =>
      bos.write(data, 0, data.length)
      (data.length until ((data.length + 3) & ~3)).foreach(_ => bos.write(0))
    }
    val meta = decodeFont(bos.toByteArray).get
    assert(meta === FontMeta("ttf", None, None, 2, Some(4), Some(1000)))
  }
  test("woff2 directory sniff: known-index and arbitrary tags, " +
      "UIntBase128 lengths, transformed glyf/loca, summed sizes") {
    checkProp(Prop.forAll(Gen.oneOf("ttf", "otf"),
        Gen.choose(0L, 300000L), Gen.choose(0, 500)) {
      (fl, big, block) =>
        val tables = Seq(("head", 54L), ("glyf", big), ("loca", 40L),
          ("Xyz1", 7L)) // Xyz1 exercises the arbitrary-tag escape
        val m = decodeWoff2(encodeWoff2(fl, tables, block)).get
        m.flavor == fl && m.nTables == 4 &&
          m.sumOrigLengths == 54L + big + 40L + 7L &&
          m.tags == Seq("head", "glyf", "loca", "Xyz1")
    })
  }

  test("woff2 strictness: leading-zero UIntBase128, reserved field, " +
      "declared length, truncation") {
    val good = encodeWoff2("ttf", Seq(("head", 54L), ("name", 99L)), 64)
    assert(decodeWoff2(good).isDefined)
    assert(decodeWoff2(good.take(good.length - 1)) === None)
    val resv = good.clone; resv(14) = 1
    assert(decodeWoff2(resv) === None)
    // inject a leading 0x80 base128 byte into the first length
    val bad = good.clone
    // directory starts at 48: flags byte for 'head' (index 1), then
    // the length byte 54 -> overwrite with 0x80,0x36 is longer; easier:
    // flip the length byte to 0x80 (leading zero, continuation) and
    // the parse must reject rather than read a padded value
    bad(49) = 0x80.toByte
    assert(decodeWoff2(bad) === None)
    (1 until good.length by 3).foreach(n => decodeWoff2(good.take(n)))
    assert(decodeWoff2(null) === None)
    // the dispatcher routes woff2
    assert(Multimodal.sniffContent(good) === (("font_woff2", Some(2L))))
  }

  test("woff2 FULL decode: family strings through the Brotli block, " +
      "both flavors, both stream forms, Windows-record preference") {
    checkProp(Prop.forAll(Gen.oneOf("ttf", "otf"), Gen.alphaNumStr,
        Gen.choose(1, 60000), Gen.choose(16, 16384),
        Gen.oneOf(true, false)) { (fl, fam0, glyphs, upem, fixed) =>
      val fam = s"F $fam0"
      val blob = encodeWoff2Font(fl, fam, "Bold", glyphs, upem, fixed,
        macFamily = Some("MAC DECOY"))
      decodeFont(blob).contains(FontMeta("woff2", Some(fam),
        Some("Bold"), 3, Some(glyphs), Some(upem))) &&
        decodeWoff2Font(blob).contains(FontMeta("woff2", Some(fam),
          Some("Bold"), 3, Some(glyphs), Some(upem)))
    })
  }

  test("woff2 full-decode strictness: block-length mismatch, torn " +
      "Brotli stream, truncation — None, never a throw") {
    val good = encodeWoff2Font("ttf", "Fam", "Regular", 12, 1000,
      fixedHuffman = true)
    assert(decodeWoff2Font(good).isDefined)
    // flipped bytes inside the compressed block: Brotli carries no
    // checksum, so corruption is allowed to surface as None OR as
    // different decompressed bytes (whose FIELD projection may even
    // coincide when the flip lands in a don't-care region) — the
    // byte-level divergence contract is pinned in BrotliSpec; here
    // the requirement is no-throw over the whole flip sweep
    (48 until good.length).foreach { i =>
      val bad = good.clone
      bad(i) = (bad(i) ^ 0x7f).toByte
      decodeWoff2Font(bad)
    }
    // declared compressed size too small: decode must reject, not
    // read a truncated stream
    val shortLen = good.clone
    shortLen(23) = (shortLen(23) - 1).toByte // totalCompressedSize -1
    assert(decodeWoff2Font(shortLen) === None)
    (1 until good.length by 3).foreach(n =>
      decodeWoff2Font(good.take(n)))
    // the sniff still reads the same directory
    val sniff = decodeWoff2(good).get
    assert(sniff.tags === Seq("head", "maxp", "name"))
  }

}

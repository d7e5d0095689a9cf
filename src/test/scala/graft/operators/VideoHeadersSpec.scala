package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import VideoHeaders._

class VideoHeadersSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("MP4 round-trip: box walk recovers brand/timescale/duration/" +
      "dims/track-count across variable-length hopped free boxes") {
    checkProp(Prop.forAll(Gen.oneOf("isom", "mp42", "avc1"),
        Gen.oneOf(600, 1000, 90000), Gen.choose(0L, 0xffffffffL),
        Gen.choose(1, 4095), Gen.choose(1, 4095), Gen.choose(1, 3),
        Gen.choose(0, 99)) { (brand, ts, dur, w, h, nt, noteLen) =>
      val blob = encodeMp4(brand, ts, dur, w, h, nt,
        Array.fill(noteLen)('x'.toByte))
      decodeMp4(blob).contains(Mp4Meta(brand, ts, dur, w, h, nt))
    })
  }

  test("first track with nonzero dims wins: later 0x0 audio tracks " +
      "do not blank the presentation size") {
    val blob = encodeMp4("isom", 1000, 5000L, 1920, 1080, 3,
      Array.emptyByteArray)
    val m = decodeMp4(blob).get
    assert(m.width == 1920 && m.height == 1080 && m.nTracks == 3)
  }

  test("malformed MP4 decodes to None, never throws") {
    val good = encodeMp4("isom", 1000, 5000L, 640, 480, 1, "hi".getBytes)
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone; f(c); c
    }
    val moovIdx = good.indexOfSlice("moov".getBytes) - 4
    val cases: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      good.take(10), // truncated ftyp
      good.take(moovIdx + 12), // truncated moov
      mut(b => b(4) = 'x'.toByte), // first box not ftyp
      // moov declares a size past the buffer end
      mut { b => b(moovIdx) = 0x7f.toByte; b(moovIdx + 1) = 0xff.toByte },
      // undersized box (size < 8) inside the chain
      mut { b =>
        b(moovIdx) = 0; b(moovIdx + 1) = 0
        b(moovIdx + 2) = 0; b(moovIdx + 3) = 4
      })
    cases.foreach(b => assert(decodeMp4(b).isEmpty,
      s"expected None for ${b.length}-byte mutant"))
    // no moov at all (header-only ftyp + free) is None, cleanly
    assert(decodeMp4(good.take(moovIdx)).isEmpty)
  }

  test("hostile 64-bit largesize ends the walk cleanly (Long math, " +
      "no Int-overflow index crash)") {
    val out = new java.io.ByteArrayOutputStream()
    def be32(v: Long): Unit = {
      out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
      out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
    }
    be32(24); out.write("ftyp".getBytes, 0, 4)
    out.write("isom".getBytes, 0, 4); be32(0)
    out.write("isom".getBytes, 0, 4); out.write("mp42".getBytes, 0, 4)
    be32(1); out.write("mdat".getBytes, 0, 4) // size=1: u64 follows
    be32(0x7fffffffL); be32(0xfffffff0L) // absurd largesize
    out.write(new Array[Byte](16), 0, 16)
    assert(decodeMp4(out.toByteArray).isEmpty)
  }

  // ----- ilst tags (round 14) -------------------------------------------

  private def tagged(title: String = "A Title", artist: String = "Someone",
      album: String = "An Album", day: String = "2001", track: Int = 3,
      total: Int = 12, note: Array[Byte] = "padding".getBytes,
      nTracks: Int = 2): Array[Byte] =
    encodeMp4Tagged("mp42", 1000, 90000L, 640, 360, nTracks, note,
      title, artist, album, day, track, total)

  test("ilst tags round-trip; the header sniff is undisturbed") {
    val b = tagged()
    val t = decodeMp4Tags(b).get
    assert(t.title.contains("A Title"))
    assert(t.artist.contains("Someone"))
    assert(t.album.contains("An Album"))
    assert(t.day.contains("2001"))
    assert(t.track.contains(3))
    assert(t.trackTotal.contains(12))
    assert(t.nItems === 5)
    // decodeMp4 must see the same movie through the grown moov
    val m = decodeMp4(b).get
    assert(m === Mp4Meta("mp42", 1000, 90000L, 640, 360, 2))
  }

  test("tagged stream length formula: 148 + |note| + 100*nTracks + 189 " +
      "+ sum of text lengths") {
    val b = tagged()
    val textLen = "A Title".length + "Someone".length +
      "An Album".length + "2001".length
    assert(b.length === 148 + 7 + 100 * 2 + 189 + textLen)
  }

  test("UTF-8 tag values survive the ilst round-trip") {
    val t = decodeMp4Tags(tagged(title = "naïve — héroïque")).get
    assert(t.title.contains("naïve — héroïque"))
  }

  test("untagged MP4 yields None (untagged is not an empty tag set)") {
    assert(decodeMp4Tags(encodeMp4("isom", 600, 1000L, 320, 240, 1,
      Array.emptyByteArray)) === None)
    assert(decodeMp4Tags(null) === None)
    assert(decodeMp4Tags("not a box".getBytes) === None)
  }

  test("a data child with an unexpected type flag is skipped, not " +
      "mis-decoded as text") {
    val b = tagged(title = "FlagMe")
    // the ©nam item is the first ilst child; its data 'type' u32 sits
    // 16 bytes into the item box. Find the raw tag bytes.
    var at = -1
    var i = 0
    while (at < 0 && i < b.length - 4) {
      if ((b(i) & 0xff) == 0xa9 && b(i + 1) == 'n' && b(i + 2) == 'a' &&
        b(i + 3) == 'm') at = i
      i += 1
    }
    assert(at > 0)
    b(at + 4 + 8 + 3) = 21 // type flags 1 -> 21 (reserved)
    val t = decodeMp4Tags(b).get
    assert(t.title === None) // flag not UTF-8 text: value dropped
    assert(t.artist.contains("Someone")) // siblings unaffected
    assert(t.nItems === 5)
  }

  test("truncated tagged stream never throws") {
    val b = tagged()
    (1 until b.length by 7).foreach(n => decodeMp4Tags(b.take(n)))
    assert(decodeMp4Tags(b.take(b.length - 10)) === None)
  }
}

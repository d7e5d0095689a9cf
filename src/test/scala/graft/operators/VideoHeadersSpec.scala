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
}

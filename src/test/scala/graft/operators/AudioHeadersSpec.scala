package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import AudioHeaders._

class AudioHeadersSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("WAV round-trip: decode(encode(...)) recovers the header " +
      "across variable-length LIST chunks incl. odd lengths (padding)") {
    checkProp(Prop.forAll(Gen.choose(1, 8), Gen.oneOf(8000, 16000, 44100),
        Gen.oneOf(8, 16, 24), Gen.choose(0L, 1000000L),
        Gen.choose(0, 99)) { (ch, rate, bits, ns, noteLen) =>
      val blob = encodeWav(ch, rate, bits, ns, Array.fill(noteLen)('x'.toByte))
      decodeWav(blob).contains(WavMeta(ch, rate, bits, ns))
    })
  }

  test("LIST chunk carries the mandatory 4-byte list-type (standard " +
      "RIFF a third-party reader accepts, not hop-tolerated nonstandard)") {
    val note = "hi".getBytes("US-ASCII")
    val b = encodeWav(1, 8000, 16, 10L, note)
    val li = b.indexOfSlice("LIST".getBytes)
    assert(li == 12) // first chunk after RIFF/WAVE
    val declared = (b(li + 4) & 0xff) | ((b(li + 5) & 0xff) << 8)
    assert(declared == 4 + note.length) // list-type + payload
    assert(new String(b, li + 8, 4, "US-ASCII") == "INFO")
    // total length formula the q232 oracle replays: 56 + len + len%2
    assert(b.length == 56 + note.length + (note.length & 1))
  }

  test("unknown chunks are hopped by size, not scanned") {
    // LIST payload full of 'fmt '/'data' lookalike bytes must not derail
    val trap = "fmt \u0010\u0000\u0000\u0000data".getBytes("ISO-8859-1")
    val blob = encodeWav(2, 16000, 16, 777L, trap)
    assert(decodeWav(blob).contains(WavMeta(2, 16000, 16, 777L)))
  }

  test("malformed inputs decode to None, never throw") {
    val good = encodeWav(1, 8000, 16, 100L, Array.emptyByteArray)
    val cases: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      "RIFF".getBytes,
      "not audio at all, just text padding".getBytes,
      good.take(11),             // truncated RIFF header
      good.take(20),             // truncated chunk chain
      {
        val b = good.clone; b(8) = 'A'.toByte; b // RIFF but not WAVE
      })
    cases.foreach { b =>
      assert(decodeWav(b).isEmpty, s"expected None for ${b.length}-byte input")
    }
  }

  test("huge declared chunk size ends the walk cleanly, not in an " +
      "index crash (Int-offset overflow); data-before-fmt truncates") {
    // LIST chunk declaring ~u32-max size before fmt: the Long-math
    // advance must end the walk at the buffer edge -> None
    val out = new java.io.ByteArrayOutputStream()
    out.write("RIFF".getBytes, 0, 4)
    out.write(Array[Byte](36, 0, 0, 0), 0, 4)
    out.write("WAVE".getBytes, 0, 4)
    out.write("LIST".getBytes, 0, 4)
    out.write(Array(0xf0, 0xff, 0xff, 0x7f).map(_.toByte), 0, 4) // size
    out.write(Array.fill(8)(0x42.toByte), 0, 8)
    assert(decodeWav(out.toByteArray).isEmpty)
    // and a header-only stream whose data chunk comes BEFORE fmt also
    // ends cleanly (None: fmt never reachable past the declared bytes)
    val out2 = new java.io.ByteArrayOutputStream()
    out2.write("RIFF".getBytes, 0, 4)
    out2.write(Array[Byte](36, 0, 0, 0), 0, 4)
    out2.write("WAVE".getBytes, 0, 4)
    out2.write("data".getBytes, 0, 4)
    out2.write(Array(0x00, 0x00, 0x10, 0x00).map(_.toByte), 0, 4)
    assert(decodeWav(out2.toByteArray).isEmpty)
  }

  test("zero channels / zero rate are rejected") {
    val b = encodeWav(1, 8000, 16, 10L, Array.emptyByteArray)
    // channels u16 sits at fmt payload offset 2 -> locate 'fmt ' + 8 + 2
    val fmtIdx = b.indexOfSlice("fmt ".getBytes)
    b(fmtIdx + 10) = 0; b(fmtIdx + 11) = 0
    assert(decodeWav(b).isEmpty)
  }
}

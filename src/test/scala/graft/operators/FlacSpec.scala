package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class FlacSpec extends AnyFunSuite {

  private def lcg(n: Int, seed: Long, range: Int): Array[Int] = {
    var s = seed
    Array.fill(n) {
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) % range).toInt - range / 2
    }
  }

  test("round trip: ramp across all fixed orders + verbatim frames") {
    // > 8 frames of 256 cycles fixed orders 0-4 and hits the every-7th
    // verbatim branch
    val samples = Array.tabulate(2100)(t => ((t * 23) % 3989) - 1994)
    val bytes = Flac.encodeFlac(samples, 256, 8000)
    val Some(a) = Flac.decodeFlac(bytes)
    assert(a.sampleRate == 8000 && a.frames == 9 && a.md5Ok)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("round trip: full-range noise (worst-case residuals)") {
    val samples = lcg(1000, 99, 65536)
    val Some(a) = Flac.decodeFlac(Flac.encodeFlac(samples, 256, 44100))
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("round trip: constant block takes the CONSTANT subframe") {
    val samples = Array.fill(256)(-777) ++ Array.tabulate(100)(_ * 3)
    val bytes = Flac.encodeFlac(samples, 256, 8000)
    val Some(a) = Flac.decodeFlac(bytes)
    assert(a.samples.toSeq == samples.toSeq && a.frames == 2)
  }

  test("spike-over-silence frames drive the escape (raw) residual path") {
    // near-silent frames with one huge spike: the mean-fitted rice
    // parameter is tiny, the spike's quotient overflows the 2^10
    // bound, and the encoder must take the escaped raw-width partition
    val samples = Array.tabulate(1500) { t =>
      if (t % 256 == 100) 30000 else (t % 3) - 1
    }
    val bytes = Flac.encodeFlac(samples, 256, 8000)
    val Some(a) = Flac.decodeFlac(bytes)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("one-frame and sub-block streams") {
    for (n <- Seq(16, 255, 256, 257)) {
      val samples = lcg(n, n, 4000)
      val Some(a) = Flac.decodeFlac(Flac.encodeFlac(samples, 256, 8000))
      assert(a.samples.toSeq == samples.toSeq, s"n=$n")
      assert(a.frames == (n + 255) / 256)
    }
  }

  test("corrupt streams yield None, never throw") {
    val good = Flac.encodeFlac(lcg(600, 5, 4000), 256, 8000)
    assert(Flac.decodeFlac(Array.empty[Byte]).isEmpty)
    assert(Flac.decodeFlac("fLaC but not really".getBytes).isEmpty)
    assert(Flac.decodeFlac(good.take(good.length - 3)).isEmpty) // torn frame
    // flip one payload byte: CRC-16 (or MD5) must catch it
    for (at <- Seq(60, good.length / 2, good.length - 5)) {
      val bad = good.clone()
      bad(at) = (bad(at) ^ 0x41).toByte
      assert(Flac.decodeFlac(bad).isEmpty, s"flip at $at slipped through")
    }
  }

  test("CRC polynomials match published check values") {
    // CRC-8/FLAC ("123456789" -> 0xF4) and CRC-16/UMTS aka BUYPASS
    // ("123456789" -> 0xFEE8) — the two algorithms RFC 9639 names
    val data = "123456789".getBytes("US-ASCII")
    assert(Flac.crc8(data, 0, data.length) == 0xf4)
    assert(Flac.crc16(data, 0, data.length) == 0xfee8)
  }
}

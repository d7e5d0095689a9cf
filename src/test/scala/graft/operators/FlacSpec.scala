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

  // ---- stereo + LPC (round 13) ---------------------------------------

  test("stereo round trip: all three decorrelation modes + LPC subframes") {
    val n = 700 // 6 frames of 128: modes indep, L/S, R/S, M/S all hit
    val left = Array.tabulate(n)(t => ((t * 23 + 7) % 3989) - 1994)
    val right = Array.tabulate(n)(t => ((t * 17 + 3) % 3163) - 1581)
    val bytes = Flac.encodeFlacStereo(left, right, 128, 16000)
    val Some(a) = Flac.decodeFlac(bytes)
    assert(a.channels == 2 && a.md5Ok && a.frames == 6)
    assert(a.channel(0).toSeq == left.toSeq)
    assert(a.channel(1).toSeq == right.toSeq)
  }

  test("stereo: full-range extremes survive side-channel 17-bit range") {
    // L = 32767, R = -32768 -> side = 65535 (needs the 17th bit)
    val left = Array.fill(300)(32767)
    val right = Array.fill(300)(-32768)
    val Some(a) = Flac.decodeFlac(Flac.encodeFlacStereo(left, right, 128, 8000))
    assert(a.channel(0).forall(_ == 32767))
    assert(a.channel(1).forall(_ == -32768))
  }

  test("stereo: mid/side odd sums reconstruct exactly (the lost low bit)") {
    // mid = (L+R)>>1 drops a bit that only side's parity can restore
    val left = Array.tabulate(600)(t => (t % 2) * 2 - 1) // odd values
    val right = Array.tabulate(600)(t => ((t * 3) % 5) - 2)
    val Some(a) = Flac.decodeFlac(Flac.encodeFlacStereo(left, right, 128, 8000))
    assert(a.channel(0).toSeq == left.toSeq)
    assert(a.channel(1).toSeq == right.toSeq)
  }

  test("stereo bit flips die at a CRC or the MD5, never mis-decode") {
    val left = Array.tabulate(400)(t => (t * 31) % 2000 - 1000)
    val right = Array.tabulate(400)(t => (t * 13) % 1500 - 750)
    val good = Flac.encodeFlacStereo(left, right, 128, 8000)
    for (at <- Seq(60, good.length / 2, good.length - 10)) {
      val bad = good.clone(); bad(at) = (bad(at) ^ 0x10).toByte
      assert(Flac.decodeFlac(bad).forall { a =>
        a.channel(0).toSeq == left.toSeq && a.channel(1).toSeq == right.toSeq
      }, s"flip at $at mis-decoded")
    }
  }

  test("hand-assembled known vector decodes to pinned samples") {
    // Independently hand-derived from RFC 9639 (NOT produced by
    // encodeFlac): mono, 16-bit, rate 8000, one 16-sample frame,
    // CONSTANT subframe of value 100. Guards against a shared
    // encoder/decoder misreading of the layout.
    val out = new java.io.ByteArrayOutputStream()
    out.write("fLaC".getBytes("US-ASCII"))
    out.write(0x80); out.write(0); out.write(0); out.write(34)
    // STREAMINFO: blocksize 16/16, framesize 0/0, rate 8000 (20b),
    // chans-1=0 (3b), bps-1=15 (5b), total=16 (36b)
    out.write(Array[Byte](0, 16, 0, 16, 0, 0, 0, 0, 0, 0,
      0x01, 0xF4.toByte, 0x00, 0xF0.toByte, 0, 0, 0, 0x10))
    val md = java.security.MessageDigest.getInstance("MD5")
    for (_ <- 0 until 16) { md.update(100.toByte); md.update(0.toByte) }
    out.write(md.digest())
    // frame header: sync+reserved+blocking FF F8, bs=0110 (8-bit at
    // end) sr=0000 -> 0x60, chan=0000 ss=100 r=0 -> 0x08, frame#0,
    // blocksize-1=15
    val hdr = Array[Byte](0xFF.toByte, 0xF8.toByte, 0x60, 0x08, 0x00, 0x0F)
    out.write(hdr)
    out.write(Flac.crc8(hdr, 0, hdr.length))
    // subframe: pad 0, type 000000 (CONSTANT), wasted 0 -> 0x00; then
    // the 16-bit value 100
    val body = Array[Byte](0x00, 0x00, 100)
    out.write(body)
    val frame = hdr ++ Array(Flac.crc8(hdr, 0, hdr.length).toByte) ++ body
    val c16 = Flac.crc16(frame, 0, frame.length)
    out.write(c16 >> 8); out.write(c16 & 0xff)
    val Some(a) = Flac.decodeFlac(out.toByteArray)
    assert(a.sampleRate == 8000 && a.channels == 1 && a.frames == 1)
    assert(a.samples.length == 16 && a.samples.forall(_ == 100))
  }
}

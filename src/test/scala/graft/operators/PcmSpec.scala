package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class PcmSpec extends AnyFunSuite {

  test("WAV round trip recovers samples exactly, LIST hop included") {
    val samples = Array(-32768, -1, 0, 1, 32767, 1234, -4321)
    // 7 samples is odd-length-safe only for mono; block is 2 bytes
    val bytes = Pcm.encodePcmWav(1, 8000, samples, "some metadata".getBytes)
    val Some(a) = Pcm.decodePcmWav(bytes)
    assert(a.channels == 1 && a.sampleRate == 8000)
    assert(a.samples.toSeq == samples.toSeq)
  }

  test("odd-length LIST body is even-padded and still hops") {
    val bytes = Pcm.encodePcmWav(1, 44100, Array(5, -5), "odd".getBytes)
    val Some(a) = Pcm.decodePcmWav(bytes)
    assert(a.sampleRate == 44100 && a.samples.toSeq == Seq(5, -5))
  }

  test("stereo interleave survives the round trip") {
    val samples = Array(10, -10, 20, -20, 30, -30)
    val Some(a) = Pcm.decodePcmWav(Pcm.encodePcmWav(2, 16000, samples,
      Array.empty))
    assert(a.channels == 2 && a.samples.toSeq == samples.toSeq)
  }

  test("corrupt blobs yield None, never throw") {
    assert(Pcm.decodePcmWav(Array.empty[Byte]).isEmpty)
    assert(Pcm.decodePcmWav("RIFFxxxxWAVE not really".getBytes).isEmpty)
    val good = Pcm.encodePcmWav(1, 8000, Array(1, 2, 3), "m".getBytes)
    assert(Pcm.decodePcmWav(good.take(40)).isEmpty) // truncated
    // 8-bit wav (bits != 16) is out of contract
    val b8 = good.clone()
    // bits-per-sample lives 22 bytes into the fmt chunk; find fmt tag
    val fmtOff = (0 until b8.length - 4)
      .find(i => new String(b8, i, 4, "US-ASCII") == "fmt ").get
    b8(fmtOff + 22) = 8
    assert(Pcm.decodePcmWav(b8).isEmpty)
  }

  test("mu-law expansion matches the published law's fixed points") {
    assert(Pcm.muLawToLinear(0xff) == 0)      // positive zero
    assert(Pcm.muLawToLinear(0x7f) == 0)      // negative zero
    assert(Pcm.muLawToLinear(0x80) == 8031)   // max positive
    assert(Pcm.muLawToLinear(0x00) == -8031)  // max negative
    assert(Pcm.muLawToLinear(0xfe) == 2)      // smallest nonzero step
    // monotone decreasing within the positive half (0xFF down to 0x80)
    val pos = (0x80 to 0xff).reverse.map(Pcm.muLawToLinear)
    assert(pos == pos.sorted)
  }

  test("mu-law WAV round trip expands every byte through the law") {
    val mulaw = Array.tabulate(300)(i => ((i * 7) % 256).toByte)
    val bytes = Pcm.encodeMuLawWav(1, 8000, mulaw, "phone call".getBytes)
    val Some(a) = Pcm.decodePcmWav(bytes)
    assert(a.channels == 1 && a.sampleRate == 8000)
    assert(a.samples.toSeq ==
      mulaw.toSeq.map(b => Pcm.muLawToLinear(b & 0xff)))
  }

  test("odd-length mu-law data chunk is even-padded in the walk") {
    val mulaw = Array.tabulate(7)(i => (i * 31 % 256).toByte)
    val Some(a) = Pcm.decodePcmWav(Pcm.encodeMuLawWav(1, 8000, mulaw,
      Array.empty))
    assert(a.samples.length == 7)
  }

  test("silence segmentation: runs under minRun stay inside segments") {
    // loud(10) quiet(30: a real silence run) loud(5) quiet(3: a blip
    // that must NOT split) loud(7)
    val samples =
      Array.fill(10)(500) ++ Array.fill(30)(2) ++ Array.fill(5)(-400) ++
        Array.fill(3)(1) ++ Array.fill(7)(300)
    val r = Pcm.segments(1L, samples, threshold = 50, minRun = 25)
    assert(r.n_segments == 2)
    assert(r.speech_samples == 10 + 5 + 3 + 7) // the blip stays speech
    assert(r.longest_segment == 15) // 5 + 3 + 7
    assert(r.silence_samples == 30)
  }

  test("silence segmentation edges: all-silent, all-loud, empty") {
    assert(Pcm.segments(1L, Array.fill(40)(0), 50, 25) ==
      Pcm.SegmentRow(1L, 0, 0, 0, 40))
    assert(Pcm.segments(1L, Array.fill(40)(999), 50, 25) ==
      Pcm.SegmentRow(1L, 1, 40, 40, 0))
    assert(Pcm.segments(1L, Array.empty[Int], 50, 25) ==
      Pcm.SegmentRow(1L, 0, 0, 0, 0))
    // a quiet run of exactly minRun IS silence
    assert(Pcm.segments(1L, Array.fill(25)(0) ++ Array.fill(5)(99), 50, 25)
      == Pcm.SegmentRow(1L, 1, 5, 5, 25))
  }

  test("decimate2 truncates toward zero (the measured DuckDB // law)") {
    // (-3 + -2) = -5: -5 / 2 truncates to -2 in BOTH engines (DuckDB
    // -5 // 2 = -2, measured — not floor)
    assert(Pcm.decimate2(Array(-3, -2)).toSeq == Seq(-2))
    assert(Pcm.decimate2(Array(3, 2)).toSeq == Seq(2))
    assert(Pcm.decimate2(Array(10, 20, -7, -8)).toSeq == Seq(15, -7))
    assert(Pcm.decimate2(Array.empty[Int]).isEmpty)
  }

  test("stats: peak, abs sum, strict zero crossings, clip count") {
    val r = Pcm.stats(7L, Array(100, -100, 0, -50, 1950, -1899), clipAt = 1900)
    assert(r.n_samples == 6)
    assert(r.peak == 1950)
    assert(r.sum_abs == 100 + 100 + 0 + 50 + 1950 + 1899)
    // crossings: 100->-100 yes; -100->0 no (zero breaks); 0->-50 no;
    // -50->1950 yes; 1950->-1899 yes
    assert(r.zero_crossings == 3)
    assert(r.clip_count == 1) // only 1950; |-1899| < 1900
  }

  // ---- A-law + 24-bit stereo (round 13) --------------------------------

  test("A-law expansion matches the published law's landmark values") {
    // 0x55 -> -8 (the quietest negative), 0xD5 -> +8, extremes +-32256;
    // sign convention REVERSED vs mu-law (bit 7 set = positive)
    assert(Pcm.aLawToLinear(0x55) == -8)
    assert(Pcm.aLawToLinear(0xD5) == 8)
    assert(Pcm.aLawToLinear(0x2A) == -32256)
    assert(Pcm.aLawToLinear(0xAA) == 32256)
    // monotone within a positive segment
    assert(Pcm.aLawToLinear(0xD5) < Pcm.aLawToLinear(0xD4))
  }

  test("A-law WAV round trip (fmt 6) expands every byte") {
    val alaw = Array.tabulate(300)(t => ((t * 31 + 7) % 256).toByte)
    val wav = Pcm.encodeALawWav(1, 8000, alaw, "c".getBytes)
    val Some(a) = Pcm.decodePcmWav(wav)
    assert(a.samples.length == 300)
    for (i <- 0 until 300)
      assert(a.samples(i) == Pcm.aLawToLinear(alaw(i) & 0xff))
  }

  test("24-bit stereo WAV: 3-byte LE samples sign-extend and interleave") {
    val inter = Array(-8388608, 8388607, -1, 1, 123456, -654321)
    val wav = Pcm.encodePcm24Wav(2, 48000, inter, "x".getBytes)
    val Some(a) = Pcm.decodePcmWav(wav)
    assert(a.channels == 2 && a.sampleRate == 48000)
    assert(a.samples.toSeq == inter.toSeq)
  }

  test("24-bit data length not a multiple of 3 rejects") {
    val wav = Pcm.encodePcm24Wav(1, 8000, Array(5, -5, 9), "".getBytes)
    // find the data chunk and shrink its declared length to 8 (% 3 != 0)
    var at = -1
    for (i <- 0 until wav.length - 4 if at < 0)
      if (wav(i) == 'd' && wav(i + 1) == 'a' && wav(i + 2) == 't' &&
        wav(i + 3) == 'a') at = i
    assert(at > 0)
    val bad = wav.clone()
    bad(at + 4) = 8
    assert(Pcm.decodePcmWav(bad).isEmpty)
  }
}

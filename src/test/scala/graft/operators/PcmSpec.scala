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
}

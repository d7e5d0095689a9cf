package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** VP8L conformance, refereed by the SYSTEM libwebp (the reference
  * implementation of RFC 9649) through committed vectors — see
  * tools/webp_ref.py:
  *  - decode direction: libwebp's own lossless encodings (which use
  *    predictor/color transforms, subtract-green, color cache, LZ77
  *    and palette bundling) must decode to the planted pixels;
  *  - encode direction: this repo's encoder output, decoded by
  *    libwebp offline, must reproduce the planted pixels (the
  *    committed .rgba answers), and the encoder must stay
  *    byte-deterministic against the committed .webp bytes;
  *  - plus a hand-assembled spec vector (the FLAC discipline) pinning
  *    bit order and the LZ77/cache value coding independent of any
  *    implementation.
  */
class Vp8lSpec extends AnyFunSuite {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/webp/$name")
    assert(in != null, s"missing test resource webp/$name — run tools/webp_ref.py")
    try in.readAllBytes() finally in.close()
  }

  private def argbToRgba(px: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](px.length * 4)
    var i = 0
    while (i < px.length) {
      val p = px(i)
      out(i * 4) = ((p >> 16) & 0xff).toByte
      out(i * 4 + 1) = ((p >> 8) & 0xff).toByte
      out(i * 4 + 2) = (p & 0xff).toByte
      out(i * 4 + 3) = ((p >>> 24) & 0xff).toByte
      i += 1
    }
    out
  }

  private val libwebpVectors = Seq(
    ("grad_9x7", 9, 7), ("one_1x1", 1, 1), ("photo_64x48", 64, 48),
    ("pal4_33x9", 33, 9), ("pal2_17x5", 17, 5), ("runs_40x40", 40, 40),
    ("alpha_16x16", 16, 16), ("wide_301x3", 301, 3),
    ("meta_400x160", 400, 160)) // meta prefix groups + 9-bit cache

  for ((name, w, h) <- libwebpVectors)
    test(s"libwebp encoding $name decodes to the planted pixels") {
      val blob = resource(s"$name.webp")
      val want = resource(s"$name.rgba")
      val got = Vp8l.decodeWebpLossless(blob)
      assert(got.nonEmpty, s"decode failed for $name")
      val img = got.get
      assert(img.width == w && img.height == h)
      assert(argbToRgba(img.argb).sameElements(want), s"pixels differ: $name")
    }

  test("round-trip: own encoder -> own decoder, all code shapes") {
    for ((w, h, f) <- Vp8lFixtures.cases) {
      val px = Array.tabulate(w * h)(i => f(i % w, i / w))
      val blob = Vp8l.encodeWebpLossless(w, h, px)
      val back = Vp8l.decodeWebpLossless(blob)
      assert(back.nonEmpty, s"round-trip decode failed at ${w}x$h")
      assert(back.get.width == w && back.get.height == h)
      assert(back.get.argb.sameElements(px), s"round-trip pixels at ${w}x$h")
    }
  }

  test("own encoder output is refereed by libwebp (committed decodes)") {
    for ((name, w, h, f) <- Vp8lFixtures.myenc) {
      val px = Array.tabulate(w * h)(i => f(i % w, i / w))
      val blob = Vp8l.encodeWebpLossless(w, h, px)
      val committed = resource(s"$name.webp")
      assert(blob.sameElements(committed),
        s"encoder drifted from committed bytes: $name — rerun " +
          "Test/runMain graft.operators.Vp8lFixtureGen + tools/webp_ref.py check")
      val libwebpSays = resource(s"$name.rgba")
      assert(argbToRgba(px).sameElements(libwebpSays),
        s"libwebp decoded our $name to different pixels")
    }
  }

  test("hand vector (builder-checked): cache + LZ77 over one row") {
    // Assemble with a tiny local writer, then assert the DECODED
    // pixels against a hand-computed program:
    //   4x2, cache_bits=1, one group.
    //   green code (normal): sym 10 len 1, sym 258 len 2, sym 280 len 2,
    //     sym 281 len 2 — complete (1/2+3/4 … = 1/2+1/4+1/4? that is
    //     1.25 — OVER. Use: sym 10 len 1, sym 258 len 2, sym 280 len 3,
    //     sym 281 len 3. Kraft: .5+.25+.125+.125 = 1. Canonical:
    //     10='0', 258='10', 280='110', 281='111'.
    //   red: simple 1-sym {20}; blue: simple {30}; alpha: simple {255};
    //   distance: simple 1-sym {0} -> dist code 1 = (0,1) = one row up.
    //   cache slots: 2. argb1 = ff141e0a? (a=255,r=20,g=10,b=30) —
    //     0xff140a1e. hash = (0x1e35a7bd * argb) >>> 31.
    val argb1 = 0xff140a1e
    val slot1 = (0x1e35a7bd * argb1) >>> 31
    // row 0: [lit, cacheHit, lit, cacheHit]  (hits read slot of argb1)
    // row 1: green 258 => length 3, dist prefix 0 -> code 1 -> row up;
    //        then one cache hit to finish the row.
    val w = new Vp8lTestWriter
    w.b(0x2f, 8); w.b(3, 14); w.b(1, 14); w.b(0, 1); w.b(0, 3)
    w.b(0, 1) // no transforms
    w.b(1, 1); w.b(1, 4) // cache bits = 1
    w.b(0, 1) // no meta
    // green normal code over alphabet 282
    w.b(0, 1) // not simple
    w.b(15, 4)
    val clLens = Map(1 -> 2, 2 -> 2, 3 -> 3, 17 -> 2, 18 -> 3)
    // kraft: three len-2 (0.25*3) + two len-3 (0.125*2) = 1.0
    for (s <- Seq(17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
      13, 14, 15)) w.b(clLens.getOrElse(s, 0), 3)
    w.b(0, 1) // all symbols
    // canonical cl codes: len2: {1:'00',2:'01',17:'10'}, len3: {3:'110',18:'111'}
    def cl(sym: Int): Unit = sym match {
      case 1 => w.c(0, 2)
      case 2 => w.c(1, 2)
      case 3 => w.c(6, 3)
      case 17 => w.c(2, 2)
      case 18 => w.c(7, 3)
      case _ => fail(s"cl $sym")
    }
    def zrun(k: Int): Unit = { // code 17 = 3 + rb(3) zeros (3..10 per run)
      var left = k
      while (left > 0) {
        val t = if (left > 10 && left - 10 < 3) left - 3 else math.min(left, 10)
        cl(17); w.b(t - 3, 3); left -= t
      }
    }
    zrun(10) // greens 0..9
    cl(1) // green 10: len 1
    zrun(247) // 11..257
    cl(2) // green 258: len 2
    zrun(21) // 259..279
    cl(3) // green 280: len 3 (cache slot 0)
    cl(3) // green 281: len 3 (cache slot 1)
    // red / blue / alpha: simple 1-symbol codes
    def simple1(sym: Int): Unit = {
      w.b(1, 1); w.b(0, 1); w.b(1, 1); w.b(sym, 8)
    }
    simple1(20); simple1(30); simple1(255)
    simple1(0) // distance: dist prefix 0
    // canonical green codes: 10='0'(len1); 258='10'(len2); 280='110',
    // 281='111' (len3)
    def green(sym: Int): Unit = sym match {
      case 10 => w.c(0, 1)
      case 258 => w.c(2, 2)
      case 280 => w.c(6, 3)
      case 281 => w.c(7, 3)
      case _ => fail(s"green $sym")
    }
    val cacheSym = if (slot1 == 0) 280 else 281
    green(10) // P0 literal (red/blue/alpha codes read zero bits)
    green(cacheSym) // P1 cache hit
    green(10) // P2 literal
    green(cacheSym) // P3 cache hit
    green(258) // P4..P6: length 3, distance next
    // distance prefix: simple 1-sym — zero bits; dist code 1 = row up
    green(cacheSym) // P7 cache hit
    val blob = w.container()
    val got = Vp8l.decodePayload(blob, 0, blob.length)
    assert(got.nonEmpty, "hand vector must decode")
    val img = got.get
    assert(img.width == 4 && img.height == 2)
    assert(img.argb.forall(_ == argb1),
      s"all pixels are the one literal color: ${img.argb.map(_.toHexString).mkString(",")}")
  }

  test("corrupt streams are None, never a mis-decode") {
    val px = Array.tabulate(48)(i => 0xff000000 | (i * 5 << 8))
    val blob = Vp8l.encodeWebpLossless(8, 6, px)
    assert(Vp8l.decodeWebpLossless(blob).nonEmpty)
    assert(Vp8l.decodeWebpLossless(Array.empty[Byte]).isEmpty)
    assert(Vp8l.decodeWebpLossless("RIFFxxxxWEBP".getBytes).isEmpty)
    for (cut <- Seq(1, 5, blob.length / 2, blob.length - 21))
      assert(Vp8l.decodeWebpLossless(blob.take(blob.length - cut)).isEmpty ||
        cut == 0, s"truncated by $cut must fail")
    val bad = blob.clone()
    bad(12) = 'V'; bad(13) = 'P'; bad(14) = '8'; bad(15) = ' ' // lossy chunk
    assert(Vp8l.decodeWebpLossless(bad).isEmpty)
  }
}

/** LSB-first bit writer used by the hand vector (kept out of the main
  * codec so the vector cannot share code with the thing it checks). */
final class Vp8lTestWriter {
  private val out = new java.io.ByteArrayOutputStream()
  private var cur = 0
  private var n = 0
  def b(v: Int, bits: Int): Unit = {
    var i = 0
    while (i < bits) {
      cur |= ((v >> i) & 1) << n; n += 1
      if (n == 8) { out.write(cur); cur = 0; n = 0 }
      i += 1
    }
  }
  /** canonical code, MSB-first on the wire */
  def c(code: Int, len: Int): Unit = {
    var i = len - 1
    while (i >= 0) { b((code >> i) & 1, 1); i -= 1 }
  }
  def container(): Array[Byte] = {
    if (n > 0) { out.write(cur); cur = 0; n = 0 }
    out.toByteArray
  }
}

/** Planted-pixel fixtures shared by the spec and the committed-vector
  * generator (Vp8lFixtureGen). ARGB formulas, deterministic. */
object Vp8lFixtures {
  val cases: Seq[(Int, Int, (Int, Int) => Int)] = Seq(
    (11, 6, (x, y) => 0xff000000 | ((x * 23 + y * 7) % 256 << 16) |
      ((x * 5 + y * 31) % 256 << 8) | ((x * 13 + y * 3) % 256)),
    (5, 4, (_, _) => 0xff102030), // single color: simple 1-symbol codes
    (8, 3, (x, y) => if ((x + y) % 2 == 0) 0xffaabbcc else 0xff112233),
    (9, 9, (x, y) => ((128 + x * 8) << 24) | (x * 16 << 16) |
      (y * 16 << 8) | ((x ^ y) * 16)),
    (32, 20, (x, y) => {
      var s = (x * 2654435761L + y * 40503L) & 0xffffffffL
      s = (s ^ (s >> 13)) * 1274126177L & 0xffffffffL
      0xff000000 | (s & 0xffffff).toInt // dense histograms: deep codes
    }),
    (1, 1, (_, _) => 0x80fedcba))

  /** The committed-encoder fixtures (name, w, h, formula). */
  val myenc: Seq[(String, Int, Int, (Int, Int) => Int)] = Seq(
    ("myenc_grad_11x6", 11, 6, cases(0)._3),
    ("myenc_flat_5x4", 5, 4, cases(1)._3),
    ("myenc_two_8x3", 8, 3, cases(2)._3),
    ("myenc_alpha_9x9", 9, 9, cases(3)._3),
    ("myenc_noise_32x20", 32, 20, cases(4)._3))
}

/** Writes the own-encoder fixtures into src/test/resources/webp for
  * the libwebp check direction: run this, then
  * `python3 tools/webp_ref.py check`, then commit. */
object Vp8lFixtureGen {
  def main(args: Array[String]): Unit = {
    val dir = new java.io.File("src/test/resources/webp")
    dir.mkdirs()
    for ((name, w, h, f) <- Vp8lFixtures.myenc) {
      val px = Array.tabulate(w * h)(i => f(i % w, i / w))
      val blob = Vp8l.encodeWebpLossless(w, h, px)
      val fos = new java.io.FileOutputStream(new java.io.File(dir, s"$name.webp"))
      try fos.write(blob) finally fos.close()
      println(s"$name: ${blob.length} bytes")
    }
  }
}

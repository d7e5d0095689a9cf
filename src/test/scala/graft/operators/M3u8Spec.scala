package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import M3u8._

class M3u8Spec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 80): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("media playlist round-trips: exact ms totals, ENDLIST, version") {
    checkProp(Prop.forAll(Gen.choose(1, 9), Gen.choose(1, 20),
        Gen.nonEmptyListOf(Gen.choose(0, 200)), Gen.oneOf(true, false)) {
      (v, target, tenths, ended) =>
        val m = decodeM3u8(encodeMediaPlaylist(v, target, tenths, ended)).get
        m.kind == "media" && m.version == v && m.targetDuration == target &&
          m.nSegments == tenths.length &&
          m.totalDurationMs == tenths.map(_ * 100L).sum &&
          m.ended == ended && m.nVariants == 0
    })
  }

  test("master playlist: variant count, max bandwidth/resolution; the " +
      "quoted CODECS comma does not split the attribute list") {
    val m = decodeM3u8(encodeMasterPlaylist(4,
      Seq((200000L, 640, 360), (800000L, 1280, 720),
        (500000L, 960, 540)))).get
    assert(m.kind === "master")
    assert(m.version === 4)
    assert(m.nVariants === 3)
    assert(m.maxBandwidth === 800000L)
    assert((m.maxWidth, m.maxHeight) === (1280, 720))
    assert(m.nSegments === 0 && m.totalDurationMs === 0L)
  }

  test("absent EXT-X-VERSION means protocol version 1") {
    val pl = "#EXTM3U\n#EXTINF:4.0,\nseg.ts\n#EXT-X-ENDLIST\n"
    val m = decodeM3u8(pl.getBytes("UTF-8")).get
    assert(m.version === 1)
    assert(m.totalDurationMs === 4000L)
  }

  test("CRLF line endings and integer EXTINF durations parse") {
    val pl = "#EXTM3U\r\n#EXTINF:6,\r\nseg.ts\r\n"
    val m = decodeM3u8(pl.getBytes("UTF-8")).get
    assert(m.nSegments === 1)
    assert(m.totalDurationMs === 6000L)
  }

  test("malformed playlists yield None, never a throw") {
    assert(decodeM3u8(null) === None)
    assert(decodeM3u8("not a playlist".getBytes) === None)
    assert(decodeM3u8("#EXTM3U\n".getBytes) === None) // neither kind
    // EXTINF with no URI line after it
    assert(decodeM3u8("#EXTM3U\n#EXTINF:4.0,\n# only comments\n".getBytes)
      === None)
    // STREAM-INF with no URI
    assert(decodeM3u8(
      "#EXTM3U\n#EXT-X-STREAM-INF:BANDWIDTH=100\n".getBytes) === None)
    // mixed kinds in one playlist
    assert(decodeM3u8(("#EXTM3U\n#EXTINF:4.0,\nseg.ts\n" +
      "#EXT-X-STREAM-INF:BANDWIDTH=100\nv.m3u8\n").getBytes) === None)
    // negative duration / garbage numbers
    assert(decodeM3u8("#EXTM3U\n#EXTINF:-4.0,\nseg.ts\n".getBytes) === None)
    assert(decodeM3u8("#EXTM3U\n#EXTINF:abc,\nseg.ts\n".getBytes) === None)
    // missing BANDWIDTH (required per RFC 8216)
    assert(decodeM3u8(("#EXTM3U\n#EXT-X-STREAM-INF:RESOLUTION=1x1\n" +
      "v.m3u8\n").getBytes) === None)
    // truncation sweep over a good one
    val good = encodeMediaPlaylist(3, 10, Seq(40, 52, 61), ended = true)
    (1 until good.length by 3).foreach(n => decodeM3u8(good.take(n)))
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class AviSpec extends AnyFunSuite {

  private def sample(): Array[Byte] = Avi.encodeAvi(
    usPerFrame = 33367, width = 640, height = 480,
    streamTypes = Seq("vids", "auds"),
    frames = Seq(
      "00dc" -> Array.fill(101)(1.toByte), // odd: exercises padding
      "00dc" -> Array.fill(200)(2.toByte),
      "01wb" -> Array.fill(64)(3.toByte)))

  test("AVI walk recovers headers, movi census and idx1") {
    val Some(m) = Avi.decodeAvi(sample())
    assert(m.usPerFrame == 33367 && m.width == 640 && m.height == 480)
    assert(m.totalFrames == 2) // video frames only
    assert(m.streams == 2 && m.videoStreams == 1)
    assert(m.moviChunks == 3 && m.moviBytes == 101 + 200 + 64)
    assert(m.idxEntries == 3)
  }

  test("declared vs found stream count mismatch rejects") {
    val blob = sample()
    // avih 'streams' field: find 'avih' tag, payload offset +24
    val at = (0 until blob.length - 4)
      .find(i => new String(blob, i, 4, "US-ASCII") == "avih").get
    val bad = blob.clone()
    bad(at + 8 + 24) = 9 // claim 9 streams
    assert(Avi.decodeAvi(bad).isEmpty)
  }

  test("corrupt AVIs yield None") {
    assert(Avi.decodeAvi(Array.empty[Byte]).isEmpty)
    assert(Avi.decodeAvi("RIFFxxxxWAVE".getBytes).isEmpty)
    val blob = sample()
    assert(Avi.decodeAvi(blob.take(blob.length / 2)).isEmpty)
  }
}

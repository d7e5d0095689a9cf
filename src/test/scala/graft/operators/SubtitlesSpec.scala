package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class SubtitlesSpec extends AnyFunSuite {

  test("SRT: cues parse with indices, timing, multi-line text joined") {
    val srt =
      """1
        |00:00:01,000 --> 00:00:03,500
        |hello there
        |second line
        |
        |2
        |00:00:04,000 --> 00:00:06,000
        |goodbye
        |""".stripMargin
    val cues = Subtitles.parseSrt(srt)
    assert(cues.map(_.index) == Seq(1, 2))
    assert(cues(0).startMs == 1000 && cues(0).endMs == 3500)
    assert(cues(0).text == "hello there second line")
  }

  test("SRT: malformed cues are skipped, not thrown") {
    val srt =
      """1
        |00:00:01,000 --> 00:00:02,000
        |ok
        |
        |not-an-index
        |00:00:03,000 --> 00:00:04,000
        |dropped
        |
        |3
        |00:00:09,000 --> 00:00:05,000
        |end before start, dropped
        |
        |4
        |00:00:05,000 --> 00:00:06,000
        |ok too
        |""".stripMargin
    assert(Subtitles.parseSrt(srt).map(_.index) == Seq(1, 4))
  }

  test("VTT: header required, NOTE skipped, settings dropped, MM:SS ok") {
    val vtt =
      """WEBVTT
        |
        |NOTE
        |this is a comment
        |
        |01:02.500 --> 01:04.000 position:10% line:0
        |short form
        |
        |id-7
        |00:01:02.500 --> 00:01:05.000
        |with identifier
        |""".stripMargin
    val cues = Subtitles.parseVtt(vtt)
    assert(cues.length == 2)
    assert(cues(0).startMs == 62500 && cues(0).endMs == 64000)
    assert(cues(0).text == "short form")
    assert(cues(1).startMs == 62500 && cues(1).endMs == 65000)
    assert(cues(1).text == "with identifier")
    assert(Subtitles.parseVtt("1\n00:00:01,000 --> 00:00:02,000\nx").isEmpty)
  }

  test("dispatch: WEBVTT magic routes to vtt, else srt") {
    assert(Subtitles.parseSubtitles("WEBVTT\n\n00:01.000 --> 00:02.000\nx")
      ._1 == "vtt")
    assert(Subtitles.parseSubtitles("1\n00:00:01,000 --> 00:00:02,000\nx")
      ._1 == "srt")
  }

  test("fixture docs parse back to the formula") {
    for (id <- Seq(0L, 1L, 7L, 42L)) {
      val (fmt, cues) = Subtitles.parseSubtitles(
        Subtitles.fixtureDoc(id, Array("a", "b", "c")))
      assert(fmt == (if (id % 2 == 0) "srt" else "vtt"))
      assert(cues.length == (2 + id % 5).toInt)
      assert(cues.head.startMs == id * 1000)
    }
  }
}

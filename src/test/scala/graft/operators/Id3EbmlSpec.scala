package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class Id3EbmlSpec extends AnyFunSuite {

  // ---- ID3v2 -----------------------------------------------------------

  private val frames = Seq("TIT2" -> "A Song", "TPE1" -> "Someone",
    "TRCK" -> "7")

  test("v2.3 and v2.4 round trip; sizes follow each version's rule") {
    for (v <- Seq(3, 4)) {
      val tag = Id3.encodeId3(v, frames, padding = 5)
      val Some(t) = Id3.parseId3(tag)
      assert(t.version == v)
      assert(t.frames == frames.toMap)
      assert(t.tagBytes == tag.length)
    }
  }

  test("a >127-byte frame separates the two size rules") {
    // payload 200 bytes: v2.3 plain u32 says 0x000000C9, v2.4 syncsafe
    // says 0x00000149 — a parser using the wrong rule walks into the
    // frame body and dies on the id check
    val big = Seq("TIT2" -> ("x" * 200), "TALB" -> "after")
    for (v <- Seq(3, 4)) {
      val Some(t) = Id3.parseId3(Id3.encodeId3(v, big, 0))
      assert(t.frames("TALB") == "after", s"v2.$v lost the second frame")
    }
  }

  test("corrupt tags yield None") {
    assert(Id3.parseId3(Array.empty[Byte]).isEmpty)
    assert(Id3.parseId3("ID3 garbage".getBytes).isEmpty)
    val good = Id3.encodeId3(3, frames, 0)
    assert(Id3.parseId3(good.take(good.length - 3)).isEmpty)
    val v2 = good.clone(); v2(3) = 2 // ID3v2.2: out of contract
    assert(Id3.parseId3(v2).isEmpty)
  }

  test("v2.3 unsynchronisation: 0xFF escapes round trip") {
    val f = Seq("TIT2" -> "yÿÿz", "TALB" -> "after the escapes")
    val tag = Id3.encodeId3(3, f, padding = 0, unsync = true)
    // on-disk body grew by one byte per 0xFF
    val plain = Id3.encodeId3(3, f, padding = 0)
    assert(tag.length == plain.length + 2)
    val Some(t) = Id3.parseId3(tag)
    assert(t.frames == f.toMap)
    assert(t.tagBytes == tag.length)
    // a parser ignoring the flag would misparse: the raw escaped body
    // differs from the restored one
    assert(!java.util.Arrays.equals(tag, plain))
  }

  test("UTF-8 text frames decode (encoding byte 3)") {
    // hand-build one v2.4 frame with encoding 3
    val payload = Array[Byte](3) ++ "héllo".getBytes("UTF-8")
    val body = "TIT2".getBytes("US-ASCII") ++
      Array[Byte](0, 0, ((payload.length >> 7) & 0x7f).toByte,
        (payload.length & 0x7f).toByte) ++
      Array[Byte](0, 0) ++ payload
    val tag = Array[Byte]('I', 'D', '3', 4, 0, 0,
      0, 0, ((body.length >> 7) & 0x7f).toByte,
      (body.length & 0x7f).toByte) ++ body
    val Some(t) = Id3.parseId3(tag)
    assert(t.frames("TIT2") == "héllo")
  }

  // ---- EBML ------------------------------------------------------------

  test("WebM round trip: doctype, scale, tracks, codecs, blocks") {
    val blob = Ebml.encodeWebm("webm", 2000000L,
      Seq((1, "V_VP9"), (2, "A_OPUS")), 1234L,
      Seq(Array[Byte](1, 2, 3), Array[Byte](4, 5)))
    val Some(m) = Ebml.decodeWebm(blob)
    assert(m.docType == "webm" && m.tsScale == 2000000L)
    assert(m.tracks == 2 && m.videoTracks == 1)
    assert(m.codecs == "A_OPUS,V_VP9")
    assert(m.blocks == 2 && m.blockBytes == 5)
  }

  test("default timestamp scale applies when Info omits it") {
    // matroska default is 1_000_000 ns
    val blob = Ebml.encodeWebm("matroska", 1000000L, Seq((1, "V_AV1")),
      0L, Seq(Array[Byte](9)))
    val Some(m) = Ebml.decodeWebm(blob)
    assert(m.tsScale == 1000000L)
  }

  test("VINT length boundaries survive (127/128-byte payloads)") {
    // 127 fits a 1-byte vint; 128 needs 2 bytes (127 = all-ones is
    // reserved, the encoder must already widen there)
    for (n <- Seq(100, 126, 127, 128, 300)) {
      val blob = Ebml.encodeWebm("webm", 1000000L, Seq((1, "V_VP9")),
        0L, Seq(Array.fill(n)(7.toByte)))
      val Some(m) = Ebml.decodeWebm(blob)
      assert(m.blockBytes == n, s"payload $n misparsed")
    }
  }

  test("corrupt EBML yields None") {
    assert(Ebml.decodeWebm(Array.empty[Byte]).isEmpty)
    assert(Ebml.decodeWebm("not ebml at all".getBytes).isEmpty)
    val good = Ebml.encodeWebm("webm", 1000000L, Seq((1, "V_VP9")), 0L,
      Seq(Array[Byte](1)))
    assert(Ebml.decodeWebm(good.take(good.length - 2)).isEmpty)
  }

  // ---- v2.4 per-frame features (round 13) -----------------------------

  test("v2.4 per-frame unsync: escaped sizes, restored text") {
    val blob = Id3.encodeId3v24(Seq(
      ("TIT2", "a\u00ffb", 0, true, false)), padding = 0)
    val Some(t) = Id3.parseId3(blob)
    assert(t.frames("TIT2") == "a\u00ffb")
    // frame size counts the ESCAPED bytes: enc(1) + 3 text + 1 escape
    assert(t.tagBytes == 10 + 10 + 5)
  }

  test("v2.4 UTF-16 BOM and UTF-16BE text frames decode") {
    val blob = Id3.encodeId3v24(Seq(
      ("TIT2", "T\u00eft\u20acl", 1, false, false), // BOM'd UTF-16
      ("TPE1", "Art\u00efst", 2, false, false)), // UTF-16BE, no BOM
      padding = 2)
    val Some(t) = Id3.parseId3(blob)
    assert(t.frames("TIT2") == "T\u00eft\u20acl")
    assert(t.frames("TPE1") == "Art\u00efst")
  }

  test("v2.4 data-length indicator is present and cross-checked") {
    val good = Id3.encodeId3v24(Seq(
      ("TALB", "x\u00ffy", 0, true, true)), padding = 0)
    val Some(t) = Id3.parseId3(good)
    assert(t.frames("TALB") == "x\u00ffy")
    // corrupt the DLI: parser must reject, not mis-decode
    val bad = good.clone()
    bad(10 + 10 + 3) = 9 // last DLI byte: restored length now wrong
    // (fix the frame CRC-free format: only the DLI mismatch trips)
    assert(Id3.parseId3(bad).isEmpty)
  }

  test("v2.4 unsync composes with UTF-16 (BOM 0xFF itself escapes)") {
    val blob = Id3.encodeId3v24(Seq(
      ("TIT2", "\u00ff\u00ff", 1, true, false)), padding = 0)
    val Some(t) = Id3.parseId3(blob)
    assert(t.frames("TIT2") == "\u00ff\u00ff")
    // body = enc(1) + BOM(2) + 2 chars x2 bytes; escapes: BOM FF +
    // each char's FF low byte = 3
    assert(t.tagBytes == 10 + 10 + (1 + 2 + 4 + 3))
  }
}

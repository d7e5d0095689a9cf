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

  test("MP3 round-trip: the frame walk counts every frame across " +
      "bitrates, rates, and variable-length ID3v2 tags") {
    checkProp(Prop.forAll(Gen.oneOf(32, 64, 128, 256, 320),
        Gen.oneOf(44100, 48000, 32000), Gen.choose(1, 40),
        Gen.oneOf(1, 2), Gen.choose(0, 99)) { (br, rate, nf, ch, noteLen) =>
      val blob = encodeMp3(br, rate, nf, ch, Array.fill(noteLen)('x'.toByte))
      decodeMp3(blob).contains(
        Mp3Meta("mpeg1", br, rate, ch, nf, nf * 1152L))
    })
  }

  test("MP3: VBR streams (bitrate switch mid-file) walk to the true " +
      "frame count; a sample-rate switch is malformed") {
    def frames(br: Int, rate: Int, nf: Int) =
      encodeMp3(br, rate, nf, 2, Array.emptyByteArray).drop(10)
    val vbr = ("ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 0)) ++
      frames(64, 44100, 3) ++ frames(192, 44100, 2)
    assert(decodeMp3(vbr).contains(
      Mp3Meta("mpeg1", 64, 44100, 2, 5, 5 * 1152L)))
    val rateSwitch = ("ID3".getBytes ++ Array[Byte](4, 0, 0, 0, 0, 0, 0)) ++
      frames(64, 44100, 2) ++ frames(64, 48000, 1)
    assert(decodeMp3(rateSwitch).isEmpty)
  }

  test("Layers I and II: per-layer tables, slot-quantized Layer I " +
      "frame length, per-layer samples per frame") {
    // Layer I: 384 samples/frame, frame = (12*br/rate)*4 slots
    val l1 = encodeMp3(256, 32000, 4, 2, "n".getBytes, layer = 1)
    assert(decodeMp3(l1).contains(
      Mp3Meta("mpeg1", 256, 32000, 2, 4, 4 * 384L, 1)))
    assert(l1.length == 10 + 1 + 4 * ((12 * 256000 / 32000) * 4))
    // Layer II: 1152 samples/frame, frame = 144*br/rate
    val l2 = encodeMp3(192, 44100, 3, 1, Array.emptyByteArray, layer = 2)
    assert(decodeMp3(l2).contains(
      Mp3Meta("mpeg1", 192, 44100, 1, 3, 3 * 1152L, 2)))
    assert(l2.length == 10 + 3 * (144 * 192000 / 44100))
    // a bitrate valid only in the other layer's column is rejected
    intercept[IllegalArgumentException] {
      encodeMp3(448, 44100, 1, 2, Array.emptyByteArray, layer = 3)
    }
    // a mid-stream layer switch is not one coherent file
    val l3tail = encodeMp3(128, 32000, 1, 2, Array.emptyByteArray).drop(10)
    val l1core = encodeMp3(256, 32000, 1, 2,
      Array.emptyByteArray, layer = 1).drop(10)
    assert(decodeMp3(l1core ++ l3tail).isEmpty)
  }

  test("MP3 with the ubiquitous 128-byte ID3v1 'TAG' trailer decodes; " +
      "a 128-byte non-TAG tail is still a malformed partial frame") {
    val core = encodeMp3(128, 44100, 3, 2, "note".getBytes)
    val id3v1 = "TAG".getBytes ++ new Array[Byte](125)
    assert(decodeMp3(core ++ id3v1).contains(
      Mp3Meta("mpeg1", 128, 44100, 2, 3, 3 * 1152L)))
    val junk = "XXX".getBytes ++ new Array[Byte](125)
    assert(decodeMp3(core ++ junk).isEmpty)
  }

  test("malformed MP3 decodes to None, never throws") {
    val good = encodeMp3(128, 44100, 3, 2, "note".getBytes)
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone; f(c); c
    }
    val firstFrame = 10 + 4 // ID3 header + note
    val cases: Seq[Array[Byte]] = Seq(
      Array.emptyByteArray,
      good.take(firstFrame + 2), // truncated first header
      good.dropRight(1), // trailing partial frame
      mut(b => b(firstFrame) = 0x00), // sync lost
      mut(b => b(firstFrame + 2) = 0xf4.toByte), // bitrate index 15 (bad)
      mut(b => b(firstFrame + 2) = 0x0c.toByte), // free bitrate (0)
      mut(b => b(firstFrame + 2) =
        (b(firstFrame + 2) | 0x0c).toByte), // rate index 3 (reserved)
      mut(b => b(9) = 0x85.toByte)) // non-syncsafe ID3 size byte
    cases.foreach(b => assert(decodeMp3(b).isEmpty,
      s"expected None for ${b.length}-byte mutant"))
  }

  test("FLAC round-trip: packed 20/3/5/36-bit STREAMINFO fields recover " +
      "across rates, channels, depths, and variable-length comments") {
    checkProp(Prop.forAll(Gen.oneOf(8000, 44100, 48000, 96000, 192000),
        Gen.choose(1, 8), Gen.oneOf(8, 16, 20, 24, 32),
        Gen.choose(0L, (1L << 36) - 1), Gen.choose(0, 99)) {
      (rate, ch, bps, total, noteLen) =>
        val blob = encodeFlac(rate, ch, bps, total,
          Array.fill(noteLen)('x'.toByte))
        decodeFlac(blob).contains(FlacMeta(rate, ch, bps, total))
    })
  }

  test("malformed FLAC decodes to None, never throws") {
    val good = encodeFlac(44100, 2, 16, 12345L, "hi".getBytes)
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone; f(c); c
    }
    val cases: Seq[Array[Byte]] = Seq(
      good.take(7), // truncated block header
      good.take(20), // truncated STREAMINFO
      mut(b => b(3) = 'c'.toByte), // bad magic
      mut(b => b(4) = 0x04), // first block not STREAMINFO
      mut { b => b(18) = 0; b(19) = 0; b(20) = 0 }) // sample rate 0
    cases.foreach(b => assert(decodeFlac(b).isEmpty,
      s"expected None for ${b.length}-byte mutant"))
  }

  test("zero channels / zero rate are rejected") {
    val b = encodeWav(1, 8000, 16, 10L, Array.emptyByteArray)
    // channels u16 sits at fmt payload offset 2 -> locate 'fmt ' + 8 + 2
    val fmtIdx = b.indexOfSlice("fmt ".getBytes)
    b(fmtIdx + 10) = 0; b(fmtIdx + 11) = 0
    assert(decodeWav(b).isEmpty)
  }

  test("Ogg/Opus round-trip: pages, CRCs, lacing, pre-skip granule base") {
    checkProp(Prop.forAll(Gen.choose(1, 8), Gen.choose(0, 0xffff),
        Gen.oneOf(8000, 44100, 48000), Gen.choose(1, 9),
        Gen.choose(0, 700)) { (ch, preSkip, rate, nData, noteLen) =>
      val blob = encodeOggOpus(ch, preSkip, rate, nData, 960L,
        Array.fill(noteLen)('y'.toByte))
      decodeOgg(blob).contains(OggMeta("opus", ch, rate, preSkip,
        2L + nData, 960L * nData))
    })
  }

  test("Ogg/Vorbis round-trip incl. 255-multiple comment lengths " +
      "(zero-valued final lacing byte)") {
    for (noteLen <- Seq(0, 254, 255, 510, 1000); nData <- Seq(1, 4)) {
      val blob = encodeOggVorbis(2, 44100, nData, 1024L,
        Array.fill(noteLen)('z'.toByte))
      assert(decodeOgg(blob).contains(
        OggMeta("vorbis", 2, 44100, 0, 2L + nData, 1024L * nData)),
        s"noteLen=$noteLen nData=$nData")
    }
  }

  test("Ogg rejects CRC corruption, lost pages, wrong magic, truncation") {
    val good = encodeOggOpus(2, 312, 48000, 3, 960L, "note".getBytes)
    def mut(f: Array[Byte] => Unit): Array[Byte] = {
      val c = good.clone; f(c); c
    }
    val cases: Seq[(String, Array[Byte])] = Seq(
      "flipped payload bit breaks page CRC" ->
        mut(b => b(40) = (b(40) ^ 0x01).toByte),
      "bad capture pattern" -> mut(b => b(0) = 'X'.toByte),
      "nonzero stream version" -> mut(b => b(4) = 1),
      "truncated mid-page" -> good.dropRight(3),
      "trailing junk after EOS" -> (good ++ Array[Byte](0, 1, 2)),
      "first page not BOS" -> mut(b => b(5) = 0x00),
      "empty" -> Array.emptyByteArray)
    cases.foreach { case (why, b) =>
      assert(decodeOgg(b).isEmpty, why)
    }
    // a dropped middle page breaks the sequence-number chain
    val pageStarts = good.indices.filter(i => i + 3 < good.length &&
      good(i) == 'O' && good(i + 1) == 'g' && good(i + 2) == 'g' &&
      good(i + 3) == 'S')
    assert(pageStarts.length == 5) // id + comment + 3 data
    val lost = good.take(pageStarts(1)) ++ good.drop(pageStarts(2))
    assert(decodeOgg(lost).isEmpty, "lost page must be detected")
  }

  test("Ogg rejects a foreign codec id payload and a bad version — " +
      "with valid page CRCs, so the ID gate itself is exercised") {
    // independent reimplementation of the RFC 3533 CRC (poly 0x04c11db7,
    // no reflection): mutants get a VALID checksum so rejection can only
    // come from the identification-header checks, and agreement here
    // cross-checks the library's own CRC
    def reCrc(page: Array[Byte], off: Int, len: Int): Unit = {
      var i = 0
      while (i < 4) { page(off + 22 + i) = 0; i += 1 }
      var crc = 0
      i = 0
      while (i < len) {
        crc ^= (page(off + i) & 0xff) << 24
        var k = 0
        while (k < 8) {
          crc = if ((crc & 0x80000000) != 0) (crc << 1) ^ 0x04c11db7
          else crc << 1
          k += 1
        }
        i += 1
      }
      i = 0
      while (i < 4) {
        page(off + 22 + i) = ((crc >> (8 * i)) & 0xff).toByte; i += 1
      }
    }
    // vorbis stream, page 0 = 27 hdr + 1 lacing + 30 payload = 58 bytes
    def vorbisMut(f: Array[Byte] => Unit): Array[Byte] = {
      val b = encodeOggVorbis(2, 44100, 1, 1024L, Array.emptyByteArray)
      f(b); reCrc(b, 0, 58); b
    }
    val untouched = vorbisMut(_ => ()) // reCrc must be a no-op on a good page
    assert(decodeOgg(untouched).nonEmpty, "test CRC disagrees with library")
    // version field at payload offset 7 (absolute 28 + 7)
    assert(decodeOgg(vorbisMut(b => b(35) = 9)).isEmpty,
      "nonzero vorbis version accepted")
    // foreign codec magic: overwrite 'vorbis' with 'speex ' (id byte 1
    // stays) — structurally a fine stream, but not a codec we sniff
    assert(decodeOgg(vorbisMut { b =>
      "speex ".getBytes("US-ASCII").copyToArray(b, 29)
    }).isEmpty, "unknown codec id accepted")
    // opus stream, page 0 = 27 + 1 + 19 = 47 bytes; OpusHead version at
    // payload offset 8 (absolute 36)
    val opus = encodeOggOpus(2, 0, 48000, 1, 960L, Array.emptyByteArray)
    opus(36) = 2
    reCrc(opus, 0, 47)
    assert(decodeOgg(opus).isEmpty, "OpusHead version 2 accepted")
  }

  // ----- Vorbis comments across the Xiph family (round 14) -------------

  private val tagSet = Seq("ARTIST" -> "Someone", "TITLE" -> "A Song",
    "ALBUM" -> "An Album", "DATE" -> "1999")

  test("Vorbis-comment round-trip: FLAC, Ogg Opus, Ogg Vorbis") {
    val body = vorbisCommentBody("vend0r", tagSet)
    val flac = encodeFlac(44100, 2, 16, 12345L, body)
    val opus = encodeOggOpus(2, 312, 48000, 1, 960L,
      opusTagsPacket("vend0r", tagSet))
    val vorb = encodeOggVorbis(2, 44100, 1, 1024L,
      vorbisCommentPacket("vend0r", tagSet))
    Seq("flac" -> flac, "opus" -> opus, "vorbis" -> vorb).foreach {
      case (container, blob) =>
        val t = decodeAudioTags(blob).get
        assert(t.container === container)
        assert(t.vendor === "vend0r")
        assert(t.nComments === 4)
        assert(t.fields === Map("ARTIST" -> "Someone", "TITLE" -> "A Song",
          "ALBUM" -> "An Album", "DATE" -> "1999"))
        // the tag walk must not break the existing header sniffs
        if (container == "flac") assert(decodeFlac(blob).nonEmpty)
        else assert(decodeOgg(blob).nonEmpty)
    }
  }

  test("repeated keys keep the FIRST value; keys are case-insensitive") {
    val t = decodeAudioTags(encodeFlac(48000, 1, 16, 1L,
      vorbisCommentBody("v", Seq("Artist" -> "first", "ARTIST" -> "second",
        "tracknumber" -> "7")))).get
    assert(t.nComments === 3)
    assert(t.fields("ARTIST") === "first")
    assert(t.fields("TRACKNUMBER") === "7")
  }

  test("UTF-8 values and '=' inside the value survive") {
    val t = decodeAudioTags(encodeFlac(48000, 1, 16, 1L,
      vorbisCommentBody("v", Seq("TITLE" -> "naïve = héroïque")))).get
    assert(t.fields("TITLE") === "naïve = héroïque")
  }

  test("untagged or damaged streams yield None, never a fabricated tag set") {
    // WAV has no vorbis comments at all
    assert(decodeAudioTags(encodeWav(2, 44100, 16, 100L,
      Array.emptyByteArray)) === None)
    // vorbis comment packet with a cleared framing bit
    val pkt = vorbisCommentPacket("v", tagSet)
    pkt(pkt.length - 1) = 0
    assert(decodeAudioTags(encodeOggVorbis(2, 44100, 1, 1024L, pkt)) === None)
    // opus comment page whose payload is not OpusTags
    assert(decodeAudioTags(encodeOggOpus(2, 0, 48000, 1, 960L,
      "NotTags!".getBytes("US-ASCII"))) === None)
    // truncation sweep must never throw
    val flac = encodeFlac(44100, 2, 16, 9L, vorbisCommentBody("v", tagSet))
    (1 until flac.length by 3).foreach(n => decodeAudioTags(flac.take(n)))
    assert(decodeAudioTags(flac.take(flac.length - 2)) === None)
    // declared comment length past the buffer (hostile u32)
    val hostile = encodeFlac(44100, 2, 16, 9L,
      vorbisCommentBody("v", Seq("A" -> "b")))
    // body starts at 4 + 4 + 34 + 4 = 46; vendor len 1 -> comment count
    // at 51, first comment length at 55
    hostile(55) = 0xff.toByte; hostile(56) = 0xff.toByte
    assert(decodeAudioTags(hostile) === None)
  }

  test("comment packet spanning pages (final lacing 255) is rejected, " +
      "not mis-sliced") {
    // a 255-byte payload laces as [255, 0] — complete in one page; the
    // walker accepts it. Forge the CONTINUED shape by truncating the
    // lacing table to the single 255 entry.
    val body = opusTagsPacket("v", tagSet)
    val blob = encodeOggOpus(2, 0, 48000, 1, 960L, body)
    assert(decodeAudioTags(blob).nonEmpty)
    // second page starts at 47; its lacing table declares the packet;
    // overwrite nSegs to 1 with lacing 255 -> continued packet
    val forged = blob.clone()
    forged(47 + 26) = 1
    forged(47 + 27) = 0xff.toByte
    assert(decodeAudioTags(forged) === None)
  }
}

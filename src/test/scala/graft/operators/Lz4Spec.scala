package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class Lz4Spec extends AnyFunSuite {

  test("xxh32 matches the published test vectors") {
    assert(Compression.xxh32(Array.emptyByteArray, 0, 0) == 0x02cc5d05)
    assert(Compression.xxh32("a".getBytes, 0, 1) == 0x550d7456)
    assert(Compression.xxh32("abc".getBytes, 0, 3) == 0x32d153ff)
    // >16 bytes exercises the 4-lane stripe loop
    assert(Compression.xxh32(
      "Nobody inspects the spammish repetition".getBytes, 0, 39) ==
      0xe2293b2f)
    assert(Compression.xxh32("a".getBytes, 0, 1, seed = 1) != 0x550d7456)
  }

  test("lz4 frame round-trip: content size, block-max sweep") {
    for (code <- 4 to 7; withSize <- Seq(true, false)) {
      val blob = Compression.encodeLz4(Array.fill(100)('x'.toByte),
        blockMaxCode = code, withContentSize = withSize)
      val m = Compression.decodeLz4Header(blob).get
      assert(m.blockMaxKb == (64 << ((code - 4) * 2)))
      assert(m.contentSize == (if (withSize) Some(100L) else None))
      assert(!m.blockChecksums)
    }
  }

  test("lz4: forged header checksum, bad version, reserved bits reject") {
    val good = Compression.encodeLz4("payload".getBytes)
    val forged = good.clone
    forged(14) = (forged(14) ^ 1).toByte // HC byte (4+2+8 descriptor)
    assert(Compression.decodeLz4Header(forged).isEmpty)
    val badVer = good.clone
    badVer(4) = (badVer(4) ^ 0x80).toByte // version bits 10
    assert(Compression.decodeLz4Header(badVer).isEmpty)
    val badBd = good.clone
    badBd(5) = (badBd(5) | 0x01).toByte // BD reserved bit
    assert(Compression.decodeLz4Header(badBd).isEmpty)
    assert(Compression.decodeLz4Header(null).isEmpty)
    assert(Compression.decodeLz4Header("not lz4 data".getBytes).isEmpty)
    assert(Compression.decodeLz4Header(
      java.util.Arrays.copyOf(good, 6)).isEmpty) // torn descriptor
  }
}

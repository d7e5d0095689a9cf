package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Bencode._

class BencodeSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 80): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("torrent round-trip: single- and multi-file, piece arithmetic") {
    checkProp(Prop.forAll(Gen.choose(1L, 8L), Gen.choose(0L, 2000000L),
        Gen.choose(1, 5), Gen.choose(0L, 99999L)) {
      (plExp, size0, nFiles, seed) =>
        val pl = 16384L << plExp
        val sizes = (0 until nFiles).map(k => size0 + k * 7919L)
        val blob = encodeTorrent("udp://t.example.test:6969/ann",
          s"dataset-$seed", pl, sizes, seed)
        val total = sizes.sum
        val nPieces = if (total == 0) 0 else ((total + pl - 1) / pl).toInt
        decodeTorrent(blob).contains(TorrentMeta(
          Some("udp://t.example.test:6969/ann"), s"dataset-$seed", pl,
          nPieces, total, nFiles))
    })
  }

  test("bencode strictness: leading zeros, -0, unsorted or non-string " +
      "keys, trailing bytes all reject") {
    assert(parse("i03e".getBytes) === None)
    assert(parse("i-0e".getBytes) === None)
    assert(parse("i12e".getBytes).contains(BInt(12L)))
    assert(parse("i-7e".getBytes).contains(BInt(-7L)))
    assert(parse("d1:bi1e1:ai2ee".getBytes) === None) // b before a
    assert(parse("d1:ai1e1:ai2ee".getBytes) === None) // duplicate key
    assert(parse("di1ei2ee".getBytes) === None) // int key
    assert(parse("le ".getBytes) === None) // trailing byte
    assert(parse("03:abc".getBytes) === None) // zero-led length
    assert(parse("l4:spami42ee".getBytes).contains(
      BList(Seq(BStr("spam".getBytes), BInt(42L)))) === false)
    // (BStr holds arrays: compare piecewise instead)
    parse("l4:spami42ee".getBytes) match {
      case Some(BList(Seq(BStr(s), BInt(v)))) =>
        assert(new String(s, "UTF-8") === "spam" && v === 42L)
      case other => fail(other.toString)
    }
  }

  test("metainfo structural rejects") {
    val good = encodeTorrent("http://a.test/ann", "n", 16384L,
      Seq(50000L), 1L)
    assert(decodeTorrent(null) === None)
    assert(decodeTorrent("d4:spam4:eggse".getBytes) === None) // no info
    // truncation sweep: never a throw
    (1 until good.length by 3).foreach(n => decodeTorrent(good.take(n)))
    assert(decodeTorrent(good.take(good.length - 1)) === None)
    // a pieces string that is not a whole number of SHA-1 entries
    val s = new String(good, "ISO-8859-1")
    val pAt = s.indexOf("6:pieces")
    assert(pAt > 0)
    val lenAt = pAt + "6:pieces".length
    val colon = s.indexOf(':', lenAt)
    val declared = s.substring(lenAt, colon).toInt
    assert(declared % 20 === 0)
    // piece count inconsistent with total size also rejects: shrink
    // the payload by one whole 20-byte entry and redeclare
    val head = good.take(lenAt)
    val tail = good.drop(colon + 1)
    val shrunk = head ++ s"${declared - 20}:".getBytes("ISO-8859-1") ++
      tail.dropRight(1).take(declared - 20) ++ Array[Byte]('e', 'e')
    assert(decodeTorrent(shrunk) === None)
    // zero-size payload: zero pieces, decodes
    val empty = encodeTorrent("http://a.test/ann", "e", 16384L,
      Seq(0L), 2L)
    assert(decodeTorrent(empty).exists(m =>
      m.nPieces == 0 && m.totalSize == 0L))
  }

  test("multi-file sizes sum in Long without overflow surprises") {
    val big = 3_000_000_000L // each beyond Int range
    val m = decodeTorrent(encodeTorrent("http://a.test/x", "big",
      1L << 22, Seq(big, big, big), 3L)).get
    assert(m.totalSize === 9_000_000_000L)
    assert(m.nFiles === 3)
    assert(m.nPieces === ((9_000_000_000L + (1L << 22) - 1) / (1L << 22)).toInt)
  }
}

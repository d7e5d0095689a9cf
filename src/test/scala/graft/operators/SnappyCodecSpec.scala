package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import SnappyCodec._

/** Snappy conformance, refereed by snappy-java (the JNI binding of
  * the reference implementation, already on the Spark classpath):
  * reference encodings decode byte-exactly through our raw decoder,
  * and our raw/framed encodings round-trip through the reference
  * the other direction. */
class SnappyCodecSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def payload(kind: Int, n: Int, seed: Long): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    kind match {
      case 0 => Array.fill(n)(rnd.nextInt(256).toByte)
      case 1 => // compressible text
        val words = Seq("the", "of", "and", "data", "snappy", "copy")
        Iterator.continually(words(rnd.nextInt(words.length)) + " ")
          .flatMap(_.getBytes("UTF-8")).take(n).toArray
      case 2 => Array.fill(n)('z'.toByte) // max-overlap runs
      case _ => Array.tabulate(n)(i => ((i * 31 + seed) & 0xff).toByte)
    }
  }

  test("reference raw encodings decode byte-exactly (all payload " +
      "kinds and sizes, incl. empty and multi-copy streams)") {
    checkProp(Prop.forAll(Gen.choose(0, 3), Gen.choose(0, 120000),
        Gen.choose(0L, 9999L)) { (kind, n, seed) =>
      val data = payload(kind, n, seed)
      val comp = org.xerial.snappy.Snappy.compress(data)
      decompressRaw(comp, n + 16).exists(_.sameElements(data))
    })
  }

  test("own raw encodings are accepted by the reference, both the " +
      "literal runs and the offset-1 self-overlap copy shape") {
    checkProp(Prop.forAll(Gen.choose(0, 3), Gen.choose(0, 70000),
        Gen.choose(0L, 9999L), Gen.oneOf(true, false)) {
      (kind, n, seed, overlap) =>
        val data = payload(kind, n, seed)
        val mine = compressRawLiteral(data, selfOverlap = overlap)
        org.xerial.snappy.Snappy.uncompress(mine).sameElements(data) &&
          decompressRaw(mine, n + 16).exists(_.sameElements(data))
    })
  }

  test("framed streams round-trip: identifier, compressed + " +
      "uncompressed chunks, masked CRC-32C, padding chunks") {
    checkProp(Prop.forAll(Gen.choose(0, 3), Gen.choose(0, 200000),
        Gen.choose(0L, 9999L)) { (kind, n, seed) =>
      val data = payload(kind, n, seed)
      decompressFramed(compressFramed(data), n + 16)
        .exists(_.sameElements(data))
    })
  }

  test("malformed streams reject: torn varint, short stream, copy " +
      "before start, bad CRC, reserved chunk, trailing garbage") {
    val data = payload(1, 5000, 7L)
    val raw = org.xerial.snappy.Snappy.compress(data)
    assert(decompressRaw(raw.take(raw.length - 1), 1 << 20) === None)
    assert(decompressRaw(Array[Byte](0x7f.toByte), 1 << 20) === None)
    assert(decompressRaw(null, 10) === None)
    // a copy reaching before the start of output
    assert(decompressRaw(Array[Byte](4, 9, 1, 0), 16) === None)
    // output cap honors
    assert(decompressRaw(raw, data.length - 1) === None)
    // truncation sweep never throws
    (1 until raw.length by 7).foreach(k => decompressRaw(raw.take(k), 1 << 20))
    val framed = compressFramed(data)
    (1 until framed.length by 7).foreach(k =>
      decompressFramed(framed.take(k), 1 << 20))
    // CRC flip rejects (chunk payloads start after identifier at 10)
    val bad = framed.clone
    bad(14) = (bad(14) ^ 1).toByte
    assert(decompressFramed(bad, 1 << 20) === None)
    // reserved unskippable chunk type rejects
    val reserved = framed.clone
    reserved(10) = 0x02
    assert(decompressFramed(reserved, 1 << 20) === None)
    // a stream not led by the identifier rejects
    assert(decompressFramed(framed.drop(10), 1 << 20) === None)
    assert(decompressFramed(Array.emptyByteArray, 10) === None)
  }
}

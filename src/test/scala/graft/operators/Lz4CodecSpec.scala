package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import net.jpountz.lz4.{LZ4Factory, LZ4FrameInputStream, LZ4FrameOutputStream}

import Lz4Codec._

/** LZ4 conformance, refereed by lz4-java (the implementation Spark's
  * own shuffle codec uses): reference frames and raw blocks from both
  * the fast and high compressors decode byte-exactly, and this file's
  * literal frames are accepted by the reference the other
  * direction. */
class Lz4CodecSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def payload(kind: Int, n: Int, seed: Long): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    kind match {
      case 0 => Array.fill(n)(rnd.nextInt(256).toByte)
      case 1 =>
        val words = Seq("the", "of", "and", "token", "match", "copy")
        Iterator.continually(words(rnd.nextInt(words.length)) + " ")
          .flatMap(_.getBytes("UTF-8")).take(n).toArray
      case 2 => Array.fill(n)('z'.toByte) // offset-1 overlap runs
      case _ => Array.tabulate(n)(i => ((i * 31 + seed) & 0xff).toByte)
    }
  }

  test("reference raw BLOCKS decode byte-exactly, fast and high " +
      "compressors, all payload kinds") {
    val factory = LZ4Factory.safeInstance()
    checkProp(Prop.forAll(Gen.choose(0, 3), Gen.choose(0, 150000),
        Gen.choose(0L, 9999L), Gen.oneOf(true, false)) {
      (kind, n, seed, high) =>
        val data = payload(kind, n, seed)
        val comp =
          if (high) factory.highCompressor().compress(data)
          else factory.fastCompressor().compress(data)
        lz4DecompressBlock(comp, 0, comp.length)
          .exists(_.sameElements(data))
    })
  }

  test("reference FRAMES decode; own literal frames accepted by the " +
      "reference and by our own frame walk") {
    checkProp(Prop.forAll(Gen.choose(0, 3), Gen.choose(0, 200000),
        Gen.choose(0L, 9999L)) { (kind, n, seed) =>
      val data = payload(kind, n, seed)
      val bos = new ByteArrayOutputStream()
      val w = new LZ4FrameOutputStream(bos)
      w.write(data); w.close()
      val refFrame = bos.toByteArray
      val mine = encodeLz4Literal(data, contentChecksum = true,
        blockChecksums = true)
      val refRead = {
        val in = new LZ4FrameInputStream(new ByteArrayInputStream(mine))
        val out = new ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        var k = in.read(buf)
        while (k >= 0) { out.write(buf, 0, k); k = in.read(buf) }
        in.close()
        out.toByteArray
      }
      lz4Decompress(refFrame).exists(_.sameElements(data)) &&
        lz4Decompress(mine).exists(_.sameElements(data)) &&
        refRead.sameElements(data)
    }, n = 30)
  }

  test("frame features: skippable frames hop, concatenated frames " +
      "append, the uncompressed-block emitter still decodes") {
    val a = payload(1, 9000, 1L)
    val b = payload(0, 700, 2L)
    val skip = {
      val out = new ByteArrayOutputStream()
      out.write(Array[Byte](0x50, 0x2a, 0x4d, 0x18.toByte))
      out.write(Array[Byte](4, 0, 0, 0)); out.write(Array[Byte](9, 9, 9, 9))
      out.toByteArray
    }
    val cat = encodeLz4Literal(a) ++ skip ++ Compression.encodeLz4(b)
    assert(lz4Decompress(cat).exists(_.sameElements(a ++ b)))
  }

  test("hostile input: every-byte flip on a checksummed frame never " +
      "yields wrong bytes; truncation sweep; structural junk") {
    val data = payload(1, 3000, 7L)
    val enc = encodeLz4Literal(data, contentChecksum = true,
      blockChecksums = true)
    (0 until enc.length).foreach { k =>
      val bad = enc.clone()
      bad(k) = (bad(k) ^ 0x01).toByte
      lz4Decompress(bad) match {
        case None      =>
        case Some(got) => assert(got.sameElements(data), s"flip@$k")
      }
    }
    (0 until enc.length by 3).foreach(k => lz4Decompress(enc.take(k)))
    assert(lz4Decompress(null).isEmpty)
    assert(lz4Decompress("no magic here!!".getBytes).isEmpty)
    // a match offset reaching before the start of output
    assert(lz4DecompressBlock(Array[Byte](0x10, 'a', 5, 0), 0, 4).isEmpty)
    // offset zero
    assert(lz4DecompressBlock(Array[Byte](0x10, 'a', 0, 0), 0, 4).isEmpty)
  }
}

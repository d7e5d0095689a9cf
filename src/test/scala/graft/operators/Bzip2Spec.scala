package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import org.apache.hadoop.io.compress.bzip2.{CBZip2InputStream, CBZip2OutputStream}

import Bzip2._

/** bzip2 conformance, refereed three ways: Hadoop's pure-Java CBZip2
  * streams (the codec Spark itself uses for .bz2 splits — NB these
  * omit the leading "BZ" magic, per their contract), the in-container
  * `bzip2` CLI (libbz2), and our own property round-trips. Both
  * directions everywhere: reference encodings through this decoder,
  * this encoder's streams through the references. */
class Bzip2Spec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def payload(kind: Int, n: Int, seed: Long): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    kind match {
      case 0 => Array.fill(n)(rnd.nextInt(256).toByte)
      case 1 =>
        val words = Seq("the", "of", "and", "burrows", "wheeler", "move")
        Iterator.continually(words(rnd.nextInt(words.length)) + " ")
          .flatMap(_.getBytes("UTF-8")).take(n).toArray
      case 2 => Array.fill(n)('z'.toByte) // RLE1 + periodic-BWT stress
      case _ => Array.tabulate(n)(i => ((i * 31 + seed) & 0xff).toByte)
    }
  }

  private def hadoopEncode(data: Array[Byte], level: Int): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    bos.write('B'); bos.write('Z') // CBZip2OutputStream omits the magic
    val z = new CBZip2OutputStream(bos, level)
    z.write(data)
    z.close()
    bos.toByteArray
  }

  private def hadoopDecode(b: Array[Byte]): Array[Byte] = {
    // CBZip2InputStream expects the stream AFTER the "BZ" magic
    val in = new CBZip2InputStream(
      new ByteArrayInputStream(b, 2, b.length - 2))
    val bos = new ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    in.close()
    bos.toByteArray
  }

  test("hadoop reference encodings decode byte-exactly across levels " +
      "and payload kinds, including multi-block at level 1") {
    checkProp(Prop.forAll(Gen.choose(0, 3), Gen.choose(0, 60000),
        Gen.choose(0L, 9999L), Gen.oneOf(1, 5, 9)) {
      (kind, n, seed, level) =>
        val data = payload(kind, n, seed)
        bunzip2(hadoopEncode(data, level)).exists(_.sameElements(data))
    })
    // multi-block: 300 KB at level 1 (100k blocks)
    val big = payload(1, 300000, 3L)
    assert(bunzip2(hadoopEncode(big, 1)).exists(_.sameElements(big)))
    // pinned regression: highly repetitive payloads make the hadoop
    // encoder emit legacy RANDOMISED blocks — derandomization path
    val zrun = payload(2, 29390, 3104L)
    assert(bunzip2(hadoopEncode(zrun, 9)).exists(_.sameElements(zrun)))
    val pat = payload(3, 29390, 0L)
    assert(bunzip2(hadoopEncode(pat, 1)).exists(_.sameElements(pat)))
  }

  test("own encodings are accepted by the hadoop reference and decode " +
      "through our own decoder, all levels and payload kinds") {
    checkProp(Prop.forAll(Gen.choose(0, 3), Gen.choose(0, 40000),
        Gen.choose(0L, 9999L), Gen.oneOf(1, 3, 9)) {
      (kind, n, seed, level) =>
        val data = payload(kind, n, seed)
        val mine = bzip2Compress(data, level)
        hadoopDecode(mine).sameElements(data) &&
          bunzip2(mine).exists(_.sameElements(data))
    }, n = 25)
    // multi-block own encode: 250 KB of text at level 1
    val big = payload(1, 250000, 8L)
    val mine = bzip2Compress(big, 1)
    assert(hadoopDecode(mine).sameElements(big))
    assert(bunzip2(mine).exists(_.sameElements(big)))
  }

  test("CLI referee when present: bzip2 -1/-9 output decodes; own " +
      "output survives bzip2 -d") {
    val bin = new java.io.File("/root/miniconda/bin/bzip2")
    assume(bin.canExecute, "bzip2 CLI not in container")
    val dir = java.nio.file.Files.createTempDirectory("bz2ref")
    def run(args: String*): Int = {
      val pb = new ProcessBuilder((bin.getAbsolutePath +: args): _*)
      pb.inheritIO(); pb.start().waitFor()
    }
    Seq(("-1", 0, 120000), ("-9", 1, 60000)).foreach { case (flag, kind, n) =>
      val data = payload(kind, n, 42L)
      val raw = dir.resolve(s"a$flag".replace("-", "m"))
      java.nio.file.Files.write(raw, data)
      assert(run(flag, "-k", raw.toString) == 0)
      val enc = java.nio.file.Files
        .readAllBytes(java.nio.file.Path.of(raw.toString + ".bz2"))
      assert(bunzip2(enc).exists(_.sameElements(data)), flag)
    }
    val data = payload(1, 50000, 7L)
    val mf = dir.resolve("b.bz2")
    java.nio.file.Files.write(mf, bzip2Compress(data, 4))
    assert(run("-d", "-k", mf.toString) == 0)
    assert(java.nio.file.Files.readAllBytes(dir.resolve("b"))
      .sameElements(data))
  }

  test("concatenated streams decode in sequence (the pbzip2 layout)") {
    val a = payload(1, 9000, 1L)
    val b = payload(0, 700, 2L)
    val cat = bzip2Compress(a, 2) ++ hadoopEncode(b, 9)
    assert(bunzip2(cat).exists(_.sameElements(a ++ b)))
  }

  test("empty input: canonical zero-block stream both ways") {
    val mine = bzip2Compress(Array.emptyByteArray)
    assert(bunzip2(mine).exists(_.isEmpty))
    assert(hadoopEncode(Array.emptyByteArray, 9).length > 4)
    assert(bunzip2(hadoopEncode(Array.emptyByteArray, 9)).exists(_.isEmpty))
  }

  test("RLE1 edge cases round-trip: runs of exactly 4, 255+4, 259, " +
      "and runs crossing the count-byte boundary") {
    Seq(4, 5, 8, 259, 260, 263, 1000).foreach { runLen =>
      val data = ("ab" * 3).getBytes ++ Array.fill(runLen)('q'.toByte) ++
        "tail".getBytes
      val mine = bzip2Compress(data, 1)
      assert(bunzip2(mine).exists(_.sameElements(data)), s"run=$runLen")
      assert(hadoopDecode(mine).sameElements(data), s"run=$runLen hadoop")
      assert(bunzip2(hadoopEncode(data, 1)).exists(_.sameElements(data)),
        s"run=$runLen ref-enc")
    }
  }

  test("hostile input: flip sweep never yields WRONG bytes (padding " +
      "bits after the final CRC are dead by design), truncation sweep " +
      "never throws, structural junk rejects") {
    val data = payload(1, 4000, 7L)
    val enc = bzip2Compress(data, 3)
    (0 until enc.length).foreach { k =>
      val bad = enc.clone()
      bad(k) = (bad(k) ^ 0x01).toByte
      bunzip2(bad) match {
        case None      => // rejected
        case Some(got) =>
          assert(got.sameElements(data), s"flip@$k yielded wrong bytes")
      }
    }
    (0 until enc.length by 3).foreach(k => bunzip2(enc.take(k)))
    assert(bunzip2(null).isEmpty)
    assert(bunzip2(Array.emptyByteArray).isEmpty)
    assert(bunzip2("BZh9junkjunkjunk".getBytes).isEmpty)
    assert(bunzip2("BZh0".getBytes ++ enc.drop(4)).isEmpty) // bad level
    // combined-CRC flip (last 4 bytes hold it, possibly bit-shifted):
    // already covered by the sweep, but assert the tail region too
    val tail = enc.clone()
    tail(enc.length - 1) = (tail(enc.length - 1) ^ 0x80).toByte
    val r = bunzip2(tail)
    assert(r.isEmpty || r.exists(_.sameElements(data)))
  }
}

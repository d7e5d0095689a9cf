package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** One-off offline sweep over /tmp/brotli_sweep referee vectors
  * (builder iteration only; cancels when the directory is absent). */
class BrotliSweep extends AnyFunSuite {
  test("offline randomized referee sweep") {
    val dir = new java.io.File("/tmp/brotli_sweep")
    assume(dir.isDirectory, "no sweep vectors")
    val n = dir.listFiles().count(_.getName.endsWith(".br"))
    var bad = List.empty[Int]
    (0 until n).foreach { i =>
      val comp = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, s"$i.br").toPath)
      val want = java.nio.file.Files.readAllBytes(
        new java.io.File(dir, s"$i.raw").toPath)
      val got = Brotli.decompress(comp, 1 << 24)
      if (!got.exists(_.sameElements(want))) bad ::= i
    }
    assert(bad.isEmpty, s"failed vectors: ${bad.sorted.mkString(",")}")
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Epub._

class EpubSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("EPUB round-trip across chapter counts and metadata") {
    checkProp(Prop.forAll(Gen.alphaNumStr.suchThat(_.nonEmpty),
        Gen.choose(1, 12)) { (word, n) =>
      val m = decodeEpub(encodeEpub(s"T & <$word>", s"A $word", "en",
        s"urn:$word", n)).get
      m.title.contains(s"T & <$word>") && m.creator.contains(s"A $word") &&
        m.language.contains("en") && m.identifier.contains(s"urn:$word") &&
        m.nManifest == n && m.nSpine == n && m.nEntries == 3 + n &&
        m.mimetypeOk
    })
  }

  test("JDK referee: java.util.zip reads our EPUB and the mimetype " +
      "entry is STORED first") {
    val blob = encodeEpub("t", "a", "en", "u", 2)
    val zin = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(blob))
    val first = zin.getNextEntry
    assert(first.getName === "mimetype")
    assert(first.getMethod === java.util.zip.ZipEntry.STORED)
    var names = List(first.getName)
    var e = zin.getNextEntry
    while (e != null) { names ::= e.getName; e = zin.getNextEntry }
    zin.close()
    assert(names.length === 5)
  }

  test("deflated mimetype fails conformance but metadata still extracts") {
    // rebuild with the mimetype entry deflated
    val blob = Archive.encodeZip(Seq(
      ("mimetype", "application/epub+zip".getBytes("US-ASCII"), true)) ++
      reencodedTail)
    val m = decodeEpub(blob).get
    assert(!m.mimetypeOk)
    assert(m.title.contains("t"))
  }

  private def reencodedTail: Seq[(String, Array[Byte], Boolean)] = {
    val good = encodeEpub("t", "a", "en", "u", 1)
    val entries = Archive.zipEntries(good).get.filter(_.name != "mimetype")
    entries.map(e => (e.name, Archive.unzipEntry(good, e).get, true))
  }

  test("zips that are not EPUBs reject") {
    assert(decodeEpub(null) === None)
    assert(decodeEpub("PK but not really".getBytes) === None)
    // a zip without container.xml
    assert(decodeEpub(Archive.encodeZip(Seq(
      ("a.txt", "x".getBytes, false)))) === None)
    // container.xml without a rootfile
    assert(decodeEpub(Archive.encodeZip(Seq(
      ("META-INF/container.xml", "<container/>".getBytes, false)))) === None)
    // rootfile pointing at a missing OPF
    assert(decodeEpub(Archive.encodeZip(Seq(
      ("META-INF/container.xml",
        """<rootfile full-path="gone.opf"/>""".getBytes, false)))) === None)
    // truncation sweep
    val good = encodeEpub("t", "a", "en", "u", 2)
    (1 until good.length by 11).foreach(n => decodeEpub(good.take(n)))
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Dicom._

class DicomSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("Part 10 round-trip across dims, names, and pixel stub sizes") {
    checkProp(Prop.forAll(Gen.choose(1, 65535), Gen.choose(1, 65535),
        Gen.alphaNumStr.suchThat(_.nonEmpty), Gen.choose(0, 100)) {
      (rows, cols, name, halfPix) =>
        val m = decodeDicom(encodeDicom("1.2.840.10008.5.1.4.1.1.2",
          "CT", s"A^$name", rows, cols, halfPix * 2)).get
        m.transferSyntax == ExplicitVrLe &&
          m.mediaSopClass.contains("1.2.840.10008.5.1.4.1.1.2") &&
          m.modality.contains("CT") && m.rows.contains(rows) &&
          m.cols.contains(cols) && m.patientName.contains(s"A^$name") &&
          m.nElements == 8
    })
  }

  test("odd-length values pad per VR and unpad on read") {
    // 'MRI' is 3 chars (space-padded CS); patient of odd length too
    val m = decodeDicom(encodeDicom("1.2.840.10008.5.1.4.1.1.4",
      "MRI", "Odd", 10, 10, 0)).get
    assert(m.modality.contains("MRI"))
    assert(m.patientName.contains("Odd"))
  }

  test("missing DICM magic, bad meta, and truncation reject") {
    val good = encodeDicom("1.2.840.10008.5.1.4.1.1.2", "CT", "P", 5, 5, 4)
    assert(decodeDicom(null) === None)
    assert(decodeDicom(good.take(100)) === None)
    val noMagic = good.clone; noMagic(128) = 'X'
    assert(decodeDicom(noMagic) === None)
    // meta group-length must be the FIRST element: corrupt its tag
    val badMeta = good.clone; badMeta(132) = 3
    assert(decodeDicom(badMeta) === None)
    // truncation sweep: cut points inside meta, dataset, and pixels
    (133 until good.length by 7).foreach(n => decodeDicom(good.take(n)))
    assert(decodeDicom(good.take(good.length - 1)) === None)
  }

  test("a non-explicit-LE transfer syntax keeps meta, skips the dataset") {
    val good = encodeDicom("1.2.840.10008.5.1.4.1.1.2", "CT", "P", 5, 5, 0)
    // the TS UID value "1.2.840.10008.1.2.1" ends ...2.1; flip the
    // final '1' to '2' => "...1.2.2" (not our explicit-LE UID), then
    // drop the dataset bytes so nothing is mis-walked
    val tsAt = {
      var i = -1
      val pat = ExplicitVrLe.getBytes("US-ASCII")
      var k = 132
      while (i < 0 && k < good.length - pat.length) {
        if (good.slice(k, k + pat.length).sameElements(pat)) i = k
        k += 1
      }
      i
    }
    assert(tsAt > 0)
    val metaEndOnly = good.take(tsAt + ExplicitVrLe.length + 1) // + pad NUL
    val forged = metaEndOnly.clone
    forged(tsAt + ExplicitVrLe.length - 1) = '2'
    val m = decodeDicom(forged).get
    assert(m.transferSyntax === "1.2.840.10008.1.2.2")
    assert(m.modality === None)
    assert(m.nElements === 3) // meta only
  }

  test("an undefined-length element (0xFFFFFFFF: SQ / encapsulated " +
      "pixel data) stops the walk and KEEPS the parsed fields") {
    val good = encodeDicom("1.2.840.10008.5.1.4.1.1.2", "CT", "P", 5, 7, 4)
    // append (0040,A730) SQ with the undefined length marker
    val sq = Array[Byte](0x40, 0x00, 0x30.toByte, 0xA7.toByte,
      'S', 'Q', 0, 0, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte, 0xFF.toByte)
    val m = decodeDicom(good ++ sq).get
    assert(m.modality.contains("CT"))
    assert(m.rows.contains(5) && m.cols.contains(7))
    assert(m.nElements === 8) // the undefined-length element is not counted
    // a torn element (huge DEFINED length) still rejects the file
    val torn = good ++ Array[Byte](0x40, 0x00, 0x30.toByte, 0xA7.toByte,
      'S', 'Q', 0, 0, 0x00, 0x10, 0x00, 0x00)
    assert(decodeDicom(torn) === None)
  }

}

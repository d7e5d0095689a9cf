package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Xlsx._

class XlsxSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("round-trip: shared (plain + rich-run) strings, inline strings, " +
      "numeric sum, multi-sheet totals") {
    checkProp(Prop.forAll(Gen.choose(1, 3), Gen.choose(1, 5),
        Gen.choose(0L, 5000L)) { (nSheets, nRows, seed) =>
      val sheets = (0 until nSheets).map { s =>
        (s"Sheet $s", (0 until nRows).map { r =>
          Seq[Either[String, Long]](
            Left(s"cell <&> $seed-$s-$r"),
            Right(seed + s * 100 + r),
            Left(s"repeat $seed"), // dedups into one shared entry
            Right(r * 7L))
        })
      }
      val m = decodeXlsx(encodeXlsx(sheets)).get
      val expSum = sheets.flatMap(_._2).flatMap(_.collect {
        case Right(v) => v }).sum.toDouble
      val expText = sheets.map(_._2.map(row =>
        row.collect { case Left(s) => s }.mkString("\t"))
        .mkString("\n")).mkString("\n")
      m == XlsxMeta(nSheets, "Sheet 0", nSheets * nRows,
        nSheets * nRows * 4, expSum, expText)
    })
  }

  test("sheet paths resolve through the workbook relationship hop") {
    // the emitter names parts worksheets/sheetN.xml via rIds; decode
    // must follow Id->Target, so sheet ORDER comes from workbook.xml
    val m = decodeXlsx(encodeXlsx(Seq(
      ("alpha", Seq(Seq(Left("a")))),
      ("beta", Seq(Seq(Left("b"), Left("c"))))))).get
    assert(m.firstSheetName === "alpha")
    assert(m.text === "a\nb\tc")
    assert(m.nCells === 3)
  }

  test("an out-of-range shared-string index rejects the file") {
    val good = encodeXlsx(Seq(("s", Seq(Seq(Left("x"), Left("y"))))))
    val entries = Archive.zipEntries(good).get
    val patched = Archive.encodeZip(entries.map { e =>
      val data = Archive.unzipEntry(good, e).get
      val out =
        if (e.name == "xl/worksheets/sheet1.xml")
          new String(data, "UTF-8").replace("<v>0</v>", "<v>99</v>")
            .getBytes("UTF-8")
        else data
      (e.name, out, true)
    })
    assert(decodeXlsx(patched) === None)
  }

  test("a non-numeric payload in a numeric cell is a tear") {
    val good = encodeXlsx(Seq(("s", Seq(Seq(Right(42L))))))
    val entries = Archive.zipEntries(good).get
    val patched = Archive.encodeZip(entries.map { e =>
      val data = Archive.unzipEntry(good, e).get
      val out =
        if (e.name == "xl/worksheets/sheet1.xml")
          new String(data, "UTF-8").replace("<v>42</v>", "<v>oops</v>")
            .getBytes("UTF-8")
        else data
      (e.name, out, true)
    })
    assert(decodeXlsx(patched) === None)
  }

  test("not-spreadsheet zips and truncations reject; docx routes away") {
    assert(decodeXlsx(null) === None)
    assert(decodeXlsx(Docx.encodeDocx("t", "c", Seq("p"))) === None)
    assert(decodeXlsx(Epub.encodeEpub("t", "a", "en", "i", 1)) === None)
    val good = encodeXlsx(Seq(("s", Seq(Seq(Left("x"), Right(1L))))))
    (1 until good.length by 7).foreach(n => decodeXlsx(good.take(n)))
  }
}

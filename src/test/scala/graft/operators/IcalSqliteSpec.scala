package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class IcalSqliteSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ----- iCalendar ----------------------------------------------------

  test("iCal round-trip: folding, TZID params, escapes, min/max starts") {
    val events = Seq(
      ("20200115T100000Z", "short"),
      ("20190301T090000Z", "a much longer summary, with; escapes\nand折"),
      ("20210601T230000Z", "the third one"))
    val m = Ical.decodeIcal(Ical.encodeIcal("-//t//EN", events)).get
    assert(m.prodid.contains("-//t//EN"))
    assert(m.nEvents === 3)
    assert(m.minStart.contains("20190301T090000Z"))
    assert(m.maxStart.contains("20210601T230000Z"))
    assert(m.firstSummary.contains("short"))
  }

  test("iCal property round-trip holds for arbitrary summaries") {
    // values are line-trimmed by the parser, so edge whitespace is out
    // of contract — generate trimmed non-empty summaries
    checkProp(Prop.forAll(
        Gen.asciiPrintableStr.suchThat(s => s.nonEmpty && s.trim == s),
        Gen.choose(1, 9)) { (summary, n) =>
      val events = (0 until n).map(k => (f"2020010${1 + k % 9}T000000Z",
        if (k == 0) summary else "later"))
      Ical.decodeIcal(Ical.encodeIcal("p", events)).exists { m =>
        m.nEvents == n && m.firstSummary.contains(summary)
      }
    })
  }

  test("iCal structural failures reject") {
    assert(Ical.decodeIcal(null) === None)
    assert(Ical.decodeIcal("BEGIN:VCALENDAR\r\nEND:VCALENDAR\r\n"
      .getBytes) === None) // zero events
    assert(Ical.decodeIcal(("BEGIN:VCALENDAR\r\nBEGIN:VEVENT\r\n" +
      "END:VCALENDAR\r\n").getBytes) === None) // unbalanced VEVENT
    val good = Ical.encodeIcal("p", Seq(("20200101T000000Z", "s")))
    assert(Ical.decodeIcal(good.take(good.length - 20)) === None) // no close
    (1 until good.length by 7).foreach(n => Ical.decodeIcal(good.take(n)))
  }

  // ----- SQLite -------------------------------------------------------

  test("SQLite header round-trips across page sizes and encodings") {
    checkProp(Prop.forAll(
        Gen.oneOf(512, 1024, 2048, 4096, 8192, 16384, 32768, 65536),
        Gen.choose(1, 4), Gen.choose(1, 3), Gen.choose(0L, 0xffffffffL)) {
      (ps, np, enc, uv) =>
        val m = Sqlite.decodeSqlite(
          Sqlite.encodeSqlite(ps, np, enc, uv, 7L)).get
        m.pageSize == ps && m.nPages == np &&
          m.userVersion == uv && m.applicationId == 7L &&
          m.fileBytes == ps.toLong * np &&
          m.encoding == Seq("utf8", "utf16le", "utf16be")(enc - 1)
    })
  }

  test("SQLite: truncation, padding, bad page sizes, bad encodings reject") {
    val good = Sqlite.encodeSqlite(1024, 2, 1, 0L, 0L)
    assert(Sqlite.decodeSqlite(good).nonEmpty)
    assert(Sqlite.decodeSqlite(good.take(good.length - 1)) === None)
    assert(Sqlite.decodeSqlite(good ++ Array[Byte](0)) === None)
    assert(Sqlite.decodeSqlite(null) === None)
    assert(Sqlite.decodeSqlite("SQLite format 3".getBytes) === None)
    val badPage = good.clone // 1024 -> 1023 (not a power of two)
    badPage(16) = 0x03; badPage(17) = 0xff.toByte
    assert(Sqlite.decodeSqlite(badPage) === None)
    val badEnc = good.clone
    badEnc(59) = 9
    assert(Sqlite.decodeSqlite(badEnc) === None)
  }
}

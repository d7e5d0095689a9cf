package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class PiiCsvSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------------------ luhn

  test("luhn: known valid and invalid numbers") {
    assert(Pii.luhn("4532015112830366")) // classic Visa test number
    assert(Pii.luhn("79927398713")) // the canonical Luhn example
    assert(!Pii.luhn("79927398714"))
    assert(!Pii.luhn("4532015112830367"))
    assert(!Pii.luhn(""))
    assert(!Pii.luhn(null))
  }

  test("luhn property: exactly one check digit in 0-9 validates") {
    checkProp(Prop.forAll(Gen.listOfN(15, Gen.choose(0, 9))) { ds =>
      val base = ds.mkString
      (0 to 9).count(d => Pii.luhn(base + d)) == 1
    })
  }

  test("scan: length gate 13-19, separators, no merge across words") {
    val t = "a 123456789012 b 1234567890123 c 1234-5678-9012-3456 d 12345678901234567890"
    val spans = Pii.scanCandidates(t)
    // 12 digits too short, 20 too long; the 13 and separated 16 qualify
    assert(spans.map(_.digits) ==
      Vector("1234567890123", "1234567890123456"))
  }

  test("scan: double separator splits the run") {
    val spans = Pii.scanCandidates("1234--5678901234567")
    assert(spans.map(_.digits) == Vector("5678901234567"))
  }

  test("redact masks only validated spans, keeps separators + last 4") {
    val valid = "4532-0151-1283-0366" // grouped valid number
    val invalid = "4532-0151-1283-0367"
    val (red, nc, nv) = Pii.redactValidated(s"x $valid y $invalid z")
    assert(nc == 2 && nv == 1)
    assert(red == "x ####-####-####-0366 y 4532-0151-1283-0367 z")
  }

  // ------------------------------------------------------------- csv

  test("splitLine: RFC 4180 quotes, escaped quote, unterminated") {
    assert(Csv.splitLine("a,b,c", ',')._1 == Vector("a", "b", "c"))
    assert(Csv.splitLine("\"a,b\",c", ',') == (Vector("a,b", "c"), true))
    assert(Csv.splitLine("\"he said \"\"hi\"\"\",x", ',')._1 ==
      Vector("he said \"hi\"", "x"))
    assert(Csv.splitLine("\"open,never", ',')._1 == Vector("open,never"))
    assert(Csv.splitLine("", ',')._1 == Vector(""))
    assert(Csv.splitLine("a,,b", ',')._1 == Vector("a", "", "b"))
  }

  test("sniff: picks the consistent delimiter, header heuristic") {
    val d = Csv.sniff("name;qty\nalpha;1\nbeta;2").get
    assert(d == Csv.Dialect("semicolon", 2, false, true))
    val nohdr = Csv.sniff("alpha;1\nbeta;2").get
    assert(!nohdr.hasHeader)
    // quoted field containing the delimiter stays one field
    val q = Csv.sniff("a,b,c\n\"x,y\",2,3").get
    assert(q.delimiter == "comma" && q.nFields == 3 && q.quoted)
  }

  test("sniff: inconsistent or single-column input yields None") {
    assert(Csv.sniff("just a sentence\nanother line").isEmpty)
    assert(Csv.sniff("a,b\nc,d,e").isEmpty)
    assert(Csv.sniff("").isEmpty)
    assert(Csv.sniff(null).isEmpty)
  }

  test("sniff: higher field count wins over precedence") {
    // ',' splits into 2 everywhere, '|' into 3 everywhere -> pipe wins
    val d = Csv.sniff("a|b,c|d\ne|f,g|h").get
    assert(d.delimiter == "pipe" && d.nFields == 3)
  }
}

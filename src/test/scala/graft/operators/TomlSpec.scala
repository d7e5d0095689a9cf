package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Toml._
import Yaml.{YBool, YList, YMap, YNum, YStr}

class TomlSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 60): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("manifest round-trip: tables, array-of-tables, multiline " +
      "array/string, inline tables, dotted keys") {
    checkProp(Prop.forAll(Gen.alphaNumStr.map("pkg-" + _),
        Gen.choose(0, 4), Gen.choose(0, 3), Gen.choose(0, 3)) {
      (name, nFeat, nDeps, nBins) =>
        val feats = (0 until nFeat).map(i => s"feat$i")
        val deps = (0 until nDeps).map(i => (s"dep$i", s"1.$i.0"))
        val m = parseToml(encodeManifest(name, "0.3.1", 2021, feats,
          deps, nBins)).get
        val pkg = m.get("package").get.asInstanceOf[YMap]
        pkg.get("name").contains(YStr(name)) &&
          pkg.get("version").contains(YStr("0.3.1")) &&
          pkg.get("edition").contains(YNum(2021)) &&
          pkg.get("publish").contains(YBool(false)) &&
          pkg.get("description").contains(
            YStr("A multiline\ndescription.")) &&
          pkg.get("features").contains(
            YList(feats.map(YStr.apply).toVector)) &&
          (m.get("dependencies") match {
            case Some(d: YMap) =>
              d.fields.length == nDeps && deps.zipWithIndex.forall {
                case ((dep, ver), i) =>
                  if (i % 2 == 0) d.get(dep).contains(YStr(ver))
                  else d.get(dep) match {
                    case Some(t: YMap) =>
                      t.get("version").contains(YStr(ver)) &&
                        t.get("default-features").contains(YBool(false))
                    case _ => false
                  }
              }
            case None => nDeps == 0
            case _ => false
          }) &&
          (m.get("bin") match {
            case Some(YList(bins)) =>
              bins.length == nBins && bins.zipWithIndex.forall {
                case (b: YMap, k) =>
                  b.get("name").contains(YStr(s"tool$k")) &&
                    b.get("path").contains(YStr(s"src/bin$k.rs")) &&
                    (b.get("test") match {
                      case Some(t: YMap) =>
                        t.get("harness").contains(YBool(k % 2 == 0))
                      case _ => false
                    })
                case _ => false
              }
            case None => nBins == 0
            case _ => false
          })
    })
  }

  test("typed values: int underscores and radixes, floats, datetimes " +
      "as literal text, escapes") {
    val m = parseToml(
      ("a = 1_000_000\nb = 0xdead_beef\nc = 0o755\nd = 0b1010\n" +
        "e = -3.5e2\nf = 2024-02-29T12:30:00Z\n" +
        "g = \"tab\\there \\u00e9\"\n" +
        "h = 'C:\\raw\\path'\n").getBytes("UTF-8")).get
    assert(m.get("a") === Some(YNum(1000000)))
    assert(m.get("b") === Some(YNum(0xdeadbeefL.toDouble)))
    assert(m.get("c") === Some(YNum(493)))
    assert(m.get("d") === Some(YNum(10)))
    assert(m.get("e") === Some(YNum(-350.0)))
    assert(m.get("f") === Some(YStr("2024-02-29T12:30:00Z")))
    assert(m.get("g") === Some(YStr("tab\there é")))
    assert(m.get("h") === Some(YStr("C:\\raw\\path")))
    // TOML 1.0 forbids signs on non-decimal integers
    assert(parseToml("a = -0x10\n".getBytes) === None)
    assert(parseToml("a = +0o7\n".getBytes) === None)
    assert(parseToml("a = -0b101\n".getBytes) === None)
  }

  test("strictness: bare-word values, duplicate keys, duplicate " +
      "explicit tables, misplaced underscores all reject") {
    assert(parseToml("a = yes\n".getBytes) === None) // bare word
    assert(parseToml("a = 1\na = 2\n".getBytes) === None)
    assert(parseToml("[t]\nx = 1\n[t]\ny = 2\n".getBytes) === None)
    assert(parseToml("a = 1__2\n".getBytes) === None)
    assert(parseToml("a = _1\n".getBytes) === None)
    assert(parseToml("a = \"unterminated\n".getBytes) === None)
    assert(parseToml("a = [1, 2\n".getBytes) === None)
    assert(parseToml("[t\nx = 1\n".getBytes) === None)
    assert(parseToml(null) === None)
    // defining a value where a table lives (and vice versa)
    assert(parseToml("[t]\nx = 1\n[t.x]\ny = 2\n".getBytes) === None)
  }

  test("comments strip outside strings only; arrays span lines with " +
      "trailing commas") {
    val m = parseToml(
      ("xs = [ # open\n  \"a #not-comment\",\n  2, # two\n]\n")
        .getBytes("UTF-8")).get
    assert(m.get("xs") === Some(YList(Vector(YStr("a #not-comment"),
      YNum(2)))))
    // a multiline basic string keeps its '#' content
    val m2 = parseToml("s = \"\"\"\nline #one\n\"\"\"\n".getBytes).get
    assert(m2.get("s") === Some(YStr("line #one\n")))
  }

  test("truncation sweep never throws") {
    val good = encodeManifest("p", "1.0.0", 2021, Seq("f"),
      Seq(("d", "2")), 1)
    (1 until good.length by 3).foreach(n => parseToml(good.take(n)))
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import Yaml._

class YamlSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 80): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private def fm(b: Array[Byte]) = frontMatter(b).get

  test("front-matter round-trip: quoted scalars, flow list, nesting, " +
      "block sequence of maps, literal block, typed plains") {
    checkProp(Prop.forAll(Gen.alphaNumStr.map("T \"q\" " + _),
        Gen.choose(0, 4), Gen.oneOf(true, false),
        Gen.choose(-5000L, 5000L)) { (title, nTags, draft, weight) =>
      val tags = (0 until nTags).map(i => s"tag$i")
      val (y, body) = fm(encodeFrontMatter(title, "2024-02-29", tags,
        draft, weight, "# Body\ncontent"))
      y.get("title").contains(YStr(title)) &&
        y.get("date").contains(YStr("2024-02-29")) &&
        y.get("tags").contains(YList(tags.map(YStr.apply).toVector)) &&
        y.get("draft").contains(YBool(draft)) &&
        y.get("weight").contains(YNum(weight.toDouble)) &&
        (y.get("author") match {
          case Some(m: YMap) =>
            m.get("name").contains(YStr("A. Writer")) &&
              (m.get("contact") match {
                case Some(c: YMap) => c.get("city").contains(YStr("Berlin"))
                case _ => false
              })
          case _ => false
        }) &&
        (y.get("links") match {
          case Some(YList(Vector(a: YMap, b2: YMap))) =>
            a.get("rel").contains(YStr("canonical")) &&
              a.get("href").contains(YStr("/a")) &&
              b2.get("href").contains(YStr("/b"))
          case _ => false
        }) &&
        y.get("summary").contains(YStr("first line\nsecond line\n")) &&
        body == "# Body\ncontent"
    })
  }

  test("scalar typing and quoting: core schema, '' and backslash " +
      "escapes, comments outside quotes only") {
    val y = parseYaml(
      ("a: 'it''s'\n" +
        "b: \"x\\n\\\"y\\\"\"\n" +
        "c: 007text\n" +
        "d: -12.5e1\n" +
        "e: ~\n" +
        "f: url#frag\n" +
        "g: value # trailing comment\n").getBytes("UTF-8"))
      .get.asInstanceOf[YMap]
    assert(y.get("a") === Some(YStr("it's")))
    assert(y.get("b") === Some(YStr("x\n\"y\"")))
    assert(y.get("c") === Some(YStr("007text")))
    assert(y.get("d") === Some(YNum(-125.0)))
    assert(y.get("e") === Some(YNull))
    assert(y.get("f") === Some(YStr("url#frag")))
    assert(y.get("g") === Some(YStr("value")))
  }

  test("folded block scalars join with spaces, blank lines newline") {
    val y = parseYaml(
      "s: >\n  one\n  two\n\n  three\n".getBytes("UTF-8"))
      .get.asInstanceOf[YMap]
    assert(y.get("s") === Some(YStr("one two\nthree\n")))
    val clipped = parseYaml(
      "s: |-\n  a\n  b\n".getBytes("UTF-8")).get.asInstanceOf[YMap]
    assert(clipped.get("s") === Some(YStr("a\nb")))
  }

  test("out-of-scope constructs and errors REJECT, never guess: " +
      "anchors, aliases, tags, flow maps, tabs, duplicate keys") {
    assert(parseYaml("a: &anchor v\n".getBytes) === None)
    assert(parseYaml("a: *alias\n".getBytes) === None)
    assert(parseYaml("a: !!str v\n".getBytes) === None)
    assert(parseYaml("a: {k: v}\n".getBytes) === None)
    assert(parseYaml("a:\n\tb: 1\n".getBytes) === None)
    assert(parseYaml("a: 1\na: 2\n".getBytes) === None)
    assert(parseYaml("a: 'unterminated\n".getBytes) === None)
    assert(parseYaml(null) === None)
    assert(parseYaml("".getBytes) === None)
  }

  test("front matter requires both fences and a mapping") {
    assert(frontMatter("no fence\n".getBytes) === None)
    assert(frontMatter("---\ntitle: x\nno closing".getBytes) === None)
    assert(frontMatter("---\n- just\n- a list\n---\nbody".getBytes)
      === None)
    val good = encodeFrontMatter("t", "d", Seq("a"), draft = false, 1L,
      "body")
    (1 until good.length by 5).foreach(n => frontMatter(good.take(n)))
  }
  test("a quoted scalar containing ': ' inside a sequence stays a " +
      "scalar, not a compact map") {
    val y = parseYaml("xs:\n  - \"k: v\"\n  - plain\n".getBytes)
      .get.asInstanceOf[YMap]
    assert(y.get("xs") === Some(YList(Vector(YStr("k: v"),
      YStr("plain")))))
  }

  test("package-manifest round-trip: dependency blocks parse as " +
      "nested mappings with quoted version strings") {
    val blob = encodePackageManifest("pkg-a", "1.2.3",
      Seq("lib1" -> "^1.2", "lib2" -> ">=2.0", "lib3" -> "~0.9"),
      Seq("devlib" -> "0.4"))
    val m = parseYaml(blob).get.asInstanceOf[YMap]
    assert(m.get("name") === Some(YStr("pkg-a")))
    assert(m.get("version") === Some(YStr("1.2.3")))
    val deps = m.get("dependencies").get.asInstanceOf[YMap]
    assert(deps.fields === Vector("lib1" -> YStr("^1.2"),
      "lib2" -> YStr(">=2.0"), "lib3" -> YStr("~0.9")))
    val dev = m.get("dev-dependencies").get.asInstanceOf[YMap]
    assert(dev.fields === Vector("devlib" -> YStr("0.4")))
    assert(m.get("license") === Some(YStr("MIT")))
  }

}

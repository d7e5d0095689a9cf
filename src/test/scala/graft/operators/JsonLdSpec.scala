package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import JsonLd._

class JsonLdSpec extends AnyFunSuite {

  test("top-level strings surface; nested structures and numbers skip") {
    val m = topLevelStrings(
      """{"@type":"Article","headline":"H","n":42,"ok":true,
        |"author":{"name":"nested","headline":"decoy"},
        |"tags":["a","b"],"datePublished":"2020-01-01","z":null}"""
        .stripMargin).get
    assert(m === Map("@type" -> "Article", "headline" -> "H",
      "datePublished" -> "2020-01-01"))
  }

  test("string escapes decode: quote, backslash, unicode, newline") {
    val m = topLevelStrings(
      """{"a":"q\"b","b":"s\\t","c":"uéx","d":"l1\nl2"}""").get
    assert(m("a") === "q\"b")
    assert(m("b") === "s\\t")
    assert(m("c") === "uéx")
    assert(m("d") === "l1\nl2")
  }

  test("malformed JSON yields None, never a partial map") {
    assert(topLevelStrings("""{"a":"x",""") === None)
    assert(topLevelStrings("""{"a":}""") === None)
    assert(topLevelStrings("""["not","an","object"]""") === None)
    assert(topLevelStrings("""{"a":"unterminated""") === None)
    assert(topLevelStrings("""{"a":"x"} trailing""") === None)
    assert(topLevelStrings("") === None)
    assert(topLevelStrings("{}") === Some(Map.empty))
  }

  test("extract: type gate is exact and case-insensitive; decoys skip") {
    val html =
      """<script>var t = "application/ld+json";</script>
        |<SCRIPT TYPE="Application/LD+JSON">{"@type":"A","x":"1"}</SCRIPT>
        |<script type="text/javascript">{"@type":"B"}</script>
        |<script type="application/ld+json">not json</script>
        |<script type="application/ld+json">{"@type":"C"}</script>"""
        .stripMargin
    val blocks = extract(html)
    assert(blocks.map(_.atType) === Vector(Some("A"), Some("C")))
  }

  test("unterminated script and null input do not throw") {
    assert(extract(null) === Vector.empty)
    assert(extract("<script type=\"application/ld+json\">{\"a\":\"b\"")
      === Vector.empty)
    assert(extract("<scriptfoo><script type='application/ld+json'>" +
      "{\"@type\":\"D\"}</script>").map(_.atType) === Vector(Some("D")))
  }

  test("repeated keys keep the first value (defensive against sloppy " +
      "publisher JSON)") {
    val m = topLevelStrings("""{"a":"first","a":"second"}""").get
    assert(m("a") === "first")
  }
}

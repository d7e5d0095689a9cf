package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import Json._

class JsonSpec extends AnyFunSuite {

  test("path/type emission over a nested document") {
    val pts = pathTypes(
      """{"a":1,"b":[{"c":"x"},{"c":"y"}],"d":{"e":null,"f":true}}""").get
    assert(pts == Vector(
      ("$", "object"), ("$.a", "number"),
      ("$.b", "array"), ("$.b[]", "object"), ("$.b[].c", "string"),
      ("$.b[]", "object"), ("$.b[].c", "string"),
      ("$.d", "object"), ("$.d.e", "null"), ("$.d.f", "boolean")))
  }

  test("scalars, empty containers, whitespace") {
    assert(pathTypes("42").get == Vector(("$", "number")))
    assert(pathTypes("0").get == Vector(("$", "number")))
    assert(pathTypes("0.5").get == Vector(("$", "number")))
    assert(pathTypes("-1.5e-3").get == Vector(("$", "number")))
    assert(pathTypes("\"s\"").get == Vector(("$", "string")))
    assert(pathTypes(" { } ").get == Vector(("$", "object")))
    assert(pathTypes("[]").get == Vector(("$", "array")))
    assert(pathTypes("  [ 1 , 2 ]  ").get ==
      Vector(("$", "array"), ("$[]", "number"), ("$[]", "number")))
  }

  test("string escapes including unicode") {
    assert(pathTypes("""{"kéy":"v\n"}""").get ==
      Vector(("$", "object"), ("$.kéy", "string")))
  }

  test("malformed inputs yield None") {
    for (bad <- Seq(null, "", "{", "{\"a\":}", "[1,]", "{\"a\" 1}",
      "tru", "01x", "1.", "1e", "\"unterminated", "{\"a\":1} trailing",
      "007", "{\"a\":01}", "-01", "{'single':1}", "\"bad  ctrl\"", "nul"))
      assert(pathTypes(bad).isEmpty, s"should reject: $bad")
  }

  test("deep nesting is bounded, not a stack overflow") {
    val deep = "[" * 1000 + "]" * 1000
    assert(pathTypes(deep).isEmpty)
    val okDepth = "[" * 200 + "1" + "]" * 200
    assert(pathTypes(okDepth).isDefined)
  }

  test("duplicate keys both emit (census counts occurrences)") {
    assert(pathTypes("""{"a":1,"a":"x"}""").get ==
      Vector(("$", "object"), ("$.a", "number"), ("$.a", "string")))
  }
}

package graft.operators

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

class CborSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("scalars: every argument width, negatives, simples, floats") {
    assert(Cbor.pathTypes(bytes(0x07)).contains(Vector(("$", "int"))))
    assert(Cbor.pathTypes(bytes(0x18, 200)).contains(Vector(("$", "int"))))
    assert(Cbor.pathTypes(bytes(0x19, 1, 0)).contains(Vector(("$", "int"))))
    assert(Cbor.pathTypes(bytes(0x1a, 0, 1, 0, 0))
      .contains(Vector(("$", "int"))))
    assert(Cbor.pathTypes(bytes(0x1b, 0, 0, 0, 0, 0, 1, 0, 0))
      .contains(Vector(("$", "int"))))
    assert(Cbor.pathTypes(bytes(0x20)).contains(Vector(("$", "int")))) // -1
    assert(Cbor.pathTypes(bytes(0x39, 0x03, 0xe7))
      .contains(Vector(("$", "int")))) // -1000
    assert(Cbor.pathTypes(bytes(0xf4)).contains(Vector(("$", "boolean"))))
    assert(Cbor.pathTypes(bytes(0xf5)).contains(Vector(("$", "boolean"))))
    assert(Cbor.pathTypes(bytes(0xf6)).contains(Vector(("$", "nil"))))
    assert(Cbor.pathTypes(bytes(0xf7)).contains(Vector(("$", "undefined"))))
    assert(Cbor.pathTypes(bytes(0xe3)).contains(Vector(("$", "simple"))))
    assert(Cbor.pathTypes(bytes(0xf8, 0xff))
      .contains(Vector(("$", "simple"))))
    // half, single, double floats
    assert(Cbor.pathTypes(bytes(0xf9, 0x3c, 0x00))
      .contains(Vector(("$", "float"))))
    assert(Cbor.pathTypes(bytes(0xfa, 0x3f, 0x80, 0, 0))
      .contains(Vector(("$", "float"))))
    val out = new ByteArrayOutputStream()
    Cbor.packFloat64(out, 1.5)
    assert(Cbor.pathTypes(out.toByteArray).contains(Vector(("$", "float"))))
  }

  test("strings, byte strings, indefinite chunking") {
    assert(Cbor.pathTypes(bytes(0x62, 'h', 'i'))
      .contains(Vector(("$", "string"))))
    assert(Cbor.pathTypes(bytes(0x42, 9, 9))
      .contains(Vector(("$", "binary"))))
    // indefinite text: (_ "he" "llo")
    assert(Cbor.pathTypes(bytes(0x7f, 0x62, 'h', 'e', 0x63, 'l', 'l', 'o',
      0xff)).contains(Vector(("$", "string"))))
    // indefinite bytes
    assert(Cbor.pathTypes(bytes(0x5f, 0x41, 1, 0x41, 2, 0xff))
      .contains(Vector(("$", "binary"))))
    // empty indefinite string
    assert(Cbor.pathTypes(bytes(0x7f, 0xff))
      .contains(Vector(("$", "string"))))
  }

  test("arrays, maps, tags — definite and indefinite") {
    assert(Cbor.pathTypes(bytes(0x82, 0x01, 0x62, 'h', 'i')).contains(
      Vector(("$", "array"), ("$[]", "int"), ("$[]", "string"))))
    assert(Cbor.pathTypes(bytes(0x9f, 0x01, 0x02, 0xff)).contains(
      Vector(("$", "array"), ("$[]", "int"), ("$[]", "int"))))
    assert(Cbor.pathTypes(bytes(0xa1, 0x61, 'a', 0x01)).contains(
      Vector(("$", "object"), ("$.a", "int"))))
    assert(Cbor.pathTypes(bytes(0xbf, 0x61, 'a', 0x01, 0xff)).contains(
      Vector(("$", "object"), ("$.a", "int"))))
    // indefinite-text map key
    assert(Cbor.pathTypes(bytes(0xa1, 0x7f, 0x61, 'a', 0x61, 'b', 0xff,
      0x01)).contains(Vector(("$", "object"), ("$.ab", "int"))))
    // tag 0 wrapping a string: tag row + content at the same path
    assert(Cbor.pathTypes(bytes(0xc0, 0x62, 'h', 'i')).contains(
      Vector(("$", "tag"), ("$", "string"))))
    // wide tag argument
    assert(Cbor.pathTypes(bytes(0xd9, 0xd9, 0xf7, 0x01)).contains(
      Vector(("$", "tag"), ("$", "int"))))
  }

  test("ill-formed: reserved ai, lone break, bad chunks, truncation, " +
      "non-text keys, two-byte simple < 32, trailing bytes, depth") {
    assert(Cbor.pathTypes(null).isEmpty)
    assert(Cbor.pathTypes(Array.emptyByteArray).isEmpty)
    assert(Cbor.pathTypes(bytes(0x1c)).isEmpty) // reserved ai 28
    assert(Cbor.pathTypes(bytes(0x1f)).isEmpty) // indefinite uint
    assert(Cbor.pathTypes(bytes(0xff)).isEmpty) // lone break
    assert(Cbor.pathTypes(bytes(0x65, 'h', 'i')).isEmpty) // torn text
    assert(Cbor.pathTypes(bytes(0x19, 1)).isEmpty) // torn argument
    assert(Cbor.pathTypes(bytes(0x82, 0x01)).isEmpty) // short array
    assert(Cbor.pathTypes(bytes(0x9f, 0x01)).isEmpty) // unclosed indef
    assert(Cbor.pathTypes(bytes(0xa1, 0x01, 0x02)).isEmpty) // int key
    // nested indefinite chunk inside an indefinite string (§3.2.3)
    assert(Cbor.pathTypes(bytes(0x7f, 0x7f, 0xff, 0xff)).isEmpty)
    // non-string chunk inside an indefinite byte string
    assert(Cbor.pathTypes(bytes(0x5f, 0x01, 0xff)).isEmpty)
    assert(Cbor.pathTypes(bytes(0xf8, 0x10)).isEmpty) // simple 16 two-byte
    assert(Cbor.pathTypes(bytes(0x01, 0x02)).isEmpty) // trailing
    // unending nesting is depth-capped, not a stack overflow
    assert(Cbor.pathTypes(Array.fill(2000)(0x81.toByte)).isEmpty)
    // a declared length larger than the stream (Long bounds)
    assert(Cbor.pathTypes(bytes(0x5b, 0x7f, 0xff, 0xff, 0xff, 0xff, 0xff,
      0xff, 0xff)).isEmpty)
  }

  test("sequences (RFC 8742): back-to-back items index correctly; a " +
      "torn tail or mid-sequence junk rejects the whole sequence") {
    val out = new ByteArrayOutputStream()
    Cbor.packInt(out, 7)
    Cbor.packMapHeader(out, 1); Cbor.packStr(out, "a"); Cbor.packStr(out, "v")
    Cbor.packArrayHeader(out, 1); Cbor.packBool(out, v = true)
    val rows = Cbor.seqPathTypes(out.toByteArray).get
    assert(rows == Vector((0, "$", "int"), (1, "$", "object"),
      (1, "$.a", "string"), (2, "$", "array"), (2, "$[]", "boolean")))
    assert(Cbor.seqPathTypes(Array.emptyByteArray).contains(Vector.empty))
    assert(Cbor.seqPathTypes(null).isEmpty)
    assert(Cbor.seqPathTypes(out.toByteArray.dropRight(1)).isEmpty)
    assert(Cbor.seqPathTypes(out.toByteArray :+ 0x1c.toByte).isEmpty)
  }

  test("census rows are drift-compatible with the JSON and MsgPack " +
      "walkers' rows") {
    val json = Json.pathTypes("""{"a":[1,2],"b":{"c":"x"}}""").get
    val cb = Cbor.pathTypes(bytes(
      0xa2, 0x61, 'a', 0x82, 0x01, 0x02,
      0x61, 'b', 0xa1, 0x61, 'c', 0x61, 'x')).get
    val mp = MsgPack.pathTypes(bytes(
      0x82, 0xa1, 'a', 0x92, 0x01, 0x02,
      0xa1, 'b', 0x81, 0xa1, 'c', 0xa1, 'x')).get
    def norm(v: Vector[(String, String)]) =
      v.map { case (p, t) => (p, if (t == "number") "int" else t) }
    assert(norm(json) == norm(cb))
    assert(norm(mp) == norm(cb))
  }

  test("emitter round-trip: the q422 fixture shape walks cleanly for " +
      "every residue class") {
    (0L to 30L).foreach { id =>
      val out = new ByteArrayOutputStream()
      val nEntries = 5 +
        (if (id % 3 == 0) 1 else 0) + (if (id % 5 == 0) 1 else 0)
      Cbor.packMapHeader(out, nEntries)
      Cbor.packStr(out, "id"); Cbor.packInt(out, id)
      Cbor.packStr(out, "neg"); Cbor.packInt(out, -1L - id)
      Cbor.packStr(out, "name"); Cbor.packStr(out, s"doc $id")
      Cbor.packStr(out, "tags")
      out.write(0x9f); Cbor.packStr(out, "a"); Cbor.packStr(out, "b")
      out.write(0xff)
      Cbor.packStr(out, "meta")
      Cbor.packMapHeader(out, 1 + (if (id % 2 == 0) 1 else 0))
      Cbor.packStr(out, "score"); Cbor.packFloat64(out, 1.5)
      if (id % 2 == 0) { Cbor.packStr(out, "flag"); Cbor.packBool(out, v = true) }
      if (id % 3 == 0) {
        Cbor.packStr(out, "blob"); Cbor.packBytes(out, Array[Byte](1, 2, 3))
      }
      if (id % 5 == 0) {
        Cbor.packStr(out, "ts"); Cbor.packTag(out, 0L)
        Cbor.packStr(out, "2026-01-01T00:00:00Z")
      }
      val pts = Cbor.pathTypes(out.toByteArray)
      assert(pts.isDefined, s"id=$id")
      val m = pts.get
      assert(m.contains(("$", "object")))
      assert(m.contains(("$.neg", "int")))
      assert(m.count(_ == ("$.tags[]", "string")) == 2)
      assert(m.contains(("$.ts", "tag")) == (id % 5 == 0))
    }
  }
}

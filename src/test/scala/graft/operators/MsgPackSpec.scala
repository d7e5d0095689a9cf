package graft.operators

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

class MsgPackSpec extends AnyFunSuite {

  private def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("scalars and fix families") {
    assert(MsgPack.pathTypes(bytes(0x07)).contains(Vector(("$", "int"))))
    assert(MsgPack.pathTypes(bytes(0xe0)).contains(Vector(("$", "int")))) // -32
    assert(MsgPack.pathTypes(bytes(0xc0)).contains(Vector(("$", "nil"))))
    assert(MsgPack.pathTypes(bytes(0xc3)).contains(Vector(("$", "boolean"))))
    assert(MsgPack.pathTypes(bytes(0xa2, 'h', 'i'))
      .contains(Vector(("$", "string"))))
    // [1, "x"]
    assert(MsgPack.pathTypes(bytes(0x92, 0x01, 0xa1, 'x')).contains(
      Vector(("$", "array"), ("$[]", "int"), ("$[]", "string"))))
    // {"a": 1}
    assert(MsgPack.pathTypes(bytes(0x81, 0xa1, 'a', 0x01)).contains(
      Vector(("$", "object"), ("$.a", "int"))))
  }

  test("wide-width families: uint64, str8, bin8, float32") {
    val out = new ByteArrayOutputStream()
    MsgPack.packInt(out, Long.MaxValue)
    assert(MsgPack.pathTypes(out.toByteArray).contains(Vector(("$", "int"))))
    val s = new ByteArrayOutputStream()
    MsgPack.packStr(s, "x" * 40) // str8 path
    assert(MsgPack.pathTypes(s.toByteArray).contains(Vector(("$", "string"))))
    assert(MsgPack.pathTypes(bytes(0xca, 0x3f, 0x80, 0, 0))
      .contains(Vector(("$", "float"))))
    assert(MsgPack.pathTypes(bytes(0xc4, 2, 9, 9))
      .contains(Vector(("$", "binary"))))
  }

  test("hostile input: truncation, non-string keys, ext, trailing") {
    assert(MsgPack.pathTypes(null).isEmpty)
    assert(MsgPack.pathTypes(Array.emptyByteArray).isEmpty)
    assert(MsgPack.pathTypes(bytes(0xa5, 'h', 'i')).isEmpty) // str torn
    assert(MsgPack.pathTypes(bytes(0x81, 0x01, 0x02)).isEmpty) // int key
    assert(MsgPack.pathTypes(bytes(0xc7, 1, 1, 0)).isEmpty) // ext8
    assert(MsgPack.pathTypes(bytes(0x01, 0x02)).isEmpty) // trailing
    assert(MsgPack.pathTypes(bytes(0x92, 0x01)).isEmpty) // short array
    // unending nesting is depth-capped, not a stack overflow
    assert(MsgPack.pathTypes(Array.fill(2000)(0x91.toByte)).isEmpty)
  }

  test("census rows are drift-compatible with the JSON walker's") {
    // same logical document through both walkers -> same (path, type)
    // rows modulo the int/number naming difference
    val json = Json.pathTypes("""{"a":[1,2],"b":{"c":"x"}}""").get
    val mp = MsgPack.pathTypes(bytes(
      0x82, 0xa1, 'a', 0x92, 0x01, 0x02,
      0xa1, 'b', 0x81, 0xa1, 'c', 0xa1, 'x')).get
    def norm(v: Vector[(String, String)]) =
      v.map { case (p, t) => (p, if (t == "number") "int" else t) }
    assert(norm(json) == norm(mp))
  }
}

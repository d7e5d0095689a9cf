package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class ProtoAvroSpec extends AnyFunSuite {

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  // ------------------------------------------------------- protobuf

  test("varint round-trip across the 64-bit range") {
    checkProp(Prop.forAll(Gen.oneOf(
      Gen.choose(0L, 127L), Gen.choose(128L, Long.MaxValue),
      Gen.const(-1L), Gen.const(Long.MinValue))) { v =>
      val msg = Protobuf.encodeMessage(Seq((1, 0, Left(v))))
      Protobuf.walkFields(msg).contains(Vector(Protobuf.FieldOcc(1, 0, v)))
    })
  }

  test("mixed message walks: every wire type, repeated fields") {
    val msg = Protobuf.encodeMessage(Seq[(Int, Int, Either[Long, Array[Byte]])](
      (1, 0, Left(150L)),
      (2, 2, Right("testing".getBytes)),
      (3, 5, Left(0x12345678L)),
      (4, 1, Left(-1L)),
      (1, 0, Left(151L))))
    val occ = Protobuf.walkFields(msg).get
    assert(occ == Vector(
      Protobuf.FieldOcc(1, 0, 150L), Protobuf.FieldOcc(2, 2, 7L),
      Protobuf.FieldOcc(3, 5, 4L), Protobuf.FieldOcc(4, 1, 8L),
      Protobuf.FieldOcc(1, 0, 151L)))
  }

  test("the canonical 0x08 0x96 0x01 example decodes as field 1 = 150") {
    assert(Protobuf.walkFields(Array(0x08, 0x96, 0x01).map(_.toByte))
      .contains(Vector(Protobuf.FieldOcc(1, 0, 150L))))
  }

  test("hostile input: truncation, overrun, group types, field 0") {
    assert(Protobuf.walkFields(null).isEmpty)
    assert(Protobuf.walkFields(Array[Byte](0x08)).isEmpty) // varint missing
    // declared length 100 with 2 bytes present
    assert(Protobuf.walkFields(Array[Byte](0x12, 100, 1, 2)).isEmpty)
    assert(Protobuf.walkFields(Array[Byte](0x0b)).isEmpty) // group start
    assert(Protobuf.walkFields(Array[Byte](0x00, 0x01)).isEmpty) // field 0
    // unending varint (11 continuation bytes)
    assert(Protobuf.walkFields(
      Array[Byte](0x08) ++ Array.fill(11)(0x80.toByte)).isEmpty)
  }

  // ----------------------------------------------------------- avro

  test("avro container round-trip: codec, schema len, block totals") {
    val sync = Array.tabulate(16)(_.toByte)
    val blob = Avro.encode("{\"type\":\"string\"}", "deflate", sync,
      Seq((100L, 50), (23L, 7)))
    assert(Avro.sniff(blob).contains(
      Avro.AvroShell("deflate", 17, 2L, 123L, 57L)))
  }

  test("avro zigzag property: encode/sniff agree on block counts") {
    checkProp(Prop.forAll(Gen.listOfN(3, Gen.zip(
      Gen.choose(0L, 1000000L), Gen.choose(0, 200)))) { bs =>
      val sync = Array.fill(16)(7.toByte)
      val blob = Avro.encode("{}", "null", sync, bs)
      Avro.sniff(blob).exists(a => a.nBlocks == bs.size &&
        a.nRecords == bs.map(_._1).sum && a.payloadBytes == bs.map(_._2.toLong).sum)
    }, 40)
  }

  test("avro hostile input: bad magic, sync mismatch, torn tail") {
    val sync = Array.fill(16)(1.toByte)
    val good = Avro.encode("{}", "null", sync, Seq((5L, 10)))
    assert(Avro.sniff(null).isEmpty)
    assert(Avro.sniff("Obj2junkjunkjunkjunkjunk".getBytes).isEmpty)
    val badSync = good.clone
    badSync(badSync.length - 1) = 99.toByte // corrupt the block sync
    assert(Avro.sniff(badSync).isEmpty)
    assert(Avro.sniff(java.util.Arrays.copyOf(good, good.length - 3)).isEmpty)
  }
}

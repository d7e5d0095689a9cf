package graft.operators

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector.{BigIntVector, VarCharVector, VectorSchemaRoot}
import org.apache.arrow.vector.ipc.ArrowStreamWriter
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema}

import ArrowIpc._

/** Arrow IPC conformance, refereed by the reference implementation on
  * the Spark classpath: ArrowStreamWriter output — nulls, empty and
  * multi-row batches, multi-batch streams, large strings — must
  * decode value-exactly through the from-scratch flatbuffers walk. */
class ArrowIpcSpec extends AnyFunSuite {

  private def write(batches: Seq[Seq[(Option[Long], Option[String])]],
      codec: Option[org.apache.arrow.vector.compression
        .CompressionUtil.CodecType] = None): Array[Byte] = {
    val alloc = new RootAllocator()
    val schema = new Schema(Seq(
      new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
      new Field("s", FieldType.nullable(new ArrowType.Utf8()), null)).asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    val bos = new ByteArrayOutputStream()
    val w = codec match {
      case None => new ArrowStreamWriter(root, null,
        java.nio.channels.Channels.newChannel(bos))
      case Some(ct) => new ArrowStreamWriter(root, null,
        java.nio.channels.Channels.newChannel(bos),
        org.apache.arrow.vector.ipc.message.IpcOption.DEFAULT,
        org.apache.arrow.compression.CommonsCompressionFactory.INSTANCE,
        ct)
    }
    w.start()
    batches.foreach { rows =>
      val id = root.getVector("id").asInstanceOf[BigIntVector]
      val s = root.getVector("s").asInstanceOf[VarCharVector]
      root.setRowCount(rows.length)
      rows.zipWithIndex.foreach { case ((iv, sv), r) =>
        iv match {
          case Some(v) => id.setSafe(r, v)
          case None    => id.setNull(r)
        }
        sv match {
          case Some(v) => s.setSafe(r, v.getBytes("UTF-8"))
          case None    => s.setNull(r)
        }
      }
      id.setValueCount(rows.length)
      s.setValueCount(rows.length)
      w.writeBatch()
    }
    w.end(); w.close(); root.close(); alloc.close()
    bos.toByteArray
  }

  test("reference streams decode value-exactly: nulls, multi-batch, " +
      "empty batches, long strings") {
    val b1 = (0 until 500).map(i =>
      (if (i % 9 == 0) None else Some(i.toLong * 3),
        if (i % 5 == 0) None else Some(s"v$i-" + ("y" * (i % 23)))))
    val b2 = (0 until 77).map(i => (Some(i.toLong), Some("z" * 1000)))
    val stream = write(Seq(b1, Seq.empty, b2))
    val (fields, cols) = readStream(stream).get
    assert(fields == Vector(("id", CLong), ("s", CUtf8)))
    val expected = b1 ++ b2
    assert(cols(0).length == expected.length)
    expected.zipWithIndex.foreach { case ((iv, sv), r) =>
      assert(cols(0)(r) == iv.map(Right(_)), s"id@$r")
      assert(cols(1)(r) == sv.map(Left(_)), s"s@$r")
    }
  }

  test("compressed bodies: LZ4_FRAME and ZSTD reference streams " +
      "decode value-exactly through the repo's own codec decoders") {
    import org.apache.arrow.vector.compression.CompressionUtil.CodecType
    val rows = (0 until 900).map(i =>
      (if (i % 7 == 0) None else Some(i.toLong * 11),
        if (i % 4 == 0) None else Some(s"body$i-" + ("x" * (i % 61)))))
    val tiny = Seq((Some(1L), Some("a")))
    Seq(CodecType.LZ4_FRAME, CodecType.ZSTD).foreach { ct =>
      val stream = write(Seq(rows, Seq.empty, tiny), Some(ct))
      val (fields, cols) = readStream(stream).getOrElse(
        fail(s"decode failed for $ct"))
      assert(fields == Vector(("id", CLong), ("s", CUtf8)), ct)
      val expected = rows ++ tiny
      assert(cols(0).length == expected.length, ct)
      expected.zipWithIndex.foreach { case ((iv, sv), r) =>
        assert(cols(0)(r) == iv.map(Right(_)), s"$ct id@$r")
        assert(cols(1)(r) == sv.map(Left(_)), s"$ct s@$r")
      }
      // tiny values may be stored raw (-1 length prefix) by the
      // writer — covered above; hostile sweeps must stay silent
      (1 until stream.length by 61).foreach(k =>
        readStream(stream.take(k))) // no throw
      (0 until stream.length by 97).foreach { k =>
        val bad = stream.clone()
        bad(k) = (bad(k) ^ 0x10).toByte
        readStream(bad) // no throw (arrow carries no integrity layer)
      }
    }
  }

  test("single-batch and zero-batch streams") {
    val one = write(Seq(Seq((Some(1L), Some("a")))))
    assert(readStream(one).get._2(0) == Vector(Some(Right(1L))))
    val none = write(Seq.empty)
    val (f, c) = readStream(none).get
    assert(f.length == 2 && c.forall(_.isEmpty))
  }

  test("file format (feather v2): ArrowFileWriter output decodes " +
      "through the embedded-stream walk") {
    import org.apache.arrow.vector.ipc.ArrowFileWriter
    val alloc = new RootAllocator()
    val schema = new Schema(Seq(
      new Field("id", FieldType.nullable(new ArrowType.Int(64, true)), null),
      new Field("s", FieldType.nullable(new ArrowType.Utf8()), null)).asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    val bos = new ByteArrayOutputStream()
    val w = new ArrowFileWriter(root, null,
      java.nio.channels.Channels.newChannel(bos))
    w.start()
    (0 until 3).foreach { batch =>
      val id = root.getVector("id").asInstanceOf[BigIntVector]
      val sv = root.getVector("s").asInstanceOf[VarCharVector]
      root.setRowCount(40)
      (0 until 40).foreach { r =>
        id.setSafe(r, batch * 100L + r)
        sv.setSafe(r, s"b$batch-r$r".getBytes("UTF-8"))
      }
      id.setValueCount(40); sv.setValueCount(40)
      w.writeBatch()
    }
    w.end(); w.close(); root.close(); alloc.close()
    val file = bos.toByteArray
    val (fields, cols) = readFile(file).get
    assert(fields.map(_._1) == Vector("id", "s"))
    assert(cols(0).length == 120)
    assert(cols(0)(41) == Some(Right(101L)))
    assert(cols(1)(119) == Some(Left("b2-r39")))
    assert(readFile(file.take(file.length - 3)).isEmpty)
    assert(readFile("ARROW1xxjunk".getBytes).isEmpty)
  }

  test("hostile input: truncation sweep never throws; junk rejects; " +
      "unsupported schema types reject cleanly") {
    val stream = write(Seq((0 until 50).map(i =>
      (Some(i.toLong), Some(s"n$i")))))
    (0 until stream.length by 5).foreach(k => readStream(stream.take(k)))
    assert(readStream(null).isEmpty)
    assert(readStream("junkjunkjunkjunk".getBytes).isEmpty)
    // a float64 column is out of scope -> None, not garbage
    val alloc = new RootAllocator()
    val schema = new Schema(Seq(new Field("f",
      FieldType.nullable(new ArrowType.FloatingPoint(
        org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE)),
      null)).asJava)
    val root = VectorSchemaRoot.create(schema, alloc)
    val bos = new ByteArrayOutputStream()
    val w = new ArrowStreamWriter(root, null,
      java.nio.channels.Channels.newChannel(bos))
    w.start(); root.setRowCount(0); w.writeBatch(); w.end(); w.close()
    root.close(); alloc.close()
    assert(readStream(bos.toByteArray).isEmpty)
  }
}

package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class PostingsShardingSpec extends SparkSpec {

  private def checkProp(p: Prop, n: Int = 100): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("postings segment encode/decode round-trip property") {
    checkProp(Prop.forAll(
      Gen.choose(0L, 1000000L),
      Gen.listOf(Gen.choose(0L, 100000L))) { (base, deltas) =>
      val ids = deltas.scanLeft(base)(_ + _).tail // sorted by construction
      Postings.decodeSegment(Postings.encodeSegment(ids, base), base)
        .contains(ids.toVector)
    })
  }

  test("postings decode: torn and over-long varints yield None, not a throw") {
    assert(Postings.decodeSegment(Array(0x80.toByte), 0L).isEmpty) // torn
    assert(Postings.decodeSegment(Array.fill(11)(0x80.toByte), 0L).isEmpty)
    assert(Postings.decodeSegment(Array.emptyByteArray, 5L).contains(Vector()))
  }

  test("postings: multi-byte gaps and the empty segment") {
    assert(Postings.encodeSegment(Nil, 0L).isEmpty)
    // gap 300 needs 2 bytes: 0xAC 0x02
    val b = Postings.encodeSegment(Seq(300L), 0L)
    assert(b.toSeq == Seq(0xac.toByte, 0x02.toByte))
    // dense run: 1-byte gaps
    assert(Postings.encodeSegment((10L to 20L), 10L).length == 11)
    intercept[IllegalArgumentException] {
      Postings.encodeSegment(Seq(5L, 3L), 0L) // unsorted
    }
  }

  test("rendezvous: moved keys ALL land on the new shard (minimality)") {
    val s = spark
    import s.implicits._
    val keys = (0L until 2000L).toDF("id")
      .select($"id", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("k"), $"id").as("key"))
    val audit = Sharding.resizeAudit(keys, $"key", 8, 9).collect()
    val moved = audit.filter(_.getAs[Boolean]("moved"))
    // minimal movement: a key moves ONLY because the new shard (8) won
    assert(moved.nonEmpty)
    assert(moved.forall(_.getAs[Int]("shard_new") == 8))
    // movement fraction near 1/9 (generous band for 2000 keys)
    val frac = moved.length.toDouble / audit.length
    assert(frac > 0.06 && frac < 0.17, s"moved fraction $frac")
    // balance: every shard in [0,9) owns something, none owns > 3x fair
    val byShard = audit.groupBy(_.getAs[Int]("shard_new")).view.mapValues(_.length)
    assert(byShard.keySet == (0 until 9).toSet)
    assert(byShard.values.forall(_ < 3 * 2000 / 9))
  }

  test("rendezvous: assignment is stable and in range") {
    val s = spark
    import s.implicits._
    val df = Seq("a", "b", "c").toDF("key")
      .select(Sharding.rendezvousShard($"key", 5).as("s"))
    val one = df.collect().map(_.getInt(0))
    val two = df.collect().map(_.getInt(0))
    assert(one.toSeq == two.toSeq)
    assert(one.forall(v => v >= 0 && v < 5))
  }
}

package graft.operators

import scala.util.Random

import graft.SparkSpec

/** The fixture oracle (q183) covers non-negative days and one bin
  * width; these pin the LOSSLESS claim of bin blocking against brute
  * force across widths, touching intervals, and negative coordinates
  * (where integer DIV truncates toward zero instead of flooring — the
  * bin function only needs monotonicity, which truncation preserves). */
class IntervalJoinSpec extends SparkSpec {

  private def brute(iv: Seq[(Long, Long, Long)]): Set[(Long, Long, Long)] =
    (for {
      (ia, sa, ea) <- iv; (ib, sb, eb) <- iv
      if ia < ib && sa <= eb && sb <= ea
    } yield (ia, ib, math.min(ea, eb) - math.max(sa, sb) + 1)).toSet

  private def viaBins(iv: Seq[(Long, Long, Long)],
      binWidth: Long): Set[(Long, Long, Long)] = {
    import spark.implicits._
    Joins.intervalSelfOverlap(iv.toDF("id", "s", "e"), binWidth)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
  }

  test("random intervals (negative days included) match brute force, several widths") {
    val rnd = new Random(7)
    val iv = (1L to 120L).map { id =>
      val s = rnd.nextInt(400) - 200L // straddles zero
      (id, s, s + rnd.nextInt(30))
    }
    val expected = brute(iv)
    assert(expected.nonEmpty)
    for (w <- Seq(1L, 7L, 16L, 1000L))
      assert(viaBins(iv, w) == expected, s"binWidth=$w")
  }

  test("touching endpoints overlap by exactly one day; disjoint do not") {
    val iv = Seq((1L, 0L, 5L), (2L, 5L, 9L), (3L, 10L, 12L))
    assert(viaBins(iv, 4L) == Set((1L, 2L, 1L)))
  }
}

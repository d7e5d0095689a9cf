package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkylineSpec extends SparkSpec {

  private def brute(rows: Seq[(Long, Long, Long)]): Set[Long] =
    rows.filter { case (_, mn, mx) =>
      !rows.exists { case (_, mn2, mx2) => mn2 < mn && mx2 > mx }
    }.map(_._1).toSet

  test("paretoFrontier matches brute force on random grids (duplicates, ties)") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    for ((n, span, buckets) <- Seq((200, 20L, 4), (300, 1000L, 16),
        (150, 1L, 8))) { // span=1: all values equal -> one bucket
      val rows = (0L until n.toLong).map(i =>
        (i, rnd.nextLong(span) + 5, rnd.nextLong(span)))
      val got = Skyline.paretoFrontier(
        rows.toDF("id", "mn", "mx"), col("mn"), col("mx"), buckets)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == brute(rows), s"n=$n span=$span buckets=$buckets")
    }
  }

  test("strict domination: equal price or equal size never dominates") {
    import spark.implicits._
    // (1) and (2) tie on price; (3) ties (1) on size with higher price
    val rows = Seq((1L, 10L, 5L), (2L, 10L, 9L), (3L, 20L, 5L))
    val got = Skyline.paretoFrontier(
      rows.toDF("id", "mn", "mx"), col("mn"), col("mx"), 4)
      .select("id").collect().map(_.getLong(0)).toSet
    // (3) IS dominated by (1)? needs mn 10<20 and mx 5>5 -> no (tie).
    // nothing dominates anything strictly on both dims except... (2)
    // vs (3): 10<20 and 9>5 -> (3) dominated.
    assert(got == Set(1L, 2L))
  }
}

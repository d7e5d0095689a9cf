package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BasketSpec extends SparkSpec {

  test("associationRules: support/confidence/lift on a hand-checked corpus") {
    import spark.implicits._
    // 4 baskets: {1,2,3} {1,2} {1,3} {2,4}; duplicate item rows collapse
    val rows = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), (10L, 2L),
      (20L, 1L), (20L, 2L),
      (30L, 1L), (30L, 3L),
      (40L, 2L), (40L, 4L)
    ).toDF("b", "i")
    val out = Basket.associationRules(rows, col("b"), col("i"),
      minSupport = 2L)
      .orderBy("item_a", "item_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(5), r.getDouble(6), r.getDouble(7)))
    // supp(1)=3 supp(2)=3 supp(3)=2; pair(1,2)=2, pair(1,3)=2
    assert(out.toSeq == Seq(
      (1L, 2L, 2L, 0.6667, 0.6667, 0.8889),
      (1L, 3L, 2L, 0.6667, 1.0, 1.3333)))
  }

  test("associationRules: mega-baskets are excluded by the size guard") {
    import spark.implicits._
    val small = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L))
    val mega = (1L to 50L).map(i => (99L, i))
    val rows = (small ++ mega).toDF("b", "i")
    val out = Basket.associationRules(rows, col("b"), col("i"),
      minSupport = 2L, maxBasketSize = 10).collect()
    // only the (1,2) pair from the two small baskets survives; the
    // 50-item basket contributes nothing (no pair reaches support 2
    // without it, and its own pairs are gone)
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq == Seq((1L, 2L, 2L)))
  }
}

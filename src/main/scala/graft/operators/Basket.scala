package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Market-basket association rules: pairwise co-occurrence support,
  * confidence, and lift over (basket, item) rows. The frequent-itemset
  * query every retail/recommendation OLAP stack runs; the reference's
  * only phrasing would be a hand-written two-pass map/reduce with the
  * pair expansion in user code (`/root/reference/mapper.py:110-143`
  * shape).
  *
  * Scale notes (100 TB posture):
  *  - The pair expansion is the one step that can explode, and it is
  *    bounded PER BASKET: a basket of k items yields C(k,2) pairs, so
  *    the self-join on basket id (equi-join, hash-partitioned) scales
  *    with Σ C(k,2), not |items|². A pathological mega-basket (one
  *    basket holding 10^6 items) would quadratically dominate — the
  *    `maxBasketSize` guard drops those baskets up front, the same
  *    hot-bucket discipline as the LSH family (q43/q86), and they are
  *    noise for rule mining anyway.
  *  - `minSupport` is pushed BELOW the join output into the pair
  *    aggregation (partial-agg map-side), so the rule frame that joins
  *    back to item supports is already pruned.
  *  - Item supports are |items| rows — AQE broadcasts them for the two
  *    enrichment joins. The basket count rides along as a 1-row
  *    cross-joined aggregate, never a driver round-trip.
  */
object Basket {

  /** Association rules over `rows` = (basketCol, itemCol) pairs.
    * Emits one row per unordered item pair with co-occurrence support
    * >= minSupport: supports, both directional confidences, and lift
    * (confidences/lift rounded to 4dp). Baskets larger than
    * `maxBasketSize` distinct items are excluded entirely. */
  def associationRules(rows: DataFrame, basketCol: Column, itemCol: Column,
      minSupport: Long, maxBasketSize: Int = 1000): DataFrame = {
    val s = rows.sparkSession
    import s.implicits._
    // bi feeds the size filter AND the kept join — cache for sharing.
    // Fanned out first: the distinct's partial aggregate otherwise runs
    // in an under-parallel scan stage (no-op at real scale).
    val bi = graft.engine.Tables.fanout(
        rows.select(basketCol.as("b"), itemCol.as("i"))).distinct()
      .cache()
    val sized = bi.groupBy($"b").agg(count(lit(1)).as("_sz"))
      .filter($"_sz" <= maxBasketSize)
    // kept has FOUR consumers (basket count, item supports, both pair
    // sides — the i->i2 rename defeats ReuseExchange on the self-join),
    // so un-materialized it re-ran the scan+distinct chain per consumer:
    // the q192 sf1 cold-start cliff (28s first pass vs 6.6s warm — four
    // cold-page-cache corpus scans instead of one). One eager
    // checkpoint = one scan; every consumer reads blocks.
    val kept = bi.join(sized, Seq("b"), "left_semi").localCheckpoint()
    graft.engine.Materialize.free(bi)
    val nBaskets = kept.select($"b").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    val item = kept.groupBy($"i").agg(count(lit(1)).as("supp_i"))
    // SHUFFLE_HASH on one side of the pair self-join (the q188 wedge
    // discipline): sort-merge sorted BOTH basket-item streams on b
    // before the C(k,2) expansion; hashing one side costs O(items/P)
    // per partition at any total scale and the expansion streams
    // unsorted (r19 A/B: 3.9-4.6 s -> 3.1-3.2 s at sf0.1)
    val pairs = kept
      .join(kept.select($"b", $"i".as("i2")).hint("shuffle_hash"), Seq("b"))
      .filter($"i" < $"i2")
      .groupBy($"i".as("item_a"), $"i2".as("item_b"))
      .agg(count(lit(1)).as("supp"))
      .filter($"supp" >= minSupport)
    // Materialize-contract handoff: the (minSupport-pruned) rule frame
    // is checkpointed and the basket-item checkpoint freed
    graft.engine.Materialize.handoff(
      pairs
        .join(item.select($"i".as("item_a"), $"supp_i".as("supp_a")),
          "item_a")
        .join(item.select($"i".as("item_b"), $"supp_i".as("supp_b")),
          "item_b")
        .crossJoin(nBaskets)
        .select($"item_a", $"item_b", $"supp", $"supp_a", $"supp_b",
          round($"supp" / $"supp_a", 4).as("conf_ab"),
          round($"supp" / $"supp_b", 4).as("conf_ba"),
          round($"supp" * $"n_baskets" / ($"supp_a" * $"supp_b"), 4)
            .as("lift")),
      Seq(kept))
  }

  // ------------------------------------------------------------------
  // fixture-bound oracle queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // parts co-ordered in the same order — the co-purchase rules behind
    // q188's triangle graph, with the full support/confidence/lift stats
    QueryDef(
      "q192_basket_rules",
      (s, dir) => {
        import s.implicits._
        val l = Tables.load(s, dir, "lineitem")
        associationRules(l, col("l_orderkey"), col("l_partkey"),
          minSupport = 2L)
          .orderBy(desc("supp"), $"item_a", $"item_b")
          .limit(100)
      },
      Some("""
        WITH bi AS (SELECT DISTINCT l_orderkey AS b, l_partkey AS i
                    FROM lineitem),
        kept AS (SELECT * FROM bi WHERE b IN (
                   SELECT b FROM bi GROUP BY b HAVING count(*) <= 1000)),
        nb AS (SELECT count(DISTINCT b) AS n_baskets FROM kept),
        item AS (SELECT i, count(*) AS supp_i FROM kept GROUP BY i),
        pairs AS (
          SELECT a.i AS item_a, c.i AS item_b, count(*) AS supp
          FROM kept a JOIN kept c ON a.b = c.b AND a.i < c.i
          GROUP BY a.i, c.i HAVING count(*) >= 2)
        SELECT item_a, item_b, supp, ia.supp_i AS supp_a,
               ib.supp_i AS supp_b,
               round(1.0 * supp / ia.supp_i, 4) AS conf_ab,
               round(1.0 * supp / ib.supp_i, 4) AS conf_ba,
               round(1.0 * supp * nb.n_baskets
                     / (ia.supp_i * ib.supp_i), 4) AS lift
        FROM pairs JOIN item ia ON pairs.item_a = ia.i
                   JOIN item ib ON pairs.item_b = ib.i
                   CROSS JOIN nb
        ORDER BY supp DESC, item_a, item_b
        LIMIT 100"""))
  )
}

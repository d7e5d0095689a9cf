package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Classic TPC-H query shapes (Q10/Q14/Q18/Q19/Q22, adapted to the
  * fixture schema) — each exercises an optimizer pattern beyond the
  * earlier joins: returned-item top-k (Q10), conditional aggregation over
  * a join (Q14), HAVING-subquery semi join (Q18), OR-of-ANDs predicate
  * bundles (Q19), and anti-join + scalar-subquery gating (Q22).
  */
object TpchShapes {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ----- Q10 shape: top returners in a quarter -------------------------
    QueryDef(
      "q80_returned_item_customers",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem").filter($"l_returnflag" === "R")
        val o = t(s, dir, "orders")
          .filter($"o_orderdate" >= lit("1997-01-01").cast("timestamp") &&
            $"o_orderdate" < lit("1997-07-01").cast("timestamp"))
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        li.join(o, $"l_orderkey" === $"o_orderkey")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .join(broadcast(n), $"c_nationkey" === $"n_nationkey")
          .groupBy($"c_custkey", $"c_name", $"n_name")
          .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4)
            .as("revenue"))
          .orderBy($"revenue".desc, $"c_custkey")
          .limit(20)
      },
      Some("""
        SELECT c_custkey, c_name, n_name,
               round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-07-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20""")),

    // ----- Q14 shape: promo revenue share --------------------------------
    QueryDef(
      "q81_promo_revenue_share",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
          .filter($"l_shipdate" >= lit("1997-01-01").cast("timestamp") &&
            $"l_shipdate" < lit("1998-01-01").cast("timestamp"))
        val p = t(s, dir, "part")
        li.join(broadcast(p), $"l_partkey" === $"p_partkey")
          .agg(
            round(
              sum(when($"p_type" === "PROMO",
                $"l_extendedprice" * (lit(1) - $"l_discount"))
                .otherwise(lit(0.0))) * 100.0 /
                sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4)
              .as("promo_pct"))
      },
      Some("""
        SELECT round(
                 sum(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
                 * 100.0 / sum(l_extendedprice * (1 - l_discount)), 4)
               AS promo_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'""")),

    // ----- Q18 shape: large-volume orders --------------------------------
    // The HAVING subquery becomes an aggregated semi side joined back —
    // one extra pass over lineitem, no correlated execution.
    QueryDef(
      "q82_large_volume_orders",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val big = li.groupBy($"l_orderkey".as("big_ok"))
          .agg(round(sum($"l_quantity"), 4).as("total_qty"))
          .filter($"total_qty" > 300.0)
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        o.join(big, $"o_orderkey" === $"big_ok")
          .join(broadcast(c), $"o_custkey" === $"c_custkey")
          .select($"c_custkey", $"c_name", $"o_orderkey", $"o_orderdate",
            round($"o_totalprice", 4).as("price"), $"total_qty")
          .orderBy($"price".desc, $"o_orderkey")
          .limit(50)
      },
      Some("""
        SELECT c_custkey, c_name, o_orderkey, o_orderdate,
               round(o_totalprice, 4) AS price, total_qty
        FROM orders
        JOIN (SELECT l_orderkey, round(sum(l_quantity), 4) AS total_qty
              FROM lineitem GROUP BY l_orderkey
              HAVING sum(l_quantity) > 300.0) big
          ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY price DESC, o_orderkey
        LIMIT 50""")),

    // ----- Q19 shape: OR-of-ANDs predicate brackets ----------------------
    QueryDef(
      "q83_bracketed_revenue",
      (s, dir) => {
        import s.implicits._
        val li = t(s, dir, "lineitem")
        val p = t(s, dir, "part")
        li.join(broadcast(p), $"l_partkey" === $"p_partkey")
          .filter(
            ($"p_brand" === "Brand#12" && $"p_size".between(1, 15) &&
              $"l_quantity".between(1, 11)) ||
              ($"p_brand" === "Brand#23" && $"p_size".between(1, 25) &&
                $"l_quantity".between(10, 20)) ||
              ($"p_brand" === "Brand#34" && $"p_size".between(1, 50) &&
                $"l_quantity".between(20, 30)))
          .agg(
            round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 4)
              .as("revenue"),
            count(lit(1)).as("n"))
      },
      Some("""
        SELECT round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
               count(*) AS n
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
               AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 50
               AND l_quantity BETWEEN 20 AND 30)""")),

    // ----- Q22 shape: well-funded customers who never ordered ------------
    QueryDef(
      "q84_dormant_rich_customers",
      (s, dir) => {
        import s.implicits._
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val avgBal = c.filter($"c_acctbal" > 0.0)
          .agg(avg($"c_acctbal").as("avg_bal"))
        c.join(broadcast(avgBal))
          .filter($"c_acctbal" > $"avg_bal")
          .join(o, $"c_custkey" === $"o_custkey", "left_anti")
          .groupBy($"c_nationkey")
          .agg(count(lit(1)).as("n_cust"),
            round(sum($"c_acctbal"), 4).as("total_bal"))
          .orderBy($"c_nationkey")
      },
      Some("""
        SELECT c_nationkey, count(*) AS n_cust,
               round(sum(c_acctbal), 4) AS total_bal
        FROM customer c
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey)
        GROUP BY c_nationkey
        ORDER BY c_nationkey"""))
  )
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Iterative graph compute: PageRank on an exact integer grid. The
  * companion of q100's connected components (pointer jumping) — where CC
  * converges in O(log d) rounds, PageRank is the fixed-iteration
  * propagate-and-sum shape most "importance over a relationship graph"
  * jobs reduce to. The reference could only express one iteration per
  * scheduled job, re-reading everything in between
  * (`/root/reference/scheduler.py:496-533`).
  *
  * Determinism: ranks live on a 1e-6 integer grid (longs), contributions
  * are integer divisions (`rank div deg`), damping is `(85 * x) div 100`
  * — no floating point anywhere, so Spark and the unrolled DuckDB replay
  * agree bit-for-bit, iteration by iteration (same trick as the q158
  * k-means geometry; floor-div rank leak is deliberate and identical in
  * both engines).
  *
  * Scale shape per iteration: ONE shuffle — contributions grouped by
  * dst (combiner-reduced map-side). The edge list joins the rank frame
  * on src; both sides hash-partition on the node id, and AQE reuses the
  * edge side's layout across iterations (edges+degrees are computed
  * once and cached). The driver holds two scalars (node count, loop
  * counter), never data.
  */
object Graph {

  private val S = 1000000L // rank grid: 1.0 == 1e6

  /** PageRank over a directed edge list (src, dst) for `iters`
    * fixed iterations, damping 0.85, on the integer grid. Every node
    * must appear as a src (feed a symmetrized edge list for undirected
    * graphs — that also rules out dangling-node rank loss). */
  def pageRank(edges: DataFrame, iters: Int): DataFrame = {
    val s = edges.sparkSession
    import s.implicits._
    val e = edges.select($"src", $"dst").distinct()
    val deg = e.groupBy($"src").agg(count(lit(1)).as("deg"))
    val e2 = e.join(deg, "src").cache()
    val nodes = e.select($"src".as("node")).distinct().cache()
    val n = nodes.count() // one scalar to the driver
    require(n > 0, "empty graph")
    val base = (15L * S) / (100L * n)
    var r = nodes.withColumn("rank", lit(S / n))
    for (_ <- 1 to iters) {
      val contribs = e2.join(r, e2("src") === r("node"))
        .select($"dst", expr("rank div deg").as("c"))
        .groupBy($"dst").agg(sum($"c").as("sc"))
      r = nodes.join(contribs, nodes("node") === contribs("dst"), "left")
        .select($"node",
          (lit(base) + expr("(85 * coalesce(sc, 0L)) div 100")).as("rank"))
    }
    r
  }

  // ------------------------------------------------------------------
  // fixture-bound oracle queries
  // ------------------------------------------------------------------

  /** Customer–supplier trade graph: an undirected edge per distinct
    * (customer, supplier) pair that traded, nodes namespaced by parity
    * (customer = 2·custkey, supplier = 2·suppkey + 1). */
  private def tradeEdges(s: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.load(s, dir, "orders")
    val l = Tables.load(s, dir, "lineitem")
    val pairs = l.join(o, l("l_orderkey") === o("o_orderkey"))
      .select(($"o_custkey" * 2).as("c"), ($"l_suppkey" * 2 + 1).as("p"))
      .distinct()
    pairs.select($"c".as("src"), $"p".as("dst"))
      .union(pairs.select($"p".as("src"), $"c".as("dst")))
  }

  private def oracleIter(prev: String, out: String): String =
    s"""$out AS (
       SELECT nodes.node,
              (15 * 1000000) // (100 * p.n)
              + (85 * coalesce(s.sc, 0)) // 100 AS rank
       FROM nodes CROSS JOIN p
       LEFT JOIN (SELECT e.dst, sum($prev.rank // deg.deg) AS sc
                  FROM e JOIN $prev ON e.src = $prev.node
                         JOIN deg ON e.src = deg.src
                  GROUP BY e.dst) s ON nodes.node = s.dst)"""

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q181_pagerank",
      (s, dir) => {
        import s.implicits._
        pageRank(tradeEdges(s, dir), iters = 3)
          .filter($"node" % 2 === 1)
          .select(expr("(node - 1) div 2").as("s_suppkey"), $"rank")
          .orderBy($"s_suppkey")
      },
      Some(s"""
        WITH e0 AS (
          SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        e AS (SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0),
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        nodes AS (SELECT DISTINCT src AS node FROM e),
        p AS (SELECT count(*) AS n FROM nodes),
        r0 AS (SELECT node, (1000000 // p.n) AS rank FROM nodes, p),
        ${oracleIter("r0", "r1")},
        ${oracleIter("r1", "r2")},
        ${oracleIter("r2", "r3")}
        SELECT (node - 1) // 2 AS s_suppkey,
               -- CAST: the HUGEINT from sum(rank // deg) propagates into
               -- rank; the driver's pandas fetch would float64 it
               CAST(rank AS BIGINT) AS rank
        FROM r3 WHERE node % 2 = 1
        ORDER BY s_suppkey"""))
  )
}

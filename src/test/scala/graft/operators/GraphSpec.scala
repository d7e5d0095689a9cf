package graft.operators

import scala.util.Random

import graft.SparkSpec

class GraphSpec extends SparkSpec {

  private def count(edges: Seq[(Long, Long)]): (Long, Long, Long) = {
    import spark.implicits._
    val r = Graph.triangleCount(edges.toDF("src", "dst")).collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2))
  }

  private def bruteTriangles(edges: Seq[(Long, Long)]): Long = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val nodes = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    (for {
      a <- nodes; b <- nodes if a < b && e((a, b))
      c <- nodes if b < c && e((b, c)) && e((a, c))
    } yield 1).size.toLong
  }

  test("K4 has 4 triangles; a path has none; dups/loops/reversals normalize") {
    val k4 = for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)
    assert(count(k4) == (4L, 6L, 4L))
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 4L))) == (4L, 3L, 0L))
    // same K4 fed with duplicates, reversed edges, and a self-loop
    val messy = k4 ++ k4.map(_.swap) ++ Seq((2L, 2L))
    assert(count(messy) == (4L, 6L, 4L))
  }

  test("labelPropagation: two bridged triangles converge to two communities") {
    import spark.implicits._
    // triangles {1,2,3} and {10,11,12} with a 3-10 bridge; symmetric input
    val und = Seq((1L, 2L), (1L, 3L), (2L, 3L),
      (10L, 11L), (10L, 12L), (11L, 12L), (3L, 10L))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    // hand-run of 3 synchronous rounds (majority label, ties -> smallest):
    //   r1: 1->2 2->1 3->1 10->3 11->10 12->10
    //   r2: 1->1 2->1 3->1 10->10 11->3 12->3
    //   r3: 1->1 2->1 3->1 10->3  11->3 12->3
    val got = Graph.labelPropagation(sym, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
  }

  test("khopDistances: path graph hops, multi-source min, cap respected") {
    import spark.implicits._
    // path 1-2-3-4-5 (symmetric), sources {1, 5}, 2 hops
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val sym = (und ++ und.map(_.swap)).toDF("src", "dst")
    val src = Seq(1L, 5L).toDF("node")
    val got = Graph.khopDistances(sym, src, maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 3 is reached at hop 2 from BOTH sources -> min 2; everything else
    // is 0 or 1; nothing is farther than 2 on this graph
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
    val one = Graph.khopDistances(sym, Seq(1L).toDF("node"), maxHops = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == Map(1L -> 0L, 2L -> 1L, 3L -> 2L)) // 4,5 beyond the cap
  }

  test("random graph matches brute force (hub-skewed degrees)") {
    val rnd = new Random(3)
    // a hub (node 0) connected widely + random sparse edges: exercises
    // the degree orientation where naive id-ordering would blow up
    val edges = ((1L to 40L).map(i => (0L, i)) ++
      Seq.fill(120)((rnd.nextInt(41).toLong, rnd.nextInt(41).toLong)))
      .filter(p => p._1 != p._2)
    val (_, _, tri) = count(edges)
    assert(tri == bruteTriangles(edges))
    assert(tri > 0, "fixture must contain triangles")
  }

  test("personalized PageRank: mass decays from the seed, zero elsewhere") {
    import spark.implicits._
    // path a(1)-b(2)-c(3), symmetric; isolated pair d(4)-e(5); seed {a}.
    // Hand-unrolled 2 iterations on the integer grid:
    //   r0: a=1e6           | iter1: a=150000, b=850000
    //   iter2: a=150000+85*(850000 div 2) div 100 = 511250
    //          b=85*150000 div 100 = 127500, c=85*425000 div 100=361250
    //   d,e never touched -> exactly 0
    val sym = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L),
      (4L, 5L), (5L, 4L)).toDF("src", "dst")
    val got = Graph.personalizedPageRank(sym, Seq(1L).toDF("node"), 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 511250L, 2L -> 127500L, 3L -> 361250L,
      4L -> 0L, 5L -> 0L))
  }
}

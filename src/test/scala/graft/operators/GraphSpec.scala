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

  test("weightedPageRank matches a driver-side integer replay; w=1 equals unweighted") {
    import spark.implicits._
    val rnd = new Random(17)
    val raw = Seq.fill(150)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong,
      (rnd.nextInt(9) + 1).toLong)).filter(e => e._1 != e._2)
    val edges = raw.toDF("src", "dst", "w")
    val iters = 3
    val got = Graph.weightedPageRank(edges, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // driver replay of the exact integer-grid recurrence
    val wsum = raw.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).sum).toMap // parallel edges collapse by sum
    val outW = wsum.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nodes = wsum.keys.map(_._1).toSet
    val n = nodes.size
    var rank = nodes.map(_ -> 1000000L / n).toMap
    for (_ <- 1 to iters) {
      val contrib = wsum.toSeq.groupBy(_._1._2).view.mapValues(_.map {
        case ((s, _), w) => rank(s) * w / outW(s)
      }.sum).toMap
      rank = nodes.map(v =>
        v -> (150000L / n + 85L * contrib.getOrElse(v, 0L) / 100L)).toMap
    }
    assert(got == rank)
    // the unweighted operator IS the w=1 case: identical output
    val uni = raw.map(e => (e._1, e._2)).distinct
    val a = Graph.pageRank(uni.toDF("src", "dst"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.weightedPageRank(
      uni.map(e => (e._1, e._2, 1L)).toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("weightedLabelPropagation: volume outvotes edge count") {
    import spark.implicits._
    // node 3 has TWO light edges into the {1,2} community and ONE heavy
    // edge to node 9: unweighted LPA pulls it left, weighted pulls right
    val e = Seq(
      (1L, 2L, 1L), (2L, 1L, 1L), // left community
      (3L, 1L, 1L), (1L, 3L, 1L), (3L, 2L, 1L), (2L, 3L, 1L),
      (3L, 9L, 10L), (9L, 3L, 10L)) // one heavy trade partner
      .toDF("src", "dst", "w")
    val weighted = Graph.weightedLabelPropagation(e, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round 1, node 3's votes: label1 w=1, label2 w=1, label9 w=10 -> 9
    assert(weighted(3L) == 9L)
    val unweighted = Graph.labelPropagation(
      e.select($"src", $"dst"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // unweighted votes: labels 1,2,9 one each -> smallest label wins
    assert(unweighted(3L) == 1L)
  }

  /** Driver-side replay of the bounded peel: `rounds` rounds of
    * "drop nodes with degree < k", on a both-direction edge set. */
  private def brutePeel(edges: Seq[(Long, Long)], k: Int,
      rounds: Int): Map[Long, Long] = {
    var e = edges.toSet
    for (_ <- 1 to rounds) {
      val deg = e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val keep = deg.filter(_._2 >= k).keySet
      e = e.filter(p => keep(p._1) && keep(p._2))
    }
    e.groupBy(_._1).view.mapValues(_.size.toLong).toMap
  }

  test("kCore: pendant chain peels off a clique; cascade needs rounds") {
    import spark.implicits._
    // K4 on {1..4} plus chain 4-5-6: 6 peels in round 1 (deg 1 < 2),
    // 5 only in round 2 (its degree drops to 1 after 6 leaves)
    val und = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)) ++
      Seq((4L, 5L), (5L, 6L))
    val e = (und ++ und.map(_.swap)).toDF("src", "dst")
    def run(rounds: Int): Map[Long, Long] =
      Graph.kCore(e, k = 2, rounds = rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r1 = run(1)
    assert(r1.contains(5L) && !r1.contains(6L))
    val r2 = run(2)
    assert(r2 == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("weightedKCore: strength peel matches a driver-side replay; w=1 equals kCore") {
    import spark.implicits._
    val rnd = new Random(23)
    val und = (1 to 80).map(_ =>
      (rnd.nextInt(20).toLong, rnd.nextInt(20).toLong, 1L + rnd.nextInt(5)))
      .filter(p => p._1 != p._2)
      .groupBy(p => (p._1, p._2)).map(_._2.head).toSeq
    val both = und ++ und.map(p => (p._2, p._1, p._3))
    // driver-side strength peel
    def replay(minS: Double, rounds: Int): Map[Long, Double] = {
      var e = both
      for (_ <- 1 to rounds) {
        val str = e.groupBy(_._1).view.mapValues(_.map(_._3).sum.toDouble).toMap
        val keep = str.filter(_._2 >= minS).keySet
        e = e.filter(p => keep(p._1) && keep(p._2))
      }
      e.groupBy(_._1).view.mapValues(_.map(_._3).sum.toDouble).toMap
    }
    val df = both.toDF("src", "dst", "w")
    for (minS <- Seq(6.0, 12.0); rounds <- Seq(1, 3)) {
      val got = Graph.weightedKCore(df, minS, rounds)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got == replay(minS, rounds), s"minS=$minS rounds=$rounds")
    }
    // w=1 degenerates to the unweighted peel (on UNIQUE pairs: the
    // weighted path sums parallel edges, the unweighted path dedups)
    val uniq = both.map(p => (p._1, p._2)).distinct
    val unitW = uniq.map(p => (p._1, p._2, 1L)).toDF("src", "dst", "w")
    val w1 = Graph.weightedKCore(unitW, 3.0, 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1).toLong).toMap
    val un = Graph.kCore(uniq.toDF("src", "dst"), 3, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w1 == un)
  }

  test("kCore: random graphs match the driver-side replay, several k/rounds") {
    import spark.implicits._
    val rnd = new Random(11)
    val und = (1 to 160).map(_ =>
      (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter(p => p._1 != p._2).distinct
    val both = (und ++ und.map(_.swap)).distinct
    val e = both.toDF("src", "dst")
    for (k <- Seq(2, 4, 8); rounds <- Seq(1, 3)) {
      val got = Graph.kCore(e, k, rounds)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == brutePeel(both, k, rounds), s"k=$k rounds=$rounds")
    }
  }
}

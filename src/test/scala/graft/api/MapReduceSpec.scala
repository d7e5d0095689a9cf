package graft.api

import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

class MapReduceSpec extends SparkSpec {

  private def checkProp(p: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  test("groupRuns splits a sorted iterator into maximal key runs") {
    val in = Iterator(("a", 1), ("a", 2), ("b", 3), ("c", 4), ("c", 5))
    val out = MapReduce.groupRuns(in).map { case (k, vs) => (k, vs.toList) }.toList
    assert(out == List(("a", List(1, 2)), ("b", List(3)), ("c", List(4, 5))))
  }

  test("groupRuns drains an unconsumed group before advancing") {
    val in = Iterator(("a", 1), ("a", 2), ("b", 3))
    val it = MapReduce.groupRuns(in)
    val (k1, _) = it.next() // never consume the values
    assert(k1 == "a")
    val (k2, vs2) = it.next()
    assert(k2 == "b" && vs2.toList == List(3))
    assert(!it.hasNext)
  }

  test("groupRuns on empty input") {
    assert(MapReduce.groupRuns(Iterator.empty[(String, Int)]).isEmpty)
  }

  test("groupRuns property: reassembles the original grouping") {
    val gen = Gen.listOf(Gen.zip(Gen.choose(-5, 5), Gen.choose(0, 100)))
    checkProp(Prop.forAll(gen) { xs =>
      val sorted = xs.sorted
      val regrouped = MapReduce.groupRuns(sorted.iterator)
        .flatMap { case (k, vs) => vs.map((k, _)).toList }.toList
      regrouped == sorted
    })
  }

  test("token count via the compat API matches a direct groupBy") {
    import spark.implicits._
    val lines = Seq("a b a", "b c", "a").toDS()
    val mr = MapReduce.run[String, String, Long, (String, Long)](
      lines,
      l => l.split(" ").iterator.filter(_.nonEmpty).map((_, 1L)),
      (t, ones) => Iterator.single((t, ones.sum)))
      .collect().toMap
    assert(mr == Map("a" -> 3L, "b" -> 2L, "c" -> 1L))
  }

  test("reduce sees values in ascending order (secondary sort contract)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = rnd.shuffle((1 to 500).toList).map(i => (i % 7, i)).toDS()
    val ok = MapReduce.run[(Int, Int), Int, Int, Boolean](
      rows,
      r => Iterator.single((r._1, r._2)),
      (_, vs) => {
        val l = vs.toList
        Iterator.single(l == l.sorted)
      },
      numPartitions = Some(3))
      .collect()
    assert(ok.length == 7 && ok.forall(identity))
  }

  test("empty map emission drops rows; empty reduce emission drops groups") {
    import spark.implicits._
    val lines = Seq("keep", "drop", "keep").toDS()
    val out = MapReduce.run[String, String, Long, String](
      lines,
      l => if (l == "drop") Iterator.empty else Iterator.single((l, 1L)),
      (k, vs) => if (vs.sum >= 2) Iterator.single(k) else Iterator.empty)
      .collect()
    assert(out.toList == List("keep"))
  }

  test("incrementation law: agg(A ++ B) == merge(agg(A), agg(B))") {
    // the reference's f(A+B) = f(A) + f(B) (/root/reference/README.txt:18)
    import spark.implicits._
    def agg(xs: List[(Int, Int)]): Map[Int, Long] =
      if (xs.isEmpty) Map.empty
      else MapReduce.run[(Int, Int), Int, Long, (Int, Long)](
        xs.toDS(),
        r => Iterator.single((r._1, r._2.toLong)),
        (k, vs) => Iterator.single((k, vs.sum)))
        .collect().toMap
    val rnd = new scala.util.Random(7)
    (1 to 3).foreach { _ =>
      val a = List.fill(rnd.nextInt(30))((rnd.nextInt(5), rnd.nextInt(100)))
      val b = List.fill(rnd.nextInt(30))((rnd.nextInt(5), rnd.nextInt(100)))
      val merged = (agg(a).toSeq ++ agg(b).toSeq)
        .groupMapReduce(_._1)(_._2)(_ + _)
      assert(merged == agg(a ++ b))
    }
  }

  test("downsampleFiles is deterministic and roughly proportional") {
    val paths = (1 to 1000).map(i => s"/data/part-$i.json")
    val s1 = MapReduce.downsampleFiles(paths, 0.2)
    val s2 = MapReduce.downsampleFiles(paths, 0.2)
    assert(s1 == s2)
    assert(s1.size > 100 && s1.size < 320)
    assert(MapReduce.downsampleFiles(paths, 0.0).isEmpty)
    assert(MapReduce.downsampleFiles(paths, 1.0).size == 1000)
  }
}

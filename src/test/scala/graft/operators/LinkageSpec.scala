package graft.operators

import graft.SparkSpec

/** The fixture oracle (q174) only exercises equal-length substitutions;
  * these pin the LOSSLESS claim of the deletion-neighborhood blocker on
  * inputs with insertions/deletions and k=2, against brute force. */
class LinkageSpec extends SparkSpec {

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private val names = Seq(
    "graphite", "graphte", "grphite",   // deletions of each other
    "graphites", "xgraphite",           // insertions
    "graffite", "grapiste",             // substitutions / mixed
    "marble", "marbles", "mrbl",        // a second cluster + far point
    "quartz")

  private def bruteForce(k: Int): Set[(String, String, Int)] =
    (for {
      a <- names; b <- names if a < b
      d = lev(a, b) if d <= k
    } yield (a, b, d)).toSet

  private def viaBlocker(k: Int): Set[(String, String, Int)] = {
    import spark.implicits._
    Linkage.fuzzySelfJoin(names.toDF("s"), "s", k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
  }

  test("k=1: blocker+verify equals brute force (indels included)") {
    assert(viaBlocker(1) == bruteForce(1))
  }

  test("k=2: blocker+verify equals brute force (indels included)") {
    val bf = bruteForce(2)
    assert(bf.exists(_._3 == 2), "fixture must contain true distance-2 pairs")
    assert(viaBlocker(2) == bf)
  }

  test("length<2 names with k=2: still lossless, no malformed variants") {
    import spark.implicits._
    // sequence(1, length-1) would be a DESCENDING [1,0] for 1-char names
    // without the guard; losslessness must survive because del1 already
    // yields "" for them ("a"~"bc" at distance 2 share only "")
    val short = Seq("a", "b", "ab", "bc", "xyz")
    val bf = (for {
      x <- short; y <- short if x < y
      d = lev(x, y) if d <= 2
    } yield (x, y, d)).toSet
    val got = Linkage.fuzzySelfJoin(short.toDF("s"), "s", 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(got == bf)
    // and the variant generator emits no malformed strings for 1-char
    // input: exactly the identity and the single deletion
    val vs = Seq("a").toDF("s")
      .selectExpr("explode(array_distinct(flatten(array(array(s), " +
        "transform(sequence(1, length(s)), i -> concat(left(s, i - 1), " +
        "substring(s, i + 1, 1000000)))))))")
      .collect().map(_.getString(0)).toSet
    assert(vs == Set("a", ""))
  }

  test("duplicate input names collapse — no self pairs emitted") {
    import spark.implicits._
    val r = Linkage.fuzzySelfJoin(
      Seq("same", "same", "samey").toDF("s"), "s", 2).collect()
    assert(r.map(x => (x.getString(0), x.getString(1))).toSet ==
      Set(("same", "samey")))
  }
}

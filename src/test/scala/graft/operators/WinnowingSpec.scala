package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

class WinnowingSpec extends SparkSpec {

  private def fps(docs: Seq[(Long, String)], k: Int = 3, w: Int = 4)
      : Map[Long, Set[Long]] = {
    val s = spark
    import s.implicits._
    Winnowing.fingerprints(docs.toDF("doc_id", "text"), "doc_id", "text", k, w)
      .collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(1)).toSet).toMap
  }

  test("winnowing guarantee: shared >= w+k-1 token run shares a fingerprint") {
    // docs share a 6-token run (= w+k-1 for k=3, w=4) amid distinct text
    val shared = "alpha beta gamma delta epsilon zeta"
    val m = fps(Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight $shared nine ten eleven twelve")))
    assert((m(1L) intersect m(2L)).nonEmpty)
  }

  test("disjoint vocabularies share nothing") {
    val m = fps(Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "k l m n o p q r s t")))
    assert((m(1L) intersect m(2L)).isEmpty)
  }

  test("identical docs have identical fingerprint sets; density ~2/(w+1)") {
    val text = ((1 to 200).map(i => s"tok${i % 37}")).mkString(" ")
    val m = fps(Seq((1L, text), (2L, text)))
    assert(m(1L) == m(2L))
    // 198 k-grams, 195 windows: distinct minima well under the k-gram count
    assert(m(1L).size < 198 / 2)
    assert(m(1L).nonEmpty)
  }

  test("short docs: under k tokens no rows, under k+w-1 one global min") {
    val s = spark
    import s.implicits._
    val out = Winnowing.fingerprints(
      Seq((1L, "just two"), (2L, "alpha beta gamma delta")).toDF("doc_id", "text"),
      "doc_id", "text", 3, 4)
      .collect().groupBy(_.getLong(0))
    assert(!out.contains(1L)) // 2 tokens < k
    assert(out(2L).length == 1) // 2 k-grams, 1 window -> 1 fingerprint
  }

  test("fingerprints are a subset of the doc's k-gram hashes (locality)") {
    val text = (1 to 50).map(i => s"w${(i * 7) % 23}").mkString(" ")
    val m = fps(Seq((1L, text)))
    // recompute all k-gram hashes via the same engine expression at w=1
    // (every window of size 1 keeps its element = the full hash set)
    val all = fps(Seq((1L, text)), k = 3, w = 1)(1L)
    assert(m(1L).subsetOf(all))
  }
}

package graft.operators

import graft.SparkSpec

/** Unit tests for the dedup library functions on tiny synthetic corpora
  * (the fixture-bound oracle queries cover them at sf0.01; these pin the
  * API semantics on arbitrary inputs). */
class DedupSpec extends SparkSpec {

  private def docs(rows: (Long, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("exact: groups identical texts, keeps the min doc_id") {
    val d = docs((1L, "a b c"), (2L, "a b c"), (3L, "x y z"))
    val r = Dedup.exact(d).collect()
      .map(x => (x.getLong(1), x.getLong(2))).toSet
    assert(r == Set((1L, 2L), (3L, 1L))) // (keep_doc_id, n_copies)
  }

  test("shingleRows: positional 3-gram shingles, distinct per doc") {
    val d = docs((1L, "a b c d"), (2L, "a b"))
    val r = Dedup.shingleRows(d).collect()
      .map(x => (x.getLong(0), x.getString(1))).toSet
    assert(r == Set((1L, "a b c"), (1L, "b c d"))) // doc 2: too short
  }

  test("jaccardPairs finds a planted near-duplicate and skips unrelated docs") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 29).map(i => s"tok$i").mkString(" ") + " tokX"
    val other = (100 to 130).map(i => s"w$i").mkString(" ")
    val r = Dedup.jaccardPairs(
      docs((1L, base), (2L, nearDup), (3L, other)), 0.5).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSet == Set((1L, 2L)))
    assert(r.head.getDouble(2) > 0.8)
  }

  test("minhashLshPairs agrees with exact jaccard on a planted pair") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"tok$i").mkString(" ") + " tokX"
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val r = Dedup.minhashLshPairs(
      docs((1L, base), (2L, nearDup), (3L, other)), 0.5).collect()
    assert(r.map(x => (x.getLong(0), x.getLong(1))).toSet == Set((1L, 2L)))
  }

  test("simhash: identical docs get identical fingerprints, disjoint docs differ") {
    val d = docs((1L, "a b c d e"), (2L, "a b c d e"), (3L, "v w x y z"))
    val r = Dedup.simhash(d).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r(1L) == r(2L))
    assert(r(1L) != r(3L))
    assert(r.values.forall(v => v >= 0 && v < (1L << 32)))
  }

  test("dropNearDuplicates keeps cluster minimum and unrelated docs") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val nearDup = (1 to 39).map(i => s"tok$i").mkString(" ") + " tokX"
    val other = (100 to 140).map(i => s"w$i").mkString(" ")
    val kept = Dedup.dropNearDuplicates(
      docs((1L, base), (2L, nearDup), (3L, other)), 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 3L))
  }
}

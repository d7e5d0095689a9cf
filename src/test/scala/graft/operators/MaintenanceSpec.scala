package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MaintenanceSpec extends SparkSpec {

  private def stateOf(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    Maintenance.aggState(rows.toDF("k", "v"), col("k"), col("v"))
  }

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq

  test("joinDelta law: old join ++ delta == full new join, multiset-exact") {
    import spark.implicits._
    val rnd = new Random(23)
    // duplicate keys on both sides (multiset multiplicities matter)
    val a = Seq.fill(120)((rnd.nextInt(20).toLong, rnd.nextInt(2).toLong))
    val b = Seq.fill(150)((rnd.nextInt(20).toLong, rnd.nextInt(3).toLong))
    val (aOld, aDelta) = a.splitAt(70)
    val (bOld, bDelta) = b.splitAt(90)
    def df(x: Seq[(Long, Long)], v: String) = x.toDF("k", v)
    val delta = Maintenance.joinDelta(
      df(aOld, "av"), df(aDelta, "av"),
      df(bOld, "bv"), df(bDelta, "bv"), "k")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def joined(x: Seq[(Long, Long)], y: Seq[(Long, Long)]) =
      for ((k, av) <- x; (k2, bv) <- y if k == k2) yield (k, av, bv)
    val expectedNew = joined(a, b).groupBy(identity).view.mapValues(_.size)
    val oldJ = joined(aOld, bOld).groupBy(identity).view.mapValues(_.size)
    val got = (delta.toSeq.groupBy(identity).view.mapValues(_.size).toMap
      .toSeq ++ oldJ.toSeq).groupBy(_._1).view
      .mapValues(_.map(_._2).sum).toMap
    assert(got == expectedNew.toMap)
  }

  test("merge law: mergeState(agg(A), agg(B)) == agg(A ++ B), any split/order") {
    val rnd = new Random(42)
    for (trial <- 1 to 5) {
      val all = Seq.fill(200 + trial)(
        (rnd.nextInt(20).toLong, rnd.nextLong() % 10000)) // negatives incl.
      val (a, b) = all.splitAt(rnd.nextInt(all.size))
      val merged = Maintenance.mergeState(stateOf(a), stateOf(b))
      val full = stateOf(all)
      assert(canon(merged) == canon(full), s"trial $trial")
      // commutativity: B-then-A gives the identical state
      assert(canon(Maintenance.mergeState(stateOf(b), stateOf(a))) ==
        canon(full), s"trial $trial (commuted)")
    }
  }

  test("empty delta is the identity; disjoint keys union") {
    val a = stateOf(Seq((1L, 5L), (1L, 7L)))
    val none = stateOf(Seq.empty)
    assert(canon(Maintenance.mergeState(a, none)) == canon(a))
    val b = stateOf(Seq((2L, -3L)))
    assert(canon(Maintenance.mergeState(a, b)) ==
      Seq((1L, 2L, 12L, 5L, 7L), (2L, 1L, -3L, -3L, -3L)))
  }

  test("associativity across three batches") {
    val (a, b, c) = (stateOf(Seq((1L, 1L), (2L, 2L))),
      stateOf(Seq((1L, 10L))), stateOf(Seq((2L, -5L), (3L, 0L))))
    val left = Maintenance.mergeState(Maintenance.mergeState(a, b), c)
    val right = Maintenance.mergeState(a, Maintenance.mergeState(b, c))
    assert(canon(left) == canon(right))
  }

  test("signed retraction: exact n/s, targeted min/max repair, zero-count keys drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def st(rows: Seq[(Long, Long)], sg: Int) =
      Maintenance.signedState(rows.toDF("k", "v"), col("k"), col("v"), lit(sg))
    // key 1: values {5, 9}; retract the min (5) -> repair must find 9
    // key 2: values {3, 7}; retract a middle-insert copy? retract 7 (max)
    // key 3: single value fully retracted -> key disappears
    val ins = st(Seq((1L, 5L), (1L, 9L), (2L, 3L), (2L, 7L), (3L, 4L)), 1)
    val del = st(Seq((1L, 5L), (2L, 7L), (3L, 4L)), -1)
    val merged = Maintenance.mergeSigned(ins, del)
    val flags = merged.select("k", "needs_repair").collect()
      .map(r => (r.getLong(0), r.getBoolean(1))).toMap
    assert(flags == Map(1L -> true, 2L -> true)) // 3 dropped (n=0)
    val live = Seq((1L, 9L), (2L, 3L)).toDF("k", "v")
    val repaired = Maintenance.repairMinMax(merged, live, col("k"), col("v"))
    val out = repaired.orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq((1L, 1L, 9L, 9L, 9L), (2L, 1L, 3L, 3L, 3L)))
    // repaired state composes: a further insert batch merges cleanly
    // and needs no repair when no retraction is present
    val more = st(Seq((1L, 2L), (4L, 8L)), 1)
    val again = Maintenance.mergeSigned(repaired, more)
    val a1 = again.filter(col("k") === 1L).collect().head
    assert(a1.getLong(1) == 2L && a1.getLong(2) == 11L &&
      a1.getLong(3) == 2L && a1.getLong(4) == 9L &&
      !a1.getBoolean(a1.fieldIndex("needs_repair")))
  }

  test("retraction NOT at an extremum does not flag repair") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def st(rows: Seq[(Long, Long)], sg: Int) =
      Maintenance.signedState(rows.toDF("k", "v"), col("k"), col("v"), lit(sg))
    val ins = st(Seq((1L, 1L), (1L, 5L), (1L, 9L)), 1)
    val del = st(Seq((1L, 5L)), -1)
    val m = Maintenance.mergeSigned(ins, del).collect().head
    assert(!m.getBoolean(m.fieldIndex("needs_repair")))
    assert(m.getLong(m.fieldIndex("n")) == 2L &&
      m.getLong(m.fieldIndex("s")) == 10L)
  }

  test("tokenBudgetSelect equals the global-window phrasing, budgets swept") {
    import spark.implicits._
    val rnd = new Random(11)
    // texts with tied n_chars across bucket boundaries
    val docs = (1L to 150L).map { id =>
      val n = 1 + rnd.nextInt(12)
      (id, Seq.fill(n)("w").mkString(" "))
    }.map { case (id, text) => (id, text, text.length.toLong) }
      .toDF("doc_id", "text", "n_chars")
    def brute(budget: Long): Set[Long] = {
      val rows = docs.select("doc_id", "n_chars", "text").collect()
        .map(r => (r.getLong(0), r.getLong(1),
          r.getString(2).split(" ").length.toLong))
        .sortBy { case (id, nc, _) => (-nc, id) }
      var cum = 0L
      rows.takeWhile { case (_, _, t) => { cum += t; cum <= budget } }
        .map(_._1).toSet
    }
    for (budget <- Seq(0L, 37L, 200L, 420L, 100000L);
         width <- Seq(1L, 4L, 64L)) {
      val got = TrainingPipeline.tokenBudgetSelect(docs, budget, width)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert(got == brute(budget), s"budget=$budget width=$width")
    }
  }
}

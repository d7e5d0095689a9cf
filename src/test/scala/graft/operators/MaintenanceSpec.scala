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

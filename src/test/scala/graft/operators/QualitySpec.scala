package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class QualitySpec extends SparkSpec {

  test("checkRules: one scan, per-rule counts, NULL predicate = violation") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "ok"), (2L, "bad"), (null, "ok"), (4L, null))
      .toDF("v", "tag")
    val out = Quality.checkRules(df, Seq(
      // v > 1 is NULL for the null row -> counts as a violation
      "v_gt_1" -> !($"v" > 1L),
      "tag_ok" -> ($"tag" =!= "ok")))
      .orderBy("rule").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // v_gt_1: row 1 (1 > 1 false -> violation true), row 3 (NULL -> viol)
    // tag_ok: row 2 ("bad") and row 4 (NULL tag -> viol)
    assert(out.toSeq == Seq(("tag_ok", 4L, 2L), ("v_gt_1", 4L, 2L)))
  }

  test("refViolations and duplicateKeys") {
    import spark.implicits._
    val child = Seq((1L, "a"), (2L, "b"), (9L, "c"), (9L, "d"))
      .toDF("k", "payload")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val orphans = Quality.refViolations(child, "k", parent, "pk")
      .select("k").collect().map(_.getLong(0)).toSet
    assert(orphans == Set(9L))
    val dups = Quality.duplicateKeys(child, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(dups == Set((9L, 2L)))
  }
}

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

  test("kAnonymize: rare QI combos generalize to '*' with the count " +
      "withheld; rows are never dropped; k-sized groups pass exactly") {
    import spark.implicits._
    val df = Seq(
      (1L, "de", 10, "alice"), (2L, "de", 10, "bob"),
      (3L, "de", 20, "carol"), // singleton -> suppressed at k=2
      (4L, "fr", 10, "dave"), (5L, "fr", 10, "eve"), (6L, "fr", 10, "mallory"))
      .toDF("id", "country", "age_band", "name")
    val r = Quality.kAnonymize(df, "id", Seq("country", "age_band"), k = 2)
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getString(2),
        x.getBoolean(3), if (x.isNullAt(4)) -1L else x.getLong(4)))
    assert(r.length == 6) // row count preserved
    assert(r(0) == ((1L, "de", "10", false, 2L)))
    assert(r(1) == ((2L, "de", "10", false, 2L))) // exactly k passes
    assert(r(2) == ((3L, "*", "*", true, -1L))) // suppressed, count withheld
    assert(r(3) == ((4L, "fr", "10", false, 3L)))
    assert(r(5) == ((6L, "fr", "10", false, 3L)))
    // the PII payload column is dropped from the export: only id, QI,
    // and audit columns survive
    val out = Quality.kAnonymize(df, "id", Seq("country", "age_band"), 2)
    assert(out.columns.toSeq ==
      Seq("id", "country", "age_band", "suppressed", "n_group"))
  }

  test("kAnonymize: NULL QI rows are PRESERVED (suppressed or passed), " +
      "never dropped; payload columns named n_group don't collide") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("de"), "x"), (2L, Some("de"), "y"),
      (3L, None, "z"), // singleton NULL-QI group -> suppressed, kept
      (4L, None, "w"), (5L, None, "v")) // NULL group of 2 -> passes k=2
      .toDF("id", "country", "n_group") // payload deliberately n_group
    val base = df.filter($"id" <= 3)
    val r3 = Quality.kAnonymize(base, "id", Seq("country"), 2)
      .orderBy("id").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getBoolean(2),
        if (x.isNullAt(3)) -1L else x.getLong(3)))
    assert(r3.length == 3, "NULL-QI row was dropped")
    assert(r3(2) == ((3L, "*", true, -1L)))
    // a NULL group that reaches k passes with its (null) value intact
    val r5 = Quality.kAnonymize(df.filter($"id" >= 3), "id",
      Seq("country"), 2).orderBy("id").collect()
    assert(r5.length == 3)
    assert(r5.count(_.getBoolean(2)) == 0) // 3 NULLs >= k: none suppressed
    assert(r5.forall(x => x.isNullAt(1))) // value stays null, not '*'
  }

  test("pairCountingEval: hand-checked contingency combinatorics") {
    val s = spark
    import s.implicits._
    // truth {1,2,3},{4,5}; pred merges everything but 5, splits 5 out:
    // tp pairs: C(3,2)=3 (cluster A∩X) + 0; pred pairs C(4,2)=6 -> fp 3;
    // truth pairs 3+1=4 -> fn 1
    val pred = Seq((1L, "x"), (2L, "x"), (3L, "x"), (4L, "x"), (5L, "y"))
      .toDF("id", "p")
    val truth = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"))
      .toDF("id", "t")
    val r = Quality.pairCountingEval(pred, truth, "id", "p", "t").collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 3L, 1L)))
    // perfect clustering: fp = fn = 0
    val perfect = Quality.pairCountingEval(
      truth.withColumnRenamed("t", "p"), truth, "id", "p", "t").collect()(0)
    assert((perfect.getLong(0), perfect.getLong(1), perfect.getLong(2)) ==
      ((4L, 0L, 0L)))
    // singletons everywhere: zero pairs on both sides
    val single = Seq((1L, "s1"), (2L, "s2")).toDF("id", "p")
    val r2 = Quality.pairCountingEval(single,
      single.withColumnRenamed("p", "t"), "id", "p", "t").collect()(0)
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) == ((0L, 0L, 0L)))
  }
}

package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import Maintenance._

/** Laws of the round-11 mergeable summaries: bottom-k (KMV) sample
  * state, Misra–Gries heavy hitters, and the bounded drift metrics on
  * quantile states. */
class MergeableStateSpec extends SparkSpec {

  import spark.implicits._

  private def values(n: Int) = spark.range(n.toLong)
    .selectExpr("id % 3 AS grp", "(id * 37) % 1000 AS v")

  test("bottom-k merge law: merge(state(A), state(B)) == state(A ∪ B) " +
      "bit-for-bit") {
    val all = values(5000)
    val a = all.filter($"v" % 2 === 0)
    val b = all.filter($"v" % 2 === 1)
    val k = 16
    val merged = mergeBottomK(
      bottomKState(a, $"grp", $"v", k),
      bottomKState(b, $"grp", $"v", k), k)
    val single = bottomKState(all, $"grp", $"v", k)
    assert(merged.exceptAll(single).isEmpty && single.exceptAll(merged).isEmpty)
  }

  test("bottom-k merge is order-independent and idempotent on overlap") {
    val all = values(3000)
    val a = all.filter($"v" < 700) // overlapping splits
    val b = all.filter($"v" >= 300)
    val k = 8
    val ab = mergeBottomK(bottomKState(a, $"grp", $"v", k),
      bottomKState(b, $"grp", $"v", k), k)
    val ba = mergeBottomK(bottomKState(b, $"grp", $"v", k),
      bottomKState(a, $"grp", $"v", k), k)
    val single = bottomKState(all, $"grp", $"v", k)
    assert(ab.exceptAll(ba).isEmpty && ba.exceptAll(ab).isEmpty)
    assert(ab.exceptAll(single).isEmpty && single.exceptAll(ab).isEmpty)
  }

  test("unsaturated keys report their EXACT distinct count") {
    val df = spark.range(40).selectExpr("id % 2 AS grp", "id AS v")
    val est = distinctFromBottomK(bottomKState(df, $"grp", $"v", 64), 64)
      .collect()
    assert(est.forall(r => !r.getAs[Boolean]("saturated")))
    assert(est.forall(r => r.getAs[Double]("ndv_est") === 20.0))
  }

  test("saturated KMV estimate lands near the true distinct count") {
    // 1000 distinct values per group, k = 64: the (k-1)/U(k) estimator's
    // relative error concentrates around 1/sqrt(k-2) ≈ 13%; this fixture
    // is deterministic, so pin a generous-but-meaningful band
    val df = values(30000)
    val est = distinctFromBottomK(bottomKState(df, $"grp", $"v", 64), 64)
      .collect()
    assert(est.length === 3)
    est.foreach { r =>
      assert(r.getAs[Boolean]("saturated"))
      val e = r.getAs[Double]("ndv_est")
      assert(e > 600 && e < 1500, s"estimate $e implausible for ndv=1000")
    }
  }

  test("MG state: true count within [c_min, c_max] for survivors; " +
      "absent items bounded by the banked mass; totals exact") {
    val df = spark.range(20000)
      // zipf-ish: item j appears ~ 1/(j+1) of the time
      .selectExpr("id % 2 AS grp",
        "CAST(floor(sqrt(id % 10000)) AS BIGINT) % 40 AS item")
    val m = 6
    val state = heavyHitterState(df, $"grp", $"item", m)
    val read = heavyHittersFromState(state).collect()
    val exact = df.groupBy($"grp", $"item").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val totals = df.groupBy($"grp").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // survivors: certified bounds hold
    read.foreach { r =>
      val key = (r.getAs[Long]("k"), r.getAs[Long]("i"))
      val t = exact(key)
      assert(r.getAs[Long]("c_min") <= t && t <= r.getAs[Long]("c_max"),
        s"$key true=$t outside [${r.getAs[Long]("c_min")}, " +
          s"${r.getAs[Long]("c_max")}]")
      assert(r.getAs[Long]("n_total") === totals(key._1))
    }
    // state row bound: ≤ m items + 1 NULL row per key
    val perKey = state.groupBy($"k").count().collect()
    assert(perKey.forall(_.getLong(1) <= m + 1))
    // totals exact: Σc including the NULL row = input mass
    val mass = state.groupBy($"k").agg(sum($"c").as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mass === totals)
    // absent items: true count ≤ banked mass
    val banked = state.filter($"i".isNull).collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[Long]("c")).toMap
    val surviving = read.map(r => (r.getAs[Long]("k"), r.getAs[Long]("i")))
      .toSet
    exact.foreach { case ((g, i), t) =>
      if (!surviving((g, i)))
        assert(t <= banked(g), s"absent ($g,$i) true=$t > banked ${banked(g)}")
    }
  }

  test("MG merge keeps the bound: fold of two periods still certifies " +
      "every item against the exact two-period counts") {
    val df = spark.range(30000)
      .selectExpr("id % 2 AS grp",
        "CAST(floor(sqrt(id % 14000)) AS BIGINT) % 50 AS item",
        "id % 2 = 0 AS early")
    val m = 5
    val merged = mergeHeavyHitters(
      heavyHitterState(df.filter($"early"), $"grp", $"item", m),
      heavyHitterState(df.filter(!$"early"), $"grp", $"item", m), m)
    val read = heavyHittersFromState(merged).collect()
    val exact = df.groupBy($"grp", $"item").count().collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(read.nonEmpty)
    read.foreach { r =>
      val t = exact((r.getAs[Long]("k"), r.getAs[Long]("i")))
      assert(r.getAs[Long]("c_min") <= t && t <= r.getAs[Long]("c_max"))
    }
    // mass stays exact through the fold
    val mass = merged.groupBy($"k").agg(sum($"c")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val totals = df.groupBy($"grp").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(mass === totals)
  }

  test("auto-domain quantile state: n_oob structurally zero, accuracy " +
      "within half a bin width of the exact discrete median") {
    val df = values(9000).withColumn("v", ($"v" * 7 % 997).cast("double"))
    val (st, lo, hi) = quantileStateAutoDomain(df, $"grp", $"v", bins = 200)
    val wid = (hi - lo) / 200
    val est = quantileFromState(st, 0.5, lo, wid).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    val exact = df.groupBy($"grp")
      .agg(expr("percentile(v, 0.5)").as("m")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    est.foreach { case (g, (oob, q)) =>
      assert(oob === 0L, "derived domain covers the batch by construction")
      // the discrete median lies inside the picked bin; the continuous
      // percentile can differ from the discrete by interpolation, so
      // allow one full bin
      assert(math.abs(q - exact(g)) <= wid,
        s"grp $g: est $q vs exact ${exact(g)} beyond bin width $wid")
    }
    // degenerate all-equal batch still builds a well-formed state
    val one = spark.range(10).selectExpr("id % 2 AS grp", "CAST(5 AS DOUBLE) AS v")
    val (st1, lo1, hi1) = quantileStateAutoDomain(one, $"grp", $"v", bins = 10)
    assert(hi1 > lo1)
    assert(st1.agg(sum($"c")).head.getLong(0) === 10L)
  }

  test("KMV intersection estimate: exact-overlap extremes and a sane " +
      "middle") {
    val all = values(6000)
    val k = 32
    val st = bottomKState(all, $"grp", $"v", k)
    // identical sketches: jaccard 1, intersection est == ndv est
    val same = intersectionFromBottomK(st, st, k).collect()
    same.foreach { r =>
      assert(r.getAs[Double]("jaccard") === 1.0)
      assert(r.getAs[Long]("n_common") === r.getAs[Long]("n_union_sample"))
    }
    // disjoint value ranges: jaccard 0
    val a = bottomKState(all.filter($"v" < 400), $"grp", $"v", k)
    val b = bottomKState(all.filter($"v" >= 400), $"grp", $"v", k)
    intersectionFromBottomK(a, b, k).collect().foreach { r =>
      assert(r.getAs[Double]("jaccard") === 0.0)
      assert(r.getAs[Double]("intersection_est") === 0.0)
    }
    // 50% overlap by construction: [0,600) vs [300,900) over ~1000
    // distinct values → true J = 300/900 ≈ 0.33; allow sketch noise
    val c = bottomKState(all.filter($"v" < 600), $"grp", $"v", k)
    val d = bottomKState(all.filter($"v" >= 300 && $"v" < 900),
      $"grp", $"v", k)
    intersectionFromBottomK(c, d, k).collect().foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.1 && j < 0.6, s"jaccard $j implausible for true ~0.33")
    }
  }

  test("categorical PSI from MG states: zero on identical states, " +
      "positive under a planted shift") {
    val df = spark.range(20000)
      .selectExpr("id % 2 AS grp",
        "CAST(floor(sqrt(id % 10000)) AS BIGINT) % 40 AS item")
    val st = heavyHitterState(df, $"grp", $"item", 6)
    psiFromHeavyHitters(st, st).collect().foreach { r =>
      assert(r.getAs[Double]("psi") === 0.0)
      assert(r.getAs[Long]("n_ref") === r.getAs[Long]("n_cur"))
    }
    val shifted = heavyHitterState(
      df.withColumn("item", ($"item" + 17) % 40), $"grp", $"item", 6)
    psiFromHeavyHitters(st, shifted).collect().foreach { r =>
      assert(r.getAs[Double]("psi") > 0.0)
    }
  }

  test("Hellinger/JS: zero on identical states, symmetric, bounded") {
    val df = values(8000).withColumn("v", $"v".cast("double"))
    val st = quantileState(df, $"grp", $"v", 0.0, 1000.0, 100)
    val same = hellingerJsFromStates(st, st).collect()
    same.foreach { r =>
      assert(r.getAs[Double]("hellinger") === 0.0)
      assert(r.getAs[Double]("js") === 0.0)
    }
    // shifted copy: strictly positive, within the metric bounds, and
    // symmetric under argument swap
    val shifted = quantileState(
      df.withColumn("v", $"v" + 400.0), $"grp", $"v", 0.0, 1000.0, 100)
    val d1 = hellingerJsFromStates(st, shifted)
      .select($"k", $"hellinger", $"js").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    val d2 = hellingerJsFromStates(shifted, st)
      .select($"k", $"hellinger", $"js").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    assert(d1 === d2)
    d1.values.foreach { case (h, js) =>
      assert(h > 0 && h <= 1.0)
      assert(js > 0 && js <= math.log(2) + 1e-9)
    }
  }
}

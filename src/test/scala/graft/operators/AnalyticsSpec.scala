package graft.operators

import java.sql.Timestamp

import graft.SparkSpec

class AnalyticsSpec extends SparkSpec {

  private def ts(min: Long) = new Timestamp(min * 60000L)

  private def events(rows: (Long, Long, String, Double)*) = {
    import spark.implicits._
    rows.zipWithIndex.map { case ((u, m, t, v), i) =>
      (i.toLong, u, ts(m), t, v)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
  }

  test("slidingDistinct matches a per-day correlated recount (random streams)") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    // users active on random days over ~6 weeks, minute-grain timestamps
    val rows = Seq.fill(300) {
      val day = rnd.nextInt(42).toLong
      val user = rnd.nextInt(25).toLong
      (user, day * 1440 + rnd.nextInt(1440).toLong)
    }
    val ev = rows.zipWithIndex.map { case ((u, m), i) =>
      (i.toLong, u, ts(m), "x", 0.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    for (w <- Seq(1, 7, 30)) {
      val got = Analytics.slidingDistinct(ev, "user_id", w)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val byDay = rows.map { case (u, m) => (m / 1440, u) }.distinct
      val days = byDay.map(_._1).distinct
      val expected = days.map { d =>
        d -> byDay.filter { case (ed, _) =>
          ed >= d - (w - 1) && ed <= d }.map(_._2).distinct.size.toLong
      }.toMap
      assert(got == expected, s"window=$w")
    }
  }

  test("attribution credits first-touch and last-touch channels exactly") {
    import org.apache.spark.sql.functions.col
    // user 1: view -> click -> purchase(10.005) -> purchase(2.0)
    //   ft=view both; lt=click both (no non-purchase between the two)
    // user 2: purchase(5.0) with no prior events: ft=purchase, lt=direct
    val e = events(
      (1L, 0L, "view", 0.0), (1L, 10L, "click", 0.0),
      (1L, 20L, "purchase", 10.005), (1L, 30L, "purchase", 2.0),
      (2L, 5L, "purchase", 5.0))
    val out = Analytics.attribution(e, "purchase")
      .orderBy(col("model"), col("channel")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // 10.005 * 100 lands on exactly 1000.5 in IEEE double arithmetic
    // (the true product 1000.49999999999998? is within half an ulp of
    // 1000.5), and both Spark and DuckDB round halves up for positive
    // values -> 1001 cents; parity holds because the oracle runs the
    // identical double computation
    assert(out.toSeq == Seq(
      ("first_touch", "purchase", 1L, 500L),
      ("first_touch", "view", 2L, 1201L),
      ("last_touch", "click", 2L, 1201L),
      ("last_touch", "direct", 1L, 500L)))
  }

  test("timeWeightedAvg weights each value by its hold duration") {
    import org.apache.spark.sql.functions.col
    // user 1: 10.0 held 100min, 20.0 held 300min, final row spans nothing
    // twap = (1000c*100 + 2000c*300) / 400 = 1750c = 17.5
    val e = events(
      (1L, 0L, "p", 10.0), (1L, 100L, "p", 20.0), (1L, 400L, "p", 30.0),
      (2L, 5L, "p", 7.0)) // single event: no span -> excluded
    val out = Analytics.timeWeightedAvg(e, "user_id")
      .orderBy(col("user_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq((1L, 2L, 17.5)))
  }

  test("sessionize splits on gaps greater than the threshold") {
    val e = events(
      (1L, 0L, "view", 1.0), (1L, 10L, "click", 2.0), // session 1
      (1L, 100L, "view", 3.0), // gap 90min > 30 -> session 2
      (2L, 0L, "view", 4.0)) // other user: own session 1
    val r = Analytics.sessionize(e, gapMinutes = 30L).collect()
      .map(x => ((x.getLong(0), x.getLong(1)), x.getLong(2))).toMap
    assert(r == Map((1L, 1L) -> 2L, (1L, 2L) -> 1L, (2L, 1L) -> 1L))
  }

  test("funnel counts only strictly-ordered completions") {
    val e = events(
      (1L, 0L, "view", 0), (1L, 1L, "click", 0), (1L, 2L, "purchase", 0),
      // user 2 clicked BEFORE viewing: counts for view only
      (2L, 5L, "click", 0), (2L, 6L, "view", 0),
      // user 3 viewed only
      (3L, 0L, "view", 0))
    val r = Analytics.funnel(e, Seq("view", "click", "purchase")).collect()
      .map(x => x.getInt(1) -> x.getLong(2)).toMap
    assert(r == Map(1 -> 3L, 2 -> 1L, 3 -> 1L))
  }

  test("cohortRetention buckets activity by whole-week offset from first day") {
    val day = 24 * 60L
    val e = events(
      (1L, 0L, "view", 0), (1L, 3 * day, "view", 0), // week 0 twice
      (1L, 8 * day, "view", 0), // week 1
      (2L, 1 * day, "view", 0)) // cohort day 2, week 0
    val r = Analytics.cohortRetention(e).collect()
      .map(x => (x.getDate(0).toString, x.getLong(1), x.getLong(2))).toSet
    assert(r == Set(("1970-01-01", 0L, 1L), ("1970-01-01", 1L, 1L),
      ("1970-01-02", 0L, 1L)))
  }

  test("tableProfile: null counts, distinct counts, numeric min/max") {
    import spark.implicits._
    val df = Seq((1L, Some(2.0), "a"), (2L, None, "a"), (3L, Some(4.0), "b"))
      .toDF("id", "x", "s")
    val r = Analytics.tableProfile(df, Seq("id", "x"), Seq("s")).collect()
      .map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2),
          Option(x.get(3)).map(_.asInstanceOf[Double]),
          Option(x.get(4)).map(_.asInstanceOf[Double])))).toMap
    assert(r("id") == ((0L, 3L, Some(1.0), Some(3.0))))
    assert(r("x") == ((1L, 2L, Some(2.0), Some(4.0))))
    assert(r("s") == ((0L, 2L, None, None)))
  }

  test("sessionize matches a driver-side fold on random event streams") {
    val rnd = new scala.util.Random(47)
    val rows = (0 until 300).map { i =>
      (rnd.nextInt(8).toLong, rnd.nextInt(5000).toLong, "view", 1.0)
    }
    val gap = 30L
    // reference: per user, sort by (ts, event_id), split when gap > 30min
    val byUser = rows.zipWithIndex
      .map { case ((u, m, _, _), i) => (u, m, i.toLong) }
      .groupBy(_._1).view.mapValues { es =>
        val sorted = es.sortBy(e => (e._2, e._3))
        val sessions = scala.collection.mutable.ArrayBuffer[Long]()
        var prev = Long.MinValue
        var sess = 0L
        sorted.foreach { e =>
          if (prev == Long.MinValue || e._2 - prev > gap) sess += 1
          sessions += sess
          prev = e._2
        }
        sessions.groupBy(identity).view.mapValues(_.size.toLong).toMap
      }.toMap
    val expected = byUser.flatMap { case (u, m) =>
      m.map { case (s, n) => (u, s) -> n }
    }
    val got = Analytics.sessionize(events(rows: _*), gapMinutes = gap).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x.getLong(2)).toMap
    assert(got == expected)
  }

  test("funnel matches a driver-side scan on random event streams") {
    val rnd = new scala.util.Random(48)
    val types = Seq("view", "click", "purchase", "error")
    val rows = (0 until 400).map { i =>
      (rnd.nextInt(25).toLong, rnd.nextInt(5000).toLong,
        types(rnd.nextInt(types.length)), 0.0)
    }
    val steps = Seq("view", "click", "purchase")
    // reference: per user, strictly-increasing first-completion chain
    val byUser = rows.zipWithIndex
      .map { case ((u, m, t, _), i) => (u, m, i.toLong, t) }
      .groupBy(_._1).view.mapValues(_.sortBy(e => (e._2, e._3))).toMap
    val expected = steps.indices.map { depth =>
      byUser.count { case (_, es) =>
        // first 'view' time, then first 'click' strictly after, ...
        var t: Option[Long] = None
        var ok = true
        steps.take(depth + 1).foreach { step =>
          if (ok) {
            val hit = es.find(e => e._4 == step && t.forall(e._2 > _))
            hit match {
              case Some(h) => t = Some(h._2)
              case None => ok = false
            }
          }
        }
        ok
      }.toLong
    }
    val got = Analytics.funnel(events(rows: _*), steps).collect()
      .sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    assert(got == expected)
  }

  test("eventTransitions counts consecutive pairs with exact probabilities") {
    val e = events(
      (1L, 0L, "view", 0), (1L, 1L, "click", 0), (1L, 2L, "view", 0),
      (2L, 0L, "view", 0), (2L, 1L, "click", 0))
    val r = Analytics.eventTransitions(e).collect()
      .map(x => ((x.getString(0), x.getString(1)), (x.getLong(2), x.getDouble(3))))
      .toMap
    assert(r == Map(
      ("view", "click") -> ((2L, 1.0)),
      ("click", "view") -> ((1L, 1.0))))
  }

  test("robustOutliers flags only the planted extreme value") {
    val e = events(
      (1L, 0L, "view", 10.0), (1L, 1L, "view", 11.0), (2L, 2L, "view", 9.0),
      (2L, 3L, "view", 10.5), (3L, 4L, "view", 1000.0)) // the outlier
    val r = Analytics.robustOutliers(e, k = 3.0).collect().head
    assert(r.getLong(1) == 5L) // n
    assert(r.getDouble(2) == 10.5) // median of 9,10,10.5,11,1000
    assert(r.getLong(4) == 1L) // only the 1000.0
  }

  test("resample emits a dense grid with zero-filled gap buckets") {
    val e = events(
      (1L, 0L, "view", 1.0),  // bucket 0
      (1L, 125L, "view", 2.0)) // bucket 2 (60-min buckets) -> gap at 1
    val r = Analytics.resample(e, bucketMicros = 3600000000L).collect()
      .map(x => (x.getTimestamp(1).getTime / 3600000L, x.getLong(2), x.getDouble(3)))
    assert(r.toSet == Set((0L, 1L, 1.0), (1L, 0L, 0.0), (2L, 1L, 2.0)))
  }

  test("forwardFill carries last good value forward; leading nulls stay null") {
    import org.apache.spark.sql.functions.col
    val e = events(
      (1L, 0L, "error", 99.0), // leading masked value -> stays null
      (1L, 1L, "view", 1.5),
      (1L, 2L, "error", 99.0), // repaired to 1.5
      (1L, 3L, "view", 2.5))
    val r = Analytics.forwardFill(e, col("event_type") === "error").collect()
      .map(x => x.getLong(0) -> Option(x.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(r(0L).isEmpty && r(1L) == Some(1.5) &&
      r(2L) == Some(1.5) && r(3L) == Some(2.5))
  }

  test("semanticDedup drops the higher id of a planted near-identical pair") {
    import spark.implicits._
    // vectors 0/1 nearly identical, 2 orthogonal-ish; centroid = vec 0
    val e = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.01f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val r = Dedup.semanticDedup(e, org.apache.spark.sql.functions.col("vec_id") === 0L,
      threshold = 0.95).collect().map(_.getLong(0)).toSet
    assert(r == Set(0L, 2L)) // 1 dropped as near-dup of 0
  }

  test("winsorizedStats: rank bounds, clip counts, small-group no-clip") {
    import spark.implicits._
    // group a: 1..200 -> lo = rank ceil(200/100)=2 (value 2),
    //                    hi = rank ceil(99*200/100)=198 (value 198)
    // group b: 5 rows < 100 -> lo = rank 1 (min), hi = rank 5 (max):
    //                    nothing clips
    val df = ((1 to 200).map(i => ("a", i.toDouble)) ++
      Seq(10.0, 20.0, 30.0, 40.0, 1000.0).map(("b", _))).toDF("g", "v")
    val r = Analytics.winsorizedStats(df, "g", "v")
      .collect().map(x => x.getString(0) ->
        (x.getDouble(1), x.getDouble(2), x.getLong(3), x.getLong(4)))
      .toMap
    assert(r("a") == ((2.0, 198.0, 1L, 2L))) // clips {1} and {199,200}
    assert(r("b") == ((10.0, 1000.0, 0L, 0L)))
  }

  test("winsorizedStats matches a driver-side reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val rows = Seq.fill(800)((s"g${rnd.nextInt(4)}", rnd.nextInt(10000) / 10.0))
    val got = Analytics.winsorizedStats(rows.toDF("g", "v"), "g", "v")
      .collect().map(x => x.getString(0) ->
        ((x.getDouble(1), x.getDouble(2), x.getLong(3), x.getLong(4))))
      .toMap
    rows.groupBy(_._1).foreach { case (g, vs) =>
      val sorted = vs.map(_._2).sorted
      val n = sorted.length
      val lo = sorted((n + 99) / 100 - 1)       // value at ceil-rank, 1-based
      val hi = sorted((99 * n + 99) / 100 - 1)
      val expect = (lo, hi,
        sorted.count(_ < lo).toLong, sorted.count(_ > hi).toLong)
      assert(got(g) == expect, s"group $g")
    }
  }

  test("slidingDistinctHll: estimate within 5% of exact on every day") {
    import spark.implicits._
    // the q212 accuracy contract, asserted HERE (naming the offending
    // day) rather than hash-gated in the oracle, so a fixture or scale
    // change that nudges one day's estimate reads as a named accuracy
    // breach instead of a whole-query correctness failure
    val rnd = new scala.util.Random(9)
    val rows = Seq.fill(2000) {
      val day = rnd.nextInt(30).toLong
      val user = rnd.nextInt(400).toLong
      (user, day * 1440 + rnd.nextInt(1440).toLong)
    }
    val ev = rows.zipWithIndex.map { case ((u, m), i) =>
      (i.toLong, u, ts(m), "x", 0.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val out = Analytics.slidingDistinctHll(ev, "user_id", windowDays = 7)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getBoolean(2),
        s"hll estimate off >5% on day ${r.getLong(0)} " +
          s"(exact n_active=${r.getLong(1)})")
    }
  }

  test("joinCardinality law: histogram product equals the real join size") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val a = Seq.fill(400)((rnd.nextInt(30).toLong, rnd.nextInt())).toDF("k", "x")
    val b = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt())).toDF("k", "y")
    val est = SkewJoin.joinCardinality(a, "k", b, "k")
      .collect().head
    val actual = a.join(b, "k").count()
    assert(est.getLong(0) == actual)
    assert(est.getLong(2) <= actual) // max fanout bounded by total
  }

  test("observedCuration matches a direct aggregate (metrics ride one pass)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x", "en", "s", 500L), (2L, "x", "en", "s", 100L),
      (3L, "x", "zh", "s", 900L), (4L, "x", "fr", "s", 250L),
      (5L, "x", "zh", "s", 50L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = Quality.observedCuration(docs, 200L, Seq("en", "fr"))
      .collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) == ((5L, 2L, 2L, 1800L, 2L)))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Event-analytics operators over the events table: batch sessionization,
  * ordered funnel conversion, cohort retention, and a generic table
  * profiler. The classic clickstream queries an OLAP engine is asked for
  * daily; the reference could only express them as chained map/reduce
  * jobs with hand-rolled group iteration.
  *
  * Scale notes (100 TB posture):
  *  - sessionize / cohort windows are PARTITIONED BY USER — parallelism
  *    is user-count wide, no global ordering anywhere; the gap test uses
  *    exact integer microseconds (no float truncation drift).
  *  - funnel stages are per-user min-timestamps chained through joins on
  *    user_id — each stage's frame is |users|, far smaller than events,
  *    and AQE broadcasts them as they shrink.
  *  - tableProfile is ONE aggregation pass over the table producing every
  *    column's stats together (not one scan per column); exact
  *    count_distinct per column is the fixture-honest choice here — at
  *    100 TB you swap in approx_count_distinct and keep the same shape.
  */
object Analytics {

  /** Gap-based sessionization: a new session starts when a user's
    * inter-event gap exceeds `gapMinutes`. Returns one row per session
    * with bounds and rollups. The batch counterpart of the streaming
    * session window (q59); ties on ts are broken by event_id so the
    * session numbering is fully deterministic. */
  def sessionize(events: DataFrame, gapMinutes: Long): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select($"user_id", $"event_id", $"ts", $"value")
      .withColumn("_gap_us",
        unix_micros($"ts") - lag(unix_micros($"ts"), 1).over(w))
      .withColumn("_new",
        when($"_gap_us".isNull || $"_gap_us" > gapMinutes * 60000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum($"_new").over(cum))
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"), min($"ts").as("sess_start"),
        max($"ts").as("sess_end"), round(sum($"value"), 4).as("sum_value"))
  }

  /** Ordered funnel: users who did step 1, then step 2 AFTER step 1,
    * then step 3 AFTER step 2 (strictly increasing first-completion
    * times — re-orderings don't count, matching product-analytics
    * semantics). Returns (stage, stage_idx, n_users). */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val s = events.sparkSession
    import s.implicits._
    val e = events.select($"user_id", $"event_type", $"ts")
    // stage frames shrink monotonically: each is per-user minimal
    // completion time of the prefix, joined forward
    val stages = steps.tail.scanLeft(
      e.filter($"event_type" === steps.head)
        .groupBy($"user_id").agg(min($"ts").as("step_ts"))) { (prev, step) =>
      e.filter($"event_type" === step)
        .join(prev.select($"user_id", $"step_ts".as("_prev_ts")), "user_id")
        .filter($"ts" > $"_prev_ts")
        .groupBy($"user_id").agg(min($"ts").as("step_ts"))
    }
    stages.zip(steps).zipWithIndex.map { case ((df, step), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("stage"), lit(i + 1).as("stage_idx"), $"n_users")
    }.reduce(_.union(_))
  }

  /** Cohort retention: users grouped by first-activity day, counted as
    * active per whole-week offset from that day. (cohort_day,
    * week_offset, n_users) — the retention-curve input. Integer date
    * arithmetic only. */
  def cohortRetention(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val firstDay = events.groupBy($"user_id")
      .agg(min(to_date($"ts")).as("cohort_day"))
    events.select($"user_id", to_date($"ts").as("d"))
      .join(firstDay, "user_id")
      .select($"user_id", $"cohort_day",
        expr("datediff(d, cohort_day) DIV 7").as("week_offset"))
      .distinct()
      .groupBy($"cohort_day", $"week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** One-pass per-column table profile: null count, exact distinct count,
    * and (for numeric columns) min/max — long format, one row per column.
    * The data-quality gate run before any pipeline consumes a new drop. */
  def tableProfile(df: DataFrame, numericCols: Seq[String],
      otherCols: Seq[String]): DataFrame = {
    val all = numericCols ++ otherCols
    require(all.nonEmpty, "tableProfile needs at least one column")
    require(all.distinct.size == all.size,
      s"duplicate columns in profile list: ${all.diff(all.distinct).mkString(",")}")
    val aggs = all.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nnull"),
        count_distinct(col(c)).as(s"${c}__ndist"))
    } ++ numericCols.flatMap { c =>
      Seq(round(min(col(c)).cast("double"), 4).as(s"${c}__min"),
        round(max(col(c)).cast("double"), 4).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = all.map { c =>
      val isNum = numericCols.contains(c)
      struct(lit(c).as("col_name"),
        col(s"${c}__nnull").as("n_null"),
        col(s"${c}__ndist").as("n_distinct"),
        (if (isNum) col(s"${c}__min") else lit(null).cast("double")).as("min_num"),
        (if (isNum) col(s"${c}__max") else lit(null).cast("double")).as("max_num"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** Forward fill (last observation carried forward): null out values
    * where `mask` holds, then carry the last non-null value forward per
    * user in event order — the standard gap-repair for sensor/metric
    * streams. Window is per-user, frame-bounded, deterministic
    * (event_id tiebreak); leading nulls stay null. */
  def forwardFill(events: DataFrame, mask: org.apache.spark.sql.Column): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events.select($"event_id", $"user_id", $"ts", $"event_type", $"value")
      .withColumn("_v", when(mask, lit(null)).otherwise($"value"))
      .withColumn("filled_value", round(last($"_v", ignoreNulls = true).over(w), 4))
      .select($"event_id", $"user_id", $"event_type", $"filled_value")
  }

  /** Gap-filled time-series resampling: bucket events into fixed
    * `bucketMicros` intervals per user and emit a DENSE grid from each
    * user's first to last bucket — empty buckets appear with zero counts
    * (the shape charting/forecasting consumers need; a groupBy alone
    * silently skips gaps). Bucketing is exact integer microsecond
    * division; the grid is sequence+explode per user, so its size is
    * bounded by time-range/bucket and the join stays on (user, bucket). */
  def resample(events: DataFrame, bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0)
    val s = events.sparkSession
    import s.implicits._
    val b = events.select($"user_id",
      expr(s"unix_micros(ts) DIV $bucketMicros").as("bucket"), $"value")
    val agg = b.groupBy($"user_id", $"bucket")
      .agg(count(lit(1)).as("n_events"), round(sum($"value"), 4).as("sum_value"))
    val grid = b.groupBy($"user_id")
      .agg(min($"bucket").as("b0"), max($"bucket").as("b1"))
      .select($"user_id", explode(sequence($"b0", $"b1")).as("bucket"))
    grid.join(agg, Seq("user_id", "bucket"), "left")
      .select($"user_id",
        timestamp_micros($"bucket" * bucketMicros).as("bucket_start"),
        coalesce($"n_events", lit(0L)).as("n_events"),
        coalesce($"sum_value", lit(0.0)).as("sum_value"))
  }

  /** First-order event-transition mining: counts and row-normalized
    * probabilities of consecutive (event_type -> next event_type) pairs
    * per user timeline — the Markov-chain input for journey analysis.
    * One per-user lead window + a tiny (|types|²) aggregation; the
    * probability is a ratio of the integer counts, so it is exact. */
  def eventTransitions(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    events.select($"user_id", $"ts", $"event_id", $"event_type")
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .filter($"next_type".isNotNull)
      .groupBy($"event_type", $"next_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        round($"n" / sum($"n").over(Window.partitionBy($"event_type"))
          .cast("double"), 4))
  }

  /** Robust (median/MAD) outlier profile per group: median, median
    * absolute deviation, and the count of values beyond
    * `k * 1.4826 * MAD` — the standard robust z-score rule, immune to
    * the outliers it hunts (unlike mean/stddev). Two percentile passes
    * (the second needs the first's median joined back); group count is
    * tiny so the join broadcasts. */
  def robustOutliers(events: DataFrame, k: Double = 3.0): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val med = events.groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("_med"))
    val mad = events.join(broadcast(med), "event_type")
      .groupBy($"event_type")
      .agg(first($"_med").as("_med"),
        expr("percentile(abs(value - _med), 0.5)").as("_mad"))
    events.join(broadcast(mad), "event_type")
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        round(first($"_med"), 4).as("med"),
        round(first($"_mad"), 4).as("mad"),
        sum(when(abs($"value" - $"_med") > lit(k * 1.4826) * $"_mad", 1L)
          .otherwise(0L)).as("n_outliers"))
  }

  /** Two-sample Kolmogorov–Smirnov drift statistic per group: the max
    * absolute gap between the empirical CDFs of `value` before vs after
    * `cutoff` — the standard distribution-drift gate between a reference
    * window and a fresh batch. One grouped count to (group, value) then
    * one window pass; cumulative counts are exact integers and the CDF
    * division is a single IEEE op, so two engines agree bit-for-bit.
    * Groups present on only one side are dropped (no defined KS). */
  def ksDrift(events: DataFrame, cutoff: org.apache.spark.sql.Column): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val g = events
      .select($"event_type", $"value",
        when($"ts" < cutoff, 1L).otherwise(0L).as("_e"))
      .groupBy($"event_type", $"value")
      .agg(sum($"_e").as("ne"), sum(lit(1L) - $"_e").as("nl"))
    val cum = Window.partitionBy($"event_type").orderBy($"value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = Window.partitionBy($"event_type")
    g.withColumn("ce", sum($"ne").over(cum))
      .withColumn("cl", sum($"nl").over(cum))
      .withColumn("te", sum($"ne").over(tot))
      .withColumn("tl", sum($"nl").over(tot))
      .filter($"te" > 0 && $"tl" > 0)
      .groupBy($"event_type")
      .agg(max($"te").as("n_early"), max($"tl").as("n_late"),
        round(max(abs($"ce".cast("double") / $"te" -
          $"cl".cast("double") / $"tl")), 4).as("ks_stat"))
  }

  // ------------------------------------------------------------------
  // fixture-bound oracle queries
  // ------------------------------------------------------------------

  /** Sliding-window distinct counts (trailing `windowDays`-day active
    * keys per day) — exactly, at scale. Spark does not support
    * COUNT(DISTINCT) over a window frame, and a per-day correlated
    * re-scan is O(days × window) passes. The scalable exact phrasing:
    * dedup to (day, key) first (partial-agg map-side — this bounds the
    * explode), then each (day, key) row contributes to the `windowDays`
    * output days it falls inside, and a single groupBy counts distinct
    * keys per output day. One shuffle of |active (day,key)| × window
    * rows; no correlated scans, no window-frame distinct. Output days
    * are restricted to days that actually have events — carried as an
    * anchor flag on the contribution rows (a contribution with
    * wday == day proves the day is real), NOT as a semi-join back to
    * the day list: that second reference would duplicate the whole
    * scan+distinct subtree (the r4 recompute-storm lesson). */
  def slidingDistinct(events: DataFrame, keyCol: String,
      windowDays: Int): DataFrame =
    slidingDistinctFrom(dayKeys(events, keyCol), windowDays)

  /** The deduplicated (day, key) frame both sliding-distinct variants
    * consume — derived once so the HLL path can share a single scan. */
  private def dayKeys(events: DataFrame, keyCol: String): DataFrame =
    events.select(
      expr("CAST(datediff(to_date(ts), date'1970-01-01') AS BIGINT)")
        .as("day"), col(keyCol).as("k")).distinct()

  private def slidingDistinctFrom(dayKey: DataFrame,
      windowDays: Int): DataFrame = {
    val s = dayKey.sparkSession
    import s.implicits._
    require(windowDays >= 1)
    val contrib = dayKey.select(
      explode(expr(s"sequence(day, day + ${windowDays - 1})")).as("wday"),
      $"day", $"k")
    contrib.groupBy($"wday")
      .agg(countDistinct($"k").as("n_active"),
        max(when($"wday" === $"day", 1).otherwise(0)).as("_anchor"))
      .filter($"_anchor" === 1)
      .select($"wday".as("day"), $"n_active")
  }

  /** Approximate trailing-window distinct — the SKETCH scale path for
    * [[slidingDistinct]]. The exact operator explodes each (day, key)
    * into its window contributions: O(active·window) shuffle rows, the
    * right cost when exact counts are contractual. Here each day folds
    * once into a mergeable HLL sketch and the trailing window is a
    * RANGE-framed `hll_union_agg` over the |days|-row daily frame —
    * corpus work is ONE partial-aggregated pass regardless of window
    * width, and the window math touches kilobyte sketches, not keys.
    *
    * Output carries the exact count (computed alongside, fixture-honest)
    * plus the accuracy-contract flag `hll_ok` (estimate within 5%): HLL
    * is deterministic for a given input set, so the flag is stable and
    * the oracle pins it — the q16/q164 sketch-contract pattern. At
    * 100 TB drop the exact column and keep the sketch path. */
  def slidingDistinctHll(events: DataFrame, keyCol: String,
      windowDays: Int): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    require(windowDays >= 1)
    // ONE corpus pass: the exact referee and the sketch path both read
    // this cached (day, key) frame (the repo's materialize-at-fan-out
    // rule; un-shared, the scan+distinct ran twice)
    val dayKey = dayKeys(events, keyCol).cache()
    val daily = dayKey.groupBy($"day")
      .agg(expr("hll_sketch_agg(k)").as("sk"))
    val w = Window.orderBy($"day").rangeBetween(-(windowDays - 1), 0)
    val approx = daily
      // |days| rows: the partition-less window is tiny by construction
      .withColumn("_u", expr("hll_union_agg(sk)").over(w))
      .withColumn("n_approx",
        expr("hll_sketch_estimate(_u)").cast("long"))
      .select($"day", $"n_approx")
    graft.engine.Materialize.adopt(
      slidingDistinctFrom(dayKey, windowDays)
        .join(approx, "day")
        .select($"day", $"n_active",
          (abs($"n_approx" - $"n_active") <=
            $"n_active".cast("double") * 0.05).as("hll_ok")),
      Seq(dayKey))
  }

  /** Multi-touch attribution: credit each conversion's value to a
    * marketing channel under two models at once — first-touch (the
    * user's first event ever) and last-touch (the latest non-conversion
    * event strictly before the conversion; 'direct' when none exists).
    * Conversion values are summed in exact integer cents so Spark and
    * the oracle agree bit-for-bit regardless of float summation order.
    *
    * Scale: both credits are window functions PARTITIONED BY USER over
    * the same (ts, event_id)-ordered frame — one shuffle, no joins, no
    * self-scan per conversion; the two model aggregations reuse the
    * windowed frame and output |channels| rows each. */
  def attribution(events: DataFrame, conversionType: String): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val credited = events
      .withColumn("_ft", first($"event_type").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_lt", last(
        when($"event_type" =!= conversionType, $"event_type"),
        ignoreNulls = true).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .filter($"event_type" === conversionType)
      .withColumn("_cents", round($"value" * 100).cast("long"))
    def model(name: String, channel: Column) = credited
      .groupBy(channel.as("channel"))
      .agg(count(lit(1)).as("conversions"),
        sum($"_cents").as("rev_cents"))
      .select(lit(name).as("model"), $"channel", $"conversions",
        $"rev_cents")
    model("first_touch", $"_ft")
      .unionAll(model("last_touch", coalesce($"_lt", lit("direct"))))
  }

  /** Time-weighted average (TWAP) of a value per key: each observation
    * holds until the next one, so its weight is that duration; the mean
    * is over the key's [first, last] observation span (the last row
    * spans zero time and contributes no weight — the metering/pricing
    * convention). Exact integer accumulation: values on an integer cent
    * grid × microsecond durations (cent·µs products stay far under
    * Long range for year-scale spans), one double division at the end,
    * rounded to 4dp — so Spark and the oracle agree bit-for-bit.
    *
    * Scale: one window pass PARTITIONED BY KEY (lead), one partial-
    * aggregated groupBy on the same key — parallelism is key-wide, no
    * global ordering, nothing driver-side. */
  def timeWeightedAvg(events: DataFrame, keyCol: String): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val w = Window.partitionBy(col(keyCol)).orderBy($"ts", $"event_id")
    events
      .withColumn("_us", unix_micros($"ts"))
      .withColumn("_cents", round($"value" * 100).cast("long"))
      .withColumn("_dur", lead($"_us", 1).over(w) - $"_us")
      .filter($"_dur".isNotNull)
      .groupBy(col(keyCol))
      .agg(
        sum($"_cents" * $"_dur").as("_wsum"),
        sum($"_dur").as("_tspan"),
        count(lit(1)).as("n_holds"))
      .filter($"_tspan" > 0)
      .select(col(keyCol), $"n_holds",
        round($"_wsum" / $"_tspan" / 100.0, 4).as("twap"))
  }

  /** Per-group winsorization: clip `v` into [p-lo, p-hi] per group, where
    * the bounds are RANK-BASED exact order statistics (percentile_disc
    * semantics: the value at ascending rank ceil(p·n), integer-exact
    * (n·p + 99) div 100 arithmetic) — deliberately NOT the interpolating
    * percentile(): interpolation manufactures values that exist in
    * neither engine's input and whose last-ulp placement differs between
    * engines, while value-at-rank is a row that exists, making the clip
    * comparisons engine-portable bit-for-bit.
    *
    * Scale shape: order statistics need a per-group sort — ONE window
    * shuffle partitioned by group (parallelism = group count), then the
    * bounds frame is |groups| rows, broadcast back onto the input for a
    * shuffle-free clip. At 100 TB with huge groups, swap the exact ranks
    * for approx_percentile bounds and keep the identical clip join.
    * Returns (group, lo, hi, n_clip_lo, n_clip_hi, raw_avg, wins_avg). */
  def winsorizedStats(df: DataFrame, g: String, v: String,
      loPctile: Int = 1, hiPctile: Int = 99): DataFrame = {
    require(0 < loPctile && loPctile < hiPctile && hiPctile <= 100)
    val s = df.sparkSession
    import s.implicits._
    // NULL values are EXCLUDED up front — percentile_disc semantics
    // ignore NULLs, and leaving them in would both shift the ranks
    // (Spark orders NULLs first, DuckDB last) and silently escape the
    // clip comparisons (NULL < lo is NULL, not true)
    val rows = df.select(col(g), col(v)).filter(col(v).isNotNull)
    val wOrd = Window.partitionBy(col(g)).orderBy(col(v))
    val wAll = Window.partitionBy(col(g))
    val ranked = rows
      .withColumn("rn", row_number().over(wOrd))
      .withColumn("n", count(lit(1)).over(wAll))
    val bounds = ranked.groupBy(col(g)).agg(
      max(when($"rn" === expr(s"($loPctile * n + 99) div 100"), col(v)))
        .as("lo"),
      max(when($"rn" === expr(s"($hiPctile * n + 99) div 100"), col(v)))
        .as("hi"))
    rows.join(broadcast(bounds), g)
      .groupBy(col(g), $"lo", $"hi")
      .agg(
        count(when(col(v) < $"lo", 1)).as("n_clip_lo"),
        count(when(col(v) > $"hi", 1)).as("n_clip_hi"),
        round(avg(col(v)), 4).as("raw_avg"),
        round(avg(
          when(col(v) < $"lo", $"lo").when(col(v) > $"hi", $"hi")
            .otherwise(col(v))), 4).as("wins_avg"))
      .select(col(g), round($"lo", 4).as("lo"), round($"hi", 4).as("hi"),
        $"n_clip_lo", $"n_clip_hi", $"raw_avg", $"wins_avg")
  }

  val defs: Seq[QueryDef] = Seq(

    QueryDef(
      "q197_time_weighted_avg",
      (s, dir) => timeWeightedAvg(
        Tables.load(s, dir, "events")
          .where(col("event_type") === "purchase"), "user_id")
        .orderBy(col("user_id")),
      Some("""
        WITH p AS (
          SELECT user_id, event_id, epoch_us(ts) AS us,
                 CAST(round(value * 100) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'),
        d AS (
          SELECT user_id, cents,
                 lead(us) OVER (PARTITION BY user_id
                   ORDER BY us, event_id) - us AS dur
          FROM p),
        a AS (
          SELECT user_id,
                 CAST(sum(cents * dur) AS BIGINT) AS wsum,
                 CAST(sum(dur) AS BIGINT) AS tspan,
                 count(*) AS n_holds
          FROM d WHERE dur IS NOT NULL GROUP BY user_id)
        SELECT user_id, n_holds,
               round(1.0 * wsum / tspan / 100.0, 4) AS twap
        FROM a WHERE tspan > 0
        ORDER BY user_id""")),

    QueryDef(
      "q193_attribution",
      (s, dir) => attribution(Tables.load(s, dir, "events"), "purchase")
        .orderBy(col("model"), col("channel")),
      Some("""
        WITH cr AS (
          SELECT event_type, value,
                 CAST(round(value * 100) AS BIGINT) AS cents,
                 first_value(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS ft,
                 last_value(CASE WHEN event_type <> 'purchase'
                                 THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lt
          FROM events),
        conv AS (SELECT * FROM cr WHERE event_type = 'purchase')
        SELECT 'first_touch' AS model, ft AS channel,
               count(*) AS conversions,
               CAST(sum(cents) AS BIGINT) AS rev_cents
        FROM conv GROUP BY ft
        UNION ALL
        SELECT 'last_touch' AS model, coalesce(lt, 'direct') AS channel,
               count(*) AS conversions,
               CAST(sum(cents) AS BIGINT) AS rev_cents
        FROM conv GROUP BY coalesce(lt, 'direct')
        ORDER BY model, channel""")),

    QueryDef(
      "q190_sliding_distinct",
      (s, dir) => slidingDistinct(Tables.load(s, dir, "events"),
        "user_id", windowDays = 7)
        .orderBy(col("day")),
      Some("""
        WITH ev AS (
          SELECT DISTINCT CAST(date_diff('day', DATE '1970-01-01',
                   CAST(ts AS DATE)) AS BIGINT) AS day, user_id
          FROM events),
        days AS (SELECT DISTINCT day FROM ev)
        SELECT d.day,
               (SELECT count(DISTINCT e.user_id) FROM ev e
                WHERE e.day BETWEEN d.day - 6 AND d.day) AS n_active
        FROM days d
        ORDER BY day""")),

    // the sketch scale path of q190: per-day HLLs, RANGE-windowed union.
    // The oracle pins the EXACT count only; the ±5% estimate-accuracy
    // contract (hll_ok) is asserted in AnalyticsSpec, where a violation
    // names the offending day instead of hash-failing the whole query
    // on a fixture regeneration.
    QueryDef(
      "q212_sliding_distinct_hll",
      (s, dir) => slidingDistinctHll(Tables.load(s, dir, "events"),
        "user_id", windowDays = 7)
        .select(col("day"), col("n_active"))
        .orderBy(col("day")),
      Some("""
        WITH ev AS (
          SELECT DISTINCT CAST(date_diff('day', DATE '1970-01-01',
                   CAST(ts AS DATE)) AS BIGINT) AS day, user_id
          FROM events),
        days AS (SELECT DISTINCT day FROM ev)
        SELECT d.day,
               (SELECT count(DISTINCT e.user_id) FROM ev e
                WHERE e.day BETWEEN d.day - 6 AND d.day) AS n_active
        FROM days d
        ORDER BY day""")),

    QueryDef(
      "q126_sessionize",
      (s, dir) => sessionize(Tables.load(s, dir, "events"), gapMinutes = 360L)
        .orderBy(col("user_id"), col("sess_id")),
      Some("""
        WITH g AS (
          SELECT user_id, event_id, ts, value,
                 epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
          FROM events),
        se AS (
          SELECT user_id, ts, value,
                 sum(CASE WHEN gap_us IS NULL OR gap_us > 21600000000
                          THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS sess_id
          FROM g)
        SELECT user_id, CAST(sess_id AS BIGINT) AS sess_id,
               count(*) AS n_events, min(ts) AS sess_start,
               max(ts) AS sess_end, round(sum(value), 4) AS sum_value
        FROM se
        GROUP BY user_id, sess_id
        ORDER BY user_id, sess_id""")),

    QueryDef(
      "q127_funnel",
      (s, dir) => funnel(Tables.load(s, dir, "events"),
        Seq("view", "click", "purchase")).orderBy(col("stage_idx")),
      Some("""
        WITH s1 AS (
          SELECT user_id, min(ts) AS step_ts FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (
          SELECT e.user_id, min(e.ts) AS step_ts
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'click' AND e.ts > s1.step_ts
          GROUP BY e.user_id),
        s3 AS (
          SELECT e.user_id, min(e.ts) AS step_ts
          FROM events e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.ts > s2.step_ts
          GROUP BY e.user_id)
        SELECT 'view' AS stage, 1 AS stage_idx, count(*) AS n_users FROM s1
        UNION ALL
        SELECT 'click', 2, count(*) FROM s2
        UNION ALL
        SELECT 'purchase', 3, count(*) FROM s3
        ORDER BY stage_idx""")),

    QueryDef(
      "q128_cohort_retention",
      (s, dir) => cohortRetention(Tables.load(s, dir, "events"))
        .orderBy(col("cohort_day"), col("week_offset")),
      Some("""
        WITH f AS (
          SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day
          FROM events GROUP BY user_id),
        a AS (
          SELECT DISTINCT e.user_id, f.cohort_day,
                 datediff('day', f.cohort_day, CAST(e.ts AS DATE)) // 7
                   AS week_offset
          FROM events e JOIN f ON e.user_id = f.user_id)
        SELECT cohort_day, CAST(week_offset AS BIGINT) AS week_offset,
               count(*) AS n_users
        FROM a
        GROUP BY cohort_day, week_offset
        ORDER BY cohort_day, week_offset""")),

    QueryDef(
      "q138_event_transitions",
      (s, dir) => eventTransitions(Tables.load(s, dir, "events"))
        .orderBy(col("event_type"), col("next_type")),
      Some("""
        WITH t AS (
          SELECT event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS next_type
          FROM events),
        c AS (
          SELECT event_type, next_type, count(*) AS n
          FROM t WHERE next_type IS NOT NULL
          GROUP BY event_type, next_type)
        SELECT event_type, next_type, n,
               round(n / CAST(sum(n) OVER (PARTITION BY event_type)
                 AS DOUBLE), 4) AS p
        FROM c
        ORDER BY event_type, next_type""")),

    QueryDef(
      "q139_robust_outliers",
      (s, dir) => robustOutliers(Tables.load(s, dir, "events"))
        .orderBy(col("event_type")),
      Some("""
        WITH m AS (
          SELECT event_type, quantile_cont(value, 0.5) AS med
          FROM events GROUP BY event_type),
        d AS (
          SELECT e.event_type,
                 quantile_cont(abs(e.value - m.med), 0.5) AS mad,
                 any_value(m.med) AS med
          FROM events e JOIN m ON e.event_type = m.event_type
          GROUP BY e.event_type)
        SELECT e.event_type, count(*) AS n,
               round(any_value(d.med), 4) AS med,
               round(any_value(d.mad), 4) AS mad,
               CAST(sum(CASE WHEN abs(e.value - d.med) > 3.0 * 1.4826 * d.mad
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        FROM events e JOIN d ON e.event_type = d.event_type
        GROUP BY e.event_type
        ORDER BY e.event_type""")),

    // 6-hour buckets, dense per-user grid with zero fill
    QueryDef(
      "q135_resample_gapfill",
      (s, dir) => resample(Tables.load(s, dir, "events"),
        bucketMicros = 21600000000L)
        .orderBy(col("user_id"), col("bucket_start")),
      Some("""
        WITH b AS (
          SELECT user_id, epoch_us(ts) // 21600000000 AS bucket, value
          FROM events),
        a AS (
          SELECT user_id, bucket, count(*) AS n_events,
                 round(sum(value), 4) AS sum_value
          FROM b GROUP BY user_id, bucket),
        g AS (
          SELECT user_id,
                 unnest(generate_series(min(bucket), max(bucket))) AS bucket
          FROM b GROUP BY user_id)
        SELECT g.user_id,
               make_timestamp(g.bucket * 21600000000) AS bucket_start,
               coalesce(a.n_events, 0) AS n_events,
               coalesce(a.sum_value, 0.0) AS sum_value
        FROM g LEFT JOIN a ON g.user_id = a.user_id AND g.bucket = a.bucket
        ORDER BY g.user_id, bucket_start""")),

    // 'error' events masquerade as sensor dropouts: their value is
    // nulled, then repaired by carry-forward per user
    QueryDef(
      "q133_forward_fill",
      (s, dir) => forwardFill(Tables.load(s, dir, "events"),
        col("event_type") === "error").orderBy(col("event_id")),
      Some("""
        WITH m AS (
          SELECT event_id, user_id, ts, event_type,
                 CASE WHEN event_type = 'error' THEN NULL ELSE value END AS v
          FROM events)
        SELECT event_id, user_id, event_type,
               round(last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
                 ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
                 AS filled_value
        FROM m
        ORDER BY event_id""")),

    QueryDef(
      "q129_table_profile",
      (s, dir) => tableProfile(Tables.load(s, dir, "events"),
        numericCols = Seq("event_id", "user_id", "value"),
        otherCols = Seq("event_type", "props"))
        .orderBy(col("col_name")),
      Some("""
        SELECT 'event_id' AS col_name,
               CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               count(DISTINCT event_id) AS n_distinct,
               round(CAST(min(event_id) AS DOUBLE), 4) AS min_num,
               round(CAST(max(event_id) AS DOUBLE), 4) AS max_num
        FROM events
        UNION ALL
        SELECT 'user_id',
               CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT user_id),
               round(CAST(min(user_id) AS DOUBLE), 4),
               round(CAST(max(user_id) AS DOUBLE), 4)
        FROM events
        UNION ALL
        SELECT 'value',
               CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT value),
               round(min(value), 4), round(max(value), 4)
        FROM events
        UNION ALL
        SELECT 'event_type',
               CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT event_type), NULL, NULL
        FROM events
        UNION ALL
        SELECT 'props',
               CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               count(DISTINCT props), NULL, NULL
        FROM events
        ORDER BY col_name""")),

    // mid-month cutoff: first two weeks = reference window, rest = fresh
    QueryDef(
      "q178_ks_drift",
      (s, dir) => ksDrift(Tables.load(s, dir, "events"),
        lit("2024-01-15").cast("timestamp")).orderBy(col("event_type")),
      Some("""
        WITH e AS (
          SELECT event_type, value,
                 CASE WHEN ts < TIMESTAMP '2024-01-15' THEN 1 ELSE 0 END AS ie
          FROM events),
        g AS (
          SELECT event_type, value, sum(ie) AS ne, sum(1 - ie) AS nl
          FROM e GROUP BY event_type, value),
        c AS (
          SELECT event_type,
                 sum(ne) OVER (PARTITION BY event_type ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ce,
                 sum(nl) OVER (PARTITION BY event_type ORDER BY value
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cl,
                 sum(ne) OVER (PARTITION BY event_type) AS te,
                 sum(nl) OVER (PARTITION BY event_type) AS tl
          FROM g)
        SELECT event_type, CAST(max(te) AS BIGINT) AS n_early,
               CAST(max(tl) AS BIGINT) AS n_late,
               round(max(abs(CAST(ce AS DOUBLE) / te
                 - CAST(cl AS DOUBLE) / tl)), 4) AS ks_stat
        FROM c
        WHERE te > 0 AND tl > 0
        GROUP BY event_type
        ORDER BY event_type""")),

    // p01/p99 winsorization of customer balances per market segment;
    // the oracle replays the identical rank-based bounds and clip
    QueryDef(
      "q205_winsorize",
      (s, dir) => winsorizedStats(Tables.load(s, dir, "customer"),
        "c_mktsegment", "c_acctbal").orderBy(col("c_mktsegment")),
      Some("""
        WITH ranked AS (
          SELECT c_mktsegment AS g, c_acctbal AS v,
                 row_number() OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal) AS rn,
                 count(*) OVER (PARTITION BY c_mktsegment) AS n
          FROM customer WHERE c_acctbal IS NOT NULL),
        bounds AS (
          SELECT g,
                 max(CASE WHEN rn = (1 * n + 99) // 100 THEN v END) AS lo,
                 max(CASE WHEN rn = (99 * n + 99) // 100 THEN v END) AS hi
          FROM ranked GROUP BY g)
        SELECT c_mktsegment, round(lo, 4) AS lo, round(hi, 4) AS hi,
               count(CASE WHEN c_acctbal < lo THEN 1 END) AS n_clip_lo,
               count(CASE WHEN c_acctbal > hi THEN 1 END) AS n_clip_hi,
               round(avg(c_acctbal), 4) AS raw_avg,
               round(avg(CASE WHEN c_acctbal < lo THEN lo
                              WHEN c_acctbal > hi THEN hi
                              ELSE c_acctbal END), 4) AS wins_avg
        FROM customer JOIN bounds ON c_mktsegment = g
        WHERE c_acctbal IS NOT NULL
        GROUP BY c_mktsegment, lo, hi
        ORDER BY c_mktsegment"""))
  )
}

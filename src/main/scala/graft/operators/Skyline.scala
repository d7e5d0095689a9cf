package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Pareto frontier (skyline) query: the rows not strictly dominated on a
  * (minimize, maximize) criteria pair — "cheapest for its size class"
  * style shortlists. A classic OLAP research operator the reference
  * could only phrase as an O(n²) reduce over the whole dataset.
  *
  * Scale shape — the naive formulations both die at 100 TB: the NOT
  * EXISTS self-join is quadratic, and the textbook running-max needs
  * ONE window over a global sort (single range partition). Decomposed
  * exactly instead, the q184 bucket pattern in 2D:
  *   1. bucket rows by the minimize-dimension on an exact integer grid
  *      (monotone: lower bucket ⇒ strictly smaller value);
  *   2. per-bucket max of the maximize-dimension (map-side partial agg)
  *      → a |buckets|-row summary; its strict prefix-max says what any
  *      LOWER-priced bucket can dominate with — broadcast back;
  *   3. within each bucket, a bucket-partitioned window with a RANGE
  *      frame to -1 on the integer minimize column gives the strictly-
  *      cheaper running max — exact tie handling, no global ordering.
  * A row survives iff neither cross-bucket prefix-max nor within-bucket
  * strict running max strictly exceeds its maximize value. Only the
  * |buckets|-row summary is ever single-partition; corpus-wide work is
  * one agg + one keyed window, both bucket-parallel.
  */
object Skyline {

  /** Frontier of `df` under (minimize `minC`, maximize `maxC`) strict
    * domination: keep rows where no other row has minC' < minC AND
    * maxC' > maxC. Both criteria must be integral (exact grid — callers
    * convert money to cents first). Output: input columns plus the
    * criteria projections `_min`/`_max` dropped. */
  def paretoFrontier(df: DataFrame, minC: Column, maxC: Column,
      buckets: Int = 1024): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    require(buckets >= 1)
    val base = df.withColumn("_min", minC.cast("long"))
      .withColumn("_max", maxC.cast("long"))
    val bounds = base.agg(min($"_min").as("_lo"), max($"_min").as("_hi"))
    // exact integer bucketing: (v - lo) * B div (hi - lo + 1) is
    // monotone and order-preserving across bucket boundaries
    // in-plan overflow guard: (v - lo) * buckets must stay in Long —
    // raise instead of silently mis-bucketing astronomically-ranged
    // inputs (row-local check, no extra job)
    val bk = base.crossJoin(bounds).withColumn("_bk",
      when($"_hi" - $"_lo" < 0 ||
          $"_hi" - $"_lo" > Long.MaxValue / buckets - 1,
        raise_error(lit(
          "paretoFrontier: minimize-dimension range overflows the bucket grid")))
        .when($"_hi" === $"_lo", lit(0L))
        .otherwise(($"_min" - $"_lo") * buckets / ($"_hi" - $"_lo" + 1)))
      .drop("_lo", "_hi")
    val summary = bk.groupBy($"_bk").agg(max($"_max").as("_bm"))
      // |buckets| rows: the single-partition window is bounded and tiny
      .withColumn("_pm", max($"_bm").over(
        Window.orderBy($"_bk").rowsBetween(Window.unboundedPreceding, -1)))
      .select($"_bk", $"_pm")
    val wIn = Window.partitionBy($"_bk").orderBy($"_min")
      .rangeBetween(Window.unboundedPreceding, -1)
    bk.join(broadcast(summary), Seq("_bk"))
      .withColumn("_im", max($"_max").over(wIn))
      .filter(
        (coalesce($"_pm", lit(Long.MinValue)) <= $"_max") &&
          (coalesce($"_im", lit(Long.MinValue)) <= $"_max"))
      .drop("_bk", "_pm", "_im", "_min", "_max")
  }

  // ------------------------------------------------------------------
  // fixture-bound oracle queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // price-size frontier over the part catalog: no part both strictly
    // cheaper and strictly larger exists for any surviving row
    QueryDef(
      "q198_pareto_frontier",
      (s, dir) => {
        import s.implicits._
        val p = Tables.load(s, dir, "part")
          .select($"p_partkey",
            expr("CAST(round(p_retailprice * 100) AS BIGINT)")
              .as("price_c"),
            $"p_size".cast("long").as("size"))
        paretoFrontier(p, col("price_c"), col("size"))
          .orderBy($"p_partkey")
      },
      Some("""
        WITH p AS (
          SELECT p_partkey,
                 CAST(round(p_retailprice * 100) AS BIGINT) AS price_c,
                 CAST(p_size AS BIGINT) AS size
          FROM part)
        SELECT p_partkey, price_c, size
        FROM p a
        WHERE NOT EXISTS (
          SELECT 1 FROM p b
          WHERE b.price_c < a.price_c AND b.size > a.size)
        ORDER BY p_partkey"""))
  )
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Incremental aggregate maintenance — the materialized-view refresh
  * primitive. The reference's only way to keep an aggregate current is
  * re-running the full map/reduce over all input plus `hold_state` to
  * skip already-seen FILES (/root/reference/mapper.py:110-143); the
  * aggregate itself is still recomputed from scratch every run. Here the
  * state IS the aggregate: a per-key row of mergeable partials
  * (count/sum/min/max) that each new batch folds into.
  *
  * Scale notes (100 TB posture):
  *  - a refresh scans ONLY the delta batch; history is represented by
  *    |keys| state rows, never re-read. At 100 TB of accumulated input
  *    with a daily 100 GB delta, refresh cost is the delta scan + one
  *    key-partitioned shuffle of |state ∪ delta-keys| partial rows.
  *  - merge is union + re-aggregate of PARTIALS — the same
  *    partial/final split Spark's own hash aggregate uses, expressed at
  *    the storage level. All four partials are associative+commutative,
  *    so batch arrival order cannot change the result (the law is
  *    property-tested in MaintenanceSpec, and q182's oracle replays the
  *    three-batch chain as one full recompute).
  *  - sums are kept on an integer grid (cents) by the caller: a DOUBLE
  *    sum would make the state order-sensitive at the 1e-15 level and
  *    the merge law only approximately true.
  *  - avg/stddev derive from (n, s) at read time; they are NOT stored
  *    (a stored avg is not mergeable). DELETE/retraction support would
  *    need signed counts — out of scope, documented, and detectable
  *    (n going negative).
  */
object Maintenance {

  /** Per-key mergeable aggregate state of one batch:
    * (k, n, s, mn, mx). */
  def aggState(batch: DataFrame, key: Column, value: Column): DataFrame =
    batch.groupBy(key.as("k"))
      .agg(count(lit(1)).as("n"), sum(value).as("s"),
        min(value).as("mn"), max(value).as("mx"))

  /** Fold a delta batch's state into prior state: union + re-aggregate,
    * one shuffle sized by state rows + delta keys (never history rows). */
  def mergeState(state: DataFrame, delta: DataFrame): DataFrame =
    state.unionByName(delta)
      .groupBy(col("k"))
      .agg(sum(col("n")).as("n"), sum(col("s")).as("s"),
        min(col("mn")).as("mn"), max(col("mx")).as("mx"))

  // ------------------------------------------------------------------
  // fixture-bound oracle queries
  // ------------------------------------------------------------------

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // three yearly "delta drops" of orders folded into one running
    // per-customer state; the oracle is the full recompute the operator
    // exists to avoid. Integer cents keep the merge law exact.
    QueryDef(
      "q182_incremental_agg_state",
      (s, dir) => {
        import s.implicits._
        val o = t(s, dir, "orders").select($"o_custkey",
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
          year($"o_orderdate").as("yr"))
        val b1 = aggState(o.filter($"yr" <= 1994), $"o_custkey", $"cents")
        val b2 = aggState(o.filter($"yr" >= 1995 && $"yr" <= 1996),
          $"o_custkey", $"cents")
        val b3 = aggState(o.filter($"yr" >= 1997), $"o_custkey", $"cents")
        mergeState(mergeState(b1, b2), b3)
          .select($"k".as("o_custkey"), $"n".as("n_orders"),
            $"s".as("total_cents"), $"mn".as("min_cents"),
            $"mx".as("max_cents"))
          .orderBy($"o_custkey")
      },
      // CAST on the sums: DuckDB sum(BIGINT) is HUGEINT (pandas-lossy)
      Some("""
        SELECT o_custkey, count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS total_cents,
               min(CAST(round(o_totalprice * 100) AS BIGINT)) AS min_cents,
               max(CAST(round(o_totalprice * 100) AS BIGINT)) AS max_cents
        FROM orders
        GROUP BY o_custkey
        ORDER BY o_custkey"""))
  )
}

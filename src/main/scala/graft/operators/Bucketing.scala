package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Bucketed-table layout: the co-located join / pre-shuffled aggregation
  * primitive.
  *
  * The reference partitions every dataset by `hash(key) % num_partitions`
  * ON EVERY JOB — the shuffler re-hashes and re-writes all records each
  * run (/root/reference/shuffler.py:71-86). Bucketing is that idea done
  * once at WRITE time and remembered by the catalog: data is hash-split
  * into a fixed number of buckets per table, and any later join or
  * aggregation keyed on the bucket column reuses the layout instead of
  * shuffling.
  *
  * 100 TB posture — this is THE structural shuffle killer:
  *  - two tables bucketed on the same key with the same bucket count
  *    sort-merge-join with ZERO Exchange on either side (asserted in
  *    `BucketingSpec`); at fact-fact scale (lineitem ⋈ orders at 100 TB)
  *    that's the difference between a full-cluster shuffle per query and
  *    none at all — the shuffle is paid once at ingest;
  *  - `sortBy` inside each bucket additionally removes the per-task Sort
  *    before the merge join when files-per-bucket is 1;
  *  - groupBy on the bucket key aggregates with no Exchange either
  *    (bucketing satisfies the hash-partitioning requirement);
  *  - bucket count is a layout constant sized to the cluster (total
  *    cores × small factor), not per-query; AQE cannot coalesce bucketed
  *    scans, so it is chosen once at table-design time.
  *
  * The fixture stages bucketed copies of `orders`/`customer` under the
  * session warehouse (tmpdir) via `bucketBy().sortBy().saveAsTable` —
  * overwrite-idempotent, deterministic table names per fixture dir.
  */
object Bucketing {

  private def tag(dir: String): String = Integer.toHexString(dir.hashCode)

  /** Stage `df` as a bucketed+sorted managed table; returns the name.
    * Idempotent across JVMs, not just sessions: with the in-memory
    * catalog, a previous process's staging leaves the warehouse
    * directory behind with no catalog entry, and `saveAsTable` refuses
    * to CREATE over an existing location — so both the table and any
    * orphaned location are cleared first. */
  def stageBucketed(s: SparkSession, df: DataFrame, name: String,
      buckets: Int, key: String): String = {
    // same-session reuse: the name is content-addressed by the fixture
    // dir (immutable for a session's lifetime), so a table this session
    // already staged is bit-identical — skip the rewrite entirely. This
    // is what lets q155 and q161 share ONE staging write per run instead
    // of each re-paying the full bucketed write.
    if (s.catalog.tableExists(name)) return name
    s.sql(s"DROP TABLE IF EXISTS $name")
    val loc = new org.apache.hadoop.fs.Path(
      s.conf.get("spark.sql.warehouse.dir"), name.toLowerCase)
    val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(name)
    name
  }

  /** Bucketed orders ⋈ bucketed customer on custkey, then per-segment
    * order stats. The join consumes both bucket layouts (no Exchange);
    * only the final small groupBy(mktsegment) shuffles — 5 groups. */
  def bucketedSegmentStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = stageBucketed(s, Tables.load(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice"),
      s"graft_bkt_orders_${tag(dir)}", 8, "o_custkey")
    val c = stageBucketed(s, Tables.load(s, dir, "customer")
        .select($"c_custkey", $"c_mktsegment"),
      s"graft_bkt_customer_${tag(dir)}", 8, "c_custkey")
    // exact integer cents so the sum is order-independent across engines
    s.table(o).join(s.table(c), $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), sum($"cents").as("total_cents"))
      .orderBy($"c_mktsegment")
  }

  /** Aggregation keyed on the bucket column: the bucketed scan already
    * satisfies the hash-partitioning requirement, so the per-customer
    * rollup runs with NO Exchange at all (asserted in `BucketingSpec`) —
    * at 100 TB the difference between re-shuffling the fact table for
    * every keyed rollup and reading pre-placed buckets. */
  def bucketedCustomerRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // same staged table as q155 (same name, schema and layout): the
    // tableExists guard in stageBucketed means one Verify/Bench run
    // stages it once and both queries read it
    val o = stageBucketed(s, Tables.load(s, dir, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice"),
      s"graft_bkt_orders_${tag(dir)}", 8, "o_custkey")
    s.table(o)
      .select($"o_custkey",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"), sum($"cents").as("total_cents"))
      .orderBy($"o_custkey")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q155_bucketed_join",
      (s, dir) => bucketedSegmentStats(s, dir),
      // oracle replays from the raw parquet: any fault in the bucketed
      // write/read path (dropped rows, bucket misroute) hash-mismatches.
      // Outer CAST: DuckDB sum(BIGINT) yields HUGEINT, which the driver's
      // pandas fetch renders as float64 ("...0") and hash-mismatches
      // against Spark's long — cast back to BIGINT (round-5 q155 finding)
      Some("""
        SELECT c_mktsegment, count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS total_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
      """)),

    QueryDef(
      "q161_bucketed_agg",
      (s, dir) => bucketedCustomerRollup(s, dir),
      // same HUGEINT->BIGINT cast rationale as q155
      Some("""
        SELECT o_custkey, count(*) AS n_orders,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS total_cents
        FROM orders
        GROUP BY o_custkey
        ORDER BY o_custkey
      """)))
}

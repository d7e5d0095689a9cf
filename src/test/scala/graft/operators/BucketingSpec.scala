package graft.operators

import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The q155 surface: staged bucketed tables must produce the same answer
  * as the direct parquet join, consume the bucket layout (no join-side
  * shuffle when broadcast is off), and restage idempotently. */
class BucketingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("bucketedSegmentStats matches the direct join and is overwrite-idempotent") {
    import spark.implicits._
    val got = Bucketing.bucketedSegmentStats(spark, sf).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    val o = graft.engine.Tables.load(spark, sf, "orders")
    val c = graft.engine.Tables.load(spark, sf, "customer")
    val exp = o.join(c, $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment",
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), sum($"cents").as("total_cents"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(got == exp)
    // restage + rerun over the same warehouse tables: identical
    val again = Bucketing.bucketedSegmentStats(spark, sf).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(again == got)
  }

  test("bucketed join consumes the layout: no shuffle on either join input") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val df = Bucketing.bucketedSegmentStats(spark, sf)
      val p = df.queryExecution
        .explainString(ExplainMode.fromString("formatted"))
      // everything below the join comes straight off the bucketed scans:
      // in the tree section, the join subtree (deepest, printed last)
      // must contain no Exchange — its inputs are Sort-over-Scan only.
      // (guard the separator lookup: a missing blank line should fail
      // the assertions below readably, not throw out of substring)
      val sep = p.indexOf("\n\n")
      val tree = if (sep >= 0) p.substring(0, sep) else p
      val ji = tree.indexOf("SortMergeJoin")
      assert(ji >= 0 || tree.contains("ShuffledHashJoin"), p.take(2000))
      val joinSubtree = tree.substring(math.max(ji, 0))
      assert(!joinSubtree.contains("Exchange"),
        "bucketed join re-shuffled an input:\n" + p.take(2000))
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed aggregation on the bucket key needs no hash exchange") {
    import spark.implicits._
    val df = Bucketing.bucketedCustomerRollup(spark, sf)
    val p = df.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // the scan is pre-partitioned on o_custkey: the only exchange in the
    // whole plan is the rangepartitioning for the final orderBy
    assert(!p.contains("Exchange hashpartitioning"),
      "keyed rollup re-shuffled a bucketed scan:\n" + p.take(2000))
    assert(df.groupBy().agg(org.apache.spark.sql.functions.sum($"n_orders"))
      .collect().head.getLong(0) ==
      graft.engine.Tables.load(spark, sf, "orders").count())
  }
}

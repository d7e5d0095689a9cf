package graft.operators

import org.apache.spark.sql.execution.ExplainMode

import graft.SparkSpec

/** Runtime bloom-filter join pruning (Catalyst's InjectRuntimeFilter):
  * when one side of a shuffle join carries a selective filter, Spark
  * builds a bloom filter over that side's join keys and semi-joins the
  * OTHER side against it before the shuffle — probe rows that cannot
  * match are dropped at the scan instead of being shuffled. At 100 TB
  * this turns "shuffle the whole fact table" into "shuffle the ~1% that
  * can join"; it is free to enable, so the audit pins that the
  * optimizer actually injects it under fact-scale conditions (the
  * thresholds here emulate: build side under the size cap, probe side
  * big enough to be worth filtering, no broadcast available). */
class RuntimeBloomFilterSpec extends SparkSpec {

  test("selective shuffle join injects a bloom filter on the probe side") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // fixture-scale stand-ins for "1% dimension vs 100 TB fact"
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.range(0, 100000)
        .selectExpr("id % 1000 AS k", "id AS payload")
      val dim = spark.range(0, 1000)
        .selectExpr("id AS k", "id % 17 AS tag")
        .filter($"tag" === 3) // selective: ~6% of the dim survives
      val joined = fact.join(dim, "k")
      val p = joined.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("bloom_filter") || p.contains("might_contain"),
        s"no runtime bloom filter injected:\n${p.take(2000)}")
      // and it actually prunes: only k in {3, 20, 37, ...} survive
      assert(joined.count() == 59 * 100)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q169's parquet join shape injects the filter into the fact scan") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.001"
      val o = graft.engine.Tables.load(spark, dir, "orders")
        .filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey")
      val l = graft.engine.Tables.load(spark, dir, "lineitem")
        .select($"l_orderkey", $"l_quantity")
      val p = l.join(o, $"l_orderkey" === $"o_orderkey")
        .queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("bloom_filter") || p.contains("might_contain"),
        s"no runtime bloom filter on the parquet fact scan:\n${p.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}

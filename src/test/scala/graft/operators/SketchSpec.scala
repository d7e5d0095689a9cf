package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Laws behind q164's mergeable-sketch pattern: DataSketches HLL
  * sketches over the same value set merge to the SAME sketch no matter
  * how the data was grouped first — union_agg(sketch per group) is
  * grouping-invariant and equals the direct whole-table sketch. This is
  * the property that lets 100 TB pipelines sketch each shard/day once
  * and answer any cross-cut later without re-scanning. */
class SketchSpec extends SparkSpec {

  test("hll_union_agg estimate is invariant to how rows were grouped") {
    val df = spark.range(100000)
      .selectExpr("id % 5000 AS v", "id % 7 AS g7", "id % 3 AS g3")
      .cache()
    def merged(groupCol: String): Long = df
      .groupBy(col(groupCol))
      .agg(expr("hll_sketch_agg(v, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))").as("e"))
      .collect()(0).getLong(0)
    val direct = df
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(v, 14))").as("e"))
      .collect()(0).getLong(0)
    val by7 = merged("g7")
    val by3 = merged("g3")
    // same value set -> identical registers -> identical estimate,
    // regardless of grouping (merge = per-register max, associative)
    assert(by7 == direct && by3 == direct,
      s"grouping changed the merged estimate: direct=$direct by7=$by7 by3=$by3")
    // and the estimate honors the lgK=14 accuracy contract (<<5% here)
    assert(math.abs(direct - 5000L) <= 250,
      s"estimate $direct outside 5% of true 5000")
    df.unpersist()
  }

  test("sketches survive parquet persistence: store per-group, merge later") {
    // the workflow the pattern promises at 100 TB: sketch each partition
    // once, PERSIST the binary sketch column, answer cross-cuts later
    // from the stored sketches alone — no re-scan of the base data
    val dir = java.nio.file.Files
      .createTempDirectory("sketches_").toString + "/sk"
    val df = spark.range(50000).selectExpr("id % 2000 AS v", "id % 5 AS g")
    df.groupBy(col("g")).agg(expr("hll_sketch_agg(v, 14)").as("sk"))
      .write.parquet(dir)
    val live = df
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(v, 14))"))
      .collect()(0).getLong(0)
    val fromDisk = spark.read.parquet(dir)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, true))"))
      .collect()(0).getLong(0)
    assert(fromDisk == live,
      s"stored-sketch merge $fromDisk != live sketch $live")
  }
}

package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.SparkSpec
import graft.operators.Maintenance

/** Laws behind q233's incremental percentile maintenance: exactly-once
  * folding (a re-run with no new files is a NO-OP, not a double-count),
  * and incremental == one-shot (the exact-merge property surfaced at the
  * file level). */
class IncrementalQuantileSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def mk(): (IncrementalQuantile, String) = {
    val input = tmp("iq_in_")
    val inc = new IncrementalQuantile(
      spark, input,
      StructType(Seq(StructField("k", LongType), StructField("v", DoubleType))),
      tmp("iq_ck_"), tmp("iq_st_"),
      keyCol = "k", valueCol = "v", lo = 0.0, hi = 100.0, bins = 20)
    (inc, input)
  }

  private def stateCells(inc: IncrementalQuantile) =
    inc.state().get.orderBy($"k", $"b").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq

  test("update with no new files is a no-op; re-arrivals fold exactly once") {
    val (inc, input) = mk()
    Seq((1L, 10.0), (1L, 55.0), (2L, 90.0)).toDF("k", "v")
      .write.mode("append").parquet(input)
    inc.update()
    val after1 = stateCells(inc)
    // no new files: the checkpoint's seen-set must make this a no-op
    inc.update()
    assert(stateCells(inc) == after1, "re-run without new data double-folded")
    // a second batch folds in once
    Seq((1L, 12.0), (2L, 5.0)).toDF("k", "v")
      .write.mode("append").parquet(input)
    inc.update()
    val after2 = stateCells(inc)
    assert(after2 != after1)
    inc.update() // and again: no-op
    assert(stateCells(inc) == after2)
  }

  test("incremental folds equal the one-shot state over all arrivals") {
    val (inc, input) = mk()
    val b1 = Seq((1L, 10.0), (1L, 55.0), (2L, 90.0), (3L, 33.0))
    val b2 = Seq((1L, 12.0), (2L, 5.0), (3L, 33.5))
    Seq(b1, b2).foreach { b =>
      b.toDF("k", "v").write.mode("append").parquet(input)
      inc.update()
    }
    val oneShot = Maintenance.quantileState(
      (b1 ++ b2).toDF("k", "v"), col("k"), col("v"),
      lo = 0.0, hi = 100.0, bins = 20)
      .orderBy($"k", $"b").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(stateCells(inc) == oneShot,
      "two incremental folds must equal the one-shot state cell for cell")
    // and the percentile read agrees with reading the one-shot state
    val inc50 = inc.quantile(0.5).get.select($"k", $"q").orderBy($"k")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val one50 = Maintenance.quantileFromState(
      (b1 ++ b2).toDF("k", "v").transform(df =>
        Maintenance.quantileState(df, col("k"), col("v"), 0.0, 100.0, 20)),
      p = 0.5, lo = 0.0, wid = 5.0)
      .select($"k", $"q").orderBy($"k").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(inc50 == one50)
  }
}

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

  test("keep-last-N retention: old versions vanish after each flip, " +
      "the pointer target and the rollback version survive") {
    import java.nio.file.{Files => F, Paths}
    val input = tmp("iq_in_")
    val stateDir = tmp("iq_st_")
    val inc = new IncrementalQuantile(
      spark, input,
      StructType(Seq(StructField("k", LongType), StructField("v", DoubleType))),
      tmp("iq_ck_"), stateDir,
      keyCol = "k", valueCol = "v", lo = 0.0, hi = 100.0, bins = 20,
      retainVersions = 2)
    def versions(): Set[String] = {
      val s = F.list(Paths.get(stateDir))
      try {
        val it = s.iterator(); val b = Set.newBuilder[String]
        while (it.hasNext) {
          val n = it.next().getFileName.toString
          if (n.matches("v\\d+")) b += n
        }
        b.result()
      } finally s.close()
    }
    for (i <- 1 to 4) {
      Seq((1L, i * 10.0)).toDF("k", "v").write.mode("append").parquet(input)
      inc.update()
    }
    // batch ids 0..3 -> only v2 (rollback) and v3 (current) remain
    assert(versions() == Set("v2", "v3"),
      s"expected last-2 retention, got ${versions()}")
    val pointer = Paths.get(stateDir, "_LATEST")
    assert(F.readString(pointer).trim == "v3")
    // the rollback contract: flipping the pointer back one version
    // reads a complete, older state
    val nCurrent = inc.state().get.agg(sum($"c")).collect()(0).getLong(0)
    IncrementalAgg.flipPointer(pointer, "v2")
    val nRolledBack = inc.state().get.agg(sum($"c")).collect()(0).getLong(0)
    assert(nRolledBack == nCurrent - 1, "v2 must be the pre-batch-3 state")
    // prune must NEVER delete the pointer target, even a manually
    // rolled-back one outside the newest N
    IncrementalAgg.pruneVersions(stateDir, pointer, retain = 1)
    assert(versions() == Set("v2", "v3"),
      "pointer target v2 must survive a retain-1 prune")
    // a version written by a crashed run that never flipped sorts
    // newest and is retained for the replaying batch to overwrite
    F.createDirectories(Paths.get(stateDir, "v99"))
    IncrementalAgg.pruneVersions(stateDir, pointer, retain = 1)
    assert(versions() == Set("v2", "v99"),
      "crashed-but-unflipped newest version must be retained")
  }

  test("previousState is the version one flip behind the pointer " +
      "(None before two versions; respects a manual rollback)") {
    import java.nio.file.{Files => F, Paths}
    val input = tmp("iq_in_")
    val stateDir = tmp("iq_st_")
    val inc = new IncrementalQuantile(
      spark, input,
      StructType(Seq(StructField("k", LongType), StructField("v", DoubleType))),
      tmp("iq_ck_"), stateDir,
      keyCol = "k", valueCol = "v", lo = 0.0, hi = 100.0, bins = 20)
    assert(inc.previousState().isEmpty)
    Seq((1L, 10.0)).toDF("k", "v").write.mode("append").parquet(input)
    inc.update()
    assert(inc.previousState().isEmpty, "one version: no previous yet")
    Seq((1L, 30.0)).toDF("k", "v").write.mode("append").parquet(input)
    inc.update()
    // previous = v0 (one row folded), current = v1 (two)
    def total(df: org.apache.spark.sql.DataFrame) =
      df.agg(sum($"c")).collect()(0).getLong(0)
    assert(total(inc.previousState().get) == 1L)
    assert(total(inc.state().get) == 2L)
    // drift between them sees exactly the second batch's contribution
    val drift = inc.driftSincePreviousVersion().get
      .select($"n_ref", $"n_cur").collect()(0)
    assert(drift.getLong(0) == 1L && drift.getLong(1) == 2L)
    // after a manual rollback to v0, there is nothing older than the
    // pointer target -> no previous
    IncrementalAgg.flipPointer(Paths.get(stateDir, "_LATEST"), "v0")
    assert(inc.previousState().isEmpty)
    assert(F.exists(Paths.get(stateDir, "v1")), "rollback deletes nothing")
  }

  test("crash between state write and pointer flip recovers: the " +
      "replayed fold overwrites the same version and the result is " +
      "exactly-once") {
    import java.nio.file.{Files => F, Paths}
    val input = tmp("iq_in_")
    val stateDir = tmp("iq_st_")
    val mkInc = () => new IncrementalQuantile(
      spark, input,
      StructType(Seq(StructField("k", LongType), StructField("v", DoubleType))),
      tmp("iq_ck_"), stateDir,
      keyCol = "k", valueCol = "v", lo = 0.0, hi = 100.0, bins = 20)
    // simulate the crash window: v0 was WRITTEN by a run that died
    // before flipping the pointer (and before the checkpoint commit —
    // mkInc uses a fresh checkpoint dir, so batch 0 replays). Plant a
    // poisoned v0 to prove the replay overwrites rather than trusts it.
    Seq((9L, 50.0)).toDF("k", "v")
      .write.parquet(Paths.get(stateDir, "v0").toString)
    assert(!F.exists(Paths.get(stateDir, "_LATEST")))
    Seq((1L, 10.0), (2L, 90.0)).toDF("k", "v")
      .write.mode("append").parquet(input)
    val inc = mkInc()
    inc.update()
    assert(F.readString(Paths.get(stateDir, "_LATEST")).trim == "v0")
    val cells = inc.state().get.orderBy($"k", $"b").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(cells == Seq((1L, 2, 1L), (2L, 18, 1L)),
      s"replay must overwrite the crashed write, got $cells")
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

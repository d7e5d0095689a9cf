package graft.jobs

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Dedup

/** The reference's operational story for incremental pipelines — a
  * scheduler job that processes each new batch against persisted state
  * (`hold_state`: /root/reference/README.txt:18, mapper.py:110-143,
  * scheduler.py:496-533) — wired end-to-end on Spark: one [[SparkJob]]
  * per arriving batch runs [[Dedup.incrementalNearDedup]] against the
  * persisted MinHash band index, writes the surviving docs, and appends
  * the survivors' band keys to the index for every later batch.
  *
  * State layout: `indexDir/batch=<name>/` parquet per batch, so
  *  - a batch job is idempotent (overwrite of its own partition — a
  *    retried/re-forced job cannot double its keys),
  *  - `spark.read.parquet(indexDir)` unions all history via partition
  *    discovery with no manifest to maintain,
  *  - the state stays O(kept docs): ≤ 4 band keys per survivor, no
  *    text, no shingles — at 100 TB the index is GB-scale while the
  *    corpus it summarizes is not.
  *
  * Recompute discipline: survivors are WRITTEN first and the band index
  * is computed from the files just written, so the dedup plan runs
  * exactly once per batch (the index build re-reads columnar survivors,
  * never re-runs the anti-join). Failure semantics come from the queue:
  * jobs share a `groupName`, so a failed batch cascades away queued
  * later batches rather than letting them dedup against a hole in the
  * index.
  */
object IncrementalJobs {

  /** Build the per-batch job. `batchName` keys the index partition and
    * the output subdir; jobs for one pipeline share `group` so the
    * queue's failure cascade covers the whole chain. */
  def nearDupBatchJob(batchName: String, batchDir: String, indexDir: String,
      outDir: String, threshold: Double, group: String = "neardup",
      priority: Int = 0): SparkJob =
    SparkJob(
      name = s"neardup_$batchName",
      run = s => runBatch(s, batchName, batchDir, indexDir, outDir, threshold),
      priority = priority,
      groupName = Some(group))

  /** One batch pass: read batch, dedup against history, write survivors,
    * extend the index. Public for direct (non-queued) use.
    *
    * History EXCLUDES this batch's own index partition: a retried or
    * force-rerun job would otherwise dedup the batch against its own
    * previous output and drop every survivor — with the exclusion a
    * replay is a true no-op (same survivors, same index keys). */
  def runBatch(spark: SparkSession, batchName: String, batchDir: String,
      indexDir: String, outDir: String, threshold: Double): Unit = {
    val newDocs = spark.read.parquet(batchDir)
    val survivors = Dedup.incrementalNearDedup(newDocs,
      readIndexParts(spark, indexDir, excludeBatch = Some(batchName)),
      threshold)
    val outPath = s"$outDir/batch=$batchName"
    survivors.write.mode("overwrite").parquet(outPath)
    // index from the written files: zero recompute of the dedup plan,
    // and a crash between the two writes leaves a rerunnable job (both
    // writes are overwrite-idempotent per batch partition)
    Dedup.minhashBandIndex(spark.read.parquet(outPath))
      .write.mode("overwrite").parquet(s"$indexDir/batch=$batchName")
  }

  /** All persisted band keys across batches; empty-seeded before the
    * first batch ever lands. */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame =
    readIndexParts(spark, indexDir, excludeBatch = None)

  private def readIndexParts(spark: SparkSession, indexDir: String,
      excludeBatch: Option[String]): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p) && fs.listStatus(p).nonEmpty) {
      val all = spark.read.parquet(indexDir)
      // cast: partition-value type inference must not break the compare
      // for numeric-looking batch names
      excludeBatch.fold(all)(b =>
          all.filter(org.apache.spark.sql.functions.col("batch")
            .cast("string") =!= b))
        .select("band", "bk")
    } else {
      import spark.implicits._
      Seq.empty[(Int, String)].toDF("band", "bk")
    }
  }
}

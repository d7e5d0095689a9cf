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
    * queue's failure cascade covers the whole chain. Names are
    * restricted to word chars so they map 1:1 onto `batch=<name>`
    * partition directories (no URL-escaping, no partition-value
    * canonicalization surprises). */
  def nearDupBatchJob(batchName: String, batchDir: String, indexDir: String,
      outDir: String, threshold: Double, group: String = "neardup",
      priority: Int = 0): SparkJob = {
    require(batchName.matches("[A-Za-z0-9_-]+"),
      s"batch name must be [A-Za-z0-9_-]+: $batchName")
    SparkJob(
      name = s"neardup_$batchName",
      run = s => runBatch(s, batchName, batchDir, indexDir, outDir, threshold),
      priority = priority,
      groupName = Some(group))
  }

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
    // per-batch cache hygiene: the dedup operators pin their shared
    // shingle/band frames for the session (Dedup scaladoc); in a
    // long-lived scheduler session those accumulate ~6 cached frames per
    // batch unless released after the batch's terminal writes — the
    // exact block-manager creep Bench/Verify defend against per query
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = false))
  }

  /** All persisted band keys across batches; empty-seeded before the
    * first batch ever lands. */
  def readIndex(spark: SparkSession, indexDir: String): DataFrame =
    readIndexParts(spark, indexDir, excludeBatch = None)

  private def readIndexParts(spark: SparkSession, indexDir: String,
      excludeBatch: Option[String]): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(indexDir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // exclusion by PATH, not by a filter on the inferred partition
    // column: partition-value type inference canonicalizes numeric
    // names ("007" reads back as 7), so a column compare would fail to
    // exclude the batch's own partition on retry and silently empty it
    val parts =
      if (fs.exists(p))
        fs.listStatus(p).filter(_.isDirectory)
          .map(_.getPath).filter(_.getName.startsWith("batch="))
          .filter(d => !excludeBatch.contains(
            d.getName.stripPrefix("batch=")))
      else Array.empty[org.apache.hadoop.fs.Path]
    if (parts.nonEmpty)
      spark.read.parquet(parts.map(_.toString).toIndexedSeq: _*)
        .select("band", "bk")
    else {
      import spark.implicits._
      Seq.empty[(Int, String)].toDF("band", "bk")
    }
  }
}

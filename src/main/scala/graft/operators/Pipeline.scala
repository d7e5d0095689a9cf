package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** End-to-end training-data curation pipeline: the composition a corpus
  * actually runs before pre-training — exact dedup, quality gate,
  * near-dup removal — as ONE declared plan, so Catalyst sees the whole
  * dataflow (shared scans, pushed filters) instead of three materialized
  * passes.
  *
  * The reference could only express this as a chain of separate
  * map/reduce jobs with intermediate files between them
  * (/root/reference/scheduler.py:496-533 — one job dict per stage); here
  * the stages fuse into a single job whose intermediates never hit disk.
  *
  * Scale notes (100 TB posture): stage order is by selectivity — the
  * exact-dup window and the quality filter each shuffle only (digest,
  * doc_id)-width rows, and the near-dup anti-join ships only the
  * candidate id set; full text crosses the wire exactly once (the
  * shingle pass inside MinHash+LSH). Near-dup pairs are computed against
  * the FULL corpus (q75 semantics): dropping a doc for a near-dup that
  * the quality gate later removes keeps the result independent of stage
  * commutation — the same contract the oracle replays.
  */
object Pipeline {

  /** Clean-corpus view: exact-dup non-minima out, rounded quality score
    * >= `qualityMin`, near-dup (MinHash+LSH, `nearDupThreshold`)
    * higher-ids out. */
  def cleanCorpus(docs: DataFrame, qualityMin: Double,
      nearDupThreshold: Double): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    // project to (ids, digest) BEFORE the dedup window: partitioning by
    // md5(text) on the full row would ship every document's text through
    // the shuffle — the digest row is ~40 bytes instead
    val exactKeep = docs
      .select($"doc_id", $"lang", $"source", md5($"text").as("_digest"))
      .withColumn("_keep",
        min($"doc_id").over(Window.partitionBy($"_digest")))
      .filter($"doc_id" === $"_keep")
      .select($"doc_id", $"lang", $"source")
    val quality = TextAnalysis.qualityScore(docs)
      .select($"doc_id", $"quality", $"n_tokens")
    val nearDupIds = Dedup.minhashLshPairs(docs, nearDupThreshold)
      .select($"id2".as("doc_id")).distinct()
    exactKeep
      .join(quality, "doc_id")
      .filter($"quality" >= qualityMin)
      .join(nearDupIds, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"lang", $"source", $"quality", $"n_tokens")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q103_training_pipeline",
      (s, dir) => cleanCorpus(Tables.load(s, dir, "documents"),
        qualityMin = 0.5, nearDupThreshold = 0.8)
        .orderBy(col("doc_id")),
      Some(Dedup.minhashOracle("""
        , keepx AS (
          SELECT doc_id, lang, source,
                 min(doc_id) OVER (PARTITION BY md5(text)) AS keep
          FROM documents),
        qf AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '),
                             x -> length(x) > 0) AS tk
          FROM documents),
        qual AS (
          SELECT doc_id,
                 CAST(len(tk) AS BIGINT) AS n_tokens,
                 round(least(len(tk)::DOUBLE / 100.0, 1.0) * 0.4 +
                       (len(list_distinct(tk)) / len(tk)::DOUBLE) * 0.4 +
                       least(len(list_filter(tk,
                         x -> x IN ('the','a','of','and','to')))::DOUBLE
                         * 10 / len(tk), 1.0) * 0.2,
                       4) AS quality
          FROM qf)
        SELECT k.doc_id, k.lang, k.source, q.quality, q.n_tokens
        FROM keepx k JOIN qual q USING (doc_id)
        WHERE k.doc_id = k.keep
          AND q.quality >= 0.5
          AND k.doc_id NOT IN (SELECT DISTINCT id2 FROM j
                               WHERE jaccard >= 0.8)
        ORDER BY doc_id""")))
  )
}

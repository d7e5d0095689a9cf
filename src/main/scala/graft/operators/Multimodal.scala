package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed per-partition in batches.
  *
  * The container has no image/audio codecs, so the decode step is a
  * STUB (deterministic fake, clearly marked below); everything around it
  * — the binary column, the typed records, the mapPartitions batch shape,
  * the partition sizing — is the real 100 TB design:
  *
  *  - media rides in a `binary` column next to its metadata; Parquet
  *    stores it row-grouped so a metadata-only query never reads bytes
  *    (column pruning), and `spark.sql.files.maxPartitionBytes` bounds
  *    per-task memory when it is read.
  *  - decode/feature-extract runs once per partition via mapPartitions —
  *    the iterator is streamed, nothing is materialized, and a real
  *    decoder would amortize model/codec init across the partition
  *    exactly like this stub amortizes its MessageDigest instance.
  */
object Multimodal {

  /** Input record: opaque bytes + typed metadata. */
  final case class MediaRecord(doc_id: Long, media: Array[Byte], kind: String)

  /** Extracted features. */
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, digest: String,
      fake_width: Int, fake_height: Int)

  /** ===== STUB decode =====
    * Deterministic fake standing in for a real image/audio decode: length,
    * content digest, and "dimensions" derived from the first two bytes.
    * A real implementation would decode `media` with an actual codec here;
    * the Spark-side contract (streamed iterator in, iterator out,
    * per-partition init) is unchanged. */
  private def decodeStub(records: Iterator[MediaRecord]): Iterator[MediaFeatures] = {
    val md = MessageDigest.getInstance("SHA-256") // per-partition init
    records.map { r =>
      md.reset()
      val digest = md.digest(r.media).map("%02x".format(_)).mkString
      MediaFeatures(
        doc_id = r.doc_id,
        n_bytes = r.media.length.toLong,
        digest = digest,
        fake_width = if (r.media.nonEmpty) r.media(0) & 0xff else 0,
        fake_height = if (r.media.length > 1) r.media(1) & 0xff else 0)
    }
  }

  val defs: Seq[QueryDef] = Seq(

    // documents.text re-cast as utf-8 "media" bytes exercises the whole
    // binary path; features come out of the partition-streamed stub and
    // are SQL-checkable because the stub is deterministic.
    QueryDef(
      "q52_multimodal_features",
      (s, dir) => {
        import s.implicits._
        val media = Tables.load(s, dir, "documents")
          .select($"doc_id", $"text".cast("binary").as("media"),
            lit("image/fake").as("kind"))
          .as[MediaRecord]
        media
          .mapPartitions(decodeStub)
          .toDF()
          .orderBy($"doc_id")
      },
      Some("""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS digest,
               CAST(ascii(substring(text, 1, 1)) AS INT) AS fake_width,
               CAST(ascii(substring(text, 2, 1)) AS INT) AS fake_height
        FROM documents
        ORDER BY doc_id""")),

    // column-pruning contract gated by CORRECTNESS, not only the plan
    // audit: the aggregation must never read the binary column (its
    // ReadSchema excludes `media` — asserted in PlanAuditSpec) and still
    // produce the exact metadata rollup.
    QueryDef(
      "q89_multimodal_metadata_only",
      (s, dir) => metadataOnly(s, dir).orderBy(col("lang")),
      Some("""
        SELECT lang, count(*) AS n
        FROM documents
        GROUP BY lang
        ORDER BY lang""")),

    // frame sampling: the video-pipeline access pattern — cut the binary
    // payload into fixed-size frames, keep every Nth. explode(sequence)
    // over byte offsets + substring on the binary column: linear, row
    // parallel, no window. (A real codec would replace the byte slicing
    // with keyframe extraction; the plumbing — offset enumeration,
    // stride, per-frame rows — is identical. Fixture text is ASCII, so
    // the oracle's char offsets equal the binary byte offsets.)
    QueryDef(
      "q99_multimodal_frame_sample",
      (s, dir) => {
        import s.implicits._
        frameSample(
          Tables.load(s, dir, "documents")
            .select($"doc_id", $"text".cast("binary").as("media")),
          frameBytes = 32, stride = 3)
          .orderBy($"doc_id", $"frame_idx")
      },
      Some("""
        WITH frames AS (
          SELECT doc_id,
                 unnest(generate_series(0, (length(text) - 1) // 32))
                   AS frame_idx,
                 text
          FROM documents
          WHERE length(text) > 0)
        SELECT doc_id, frame_idx,
               substring(text, frame_idx * 32 + 1, 32) AS frame
        FROM frames
        WHERE frame_idx % 3 = 0
        ORDER BY doc_id, frame_idx"""))
  )

  /** Cut a binary payload into fixed-size frames, keep every `stride`-th:
    * (doc_id, frame_idx, frame). Empty payloads emit NO frames — Spark's
    * int division truncates (0-1)/N toward zero, which without the guard
    * would fabricate one empty frame where floor semantics (DuckDB `//`)
    * emit none; a real decoder also yields nothing for an empty stream. */
  def frameSample(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media
      .filter(length($"media") > 0)
      .select($"doc_id",
        explode(sequence(lit(0),
          ((length($"media") - 1) / frameBytes).cast("int")))
          .as("frame_idx"),
        $"media")
      .filter($"frame_idx" % stride === 0)
      .select($"doc_id", $"frame_idx".cast("long").as("frame_idx"),
        $"media".substr($"frame_idx" * frameBytes + 1, lit(frameBytes))
          .cast("string").as("frame"))
  }

  /** Column-pruning counterpart: metadata-only aggregation that must never
    * touch the binary column (ReadSchema shows bytes excluded). */
  def metadataOnly(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.load(s, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("media"), $"lang")
      .groupBy($"lang").agg(count(lit(1)).as("n"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Winnowing fingerprints — the MOSS document-fingerprinting algorithm
  * (Schleimer, Wilkerson, Aiken, SIGMOD'03): hash every k-gram, slide
  * a window of w consecutive hashes, keep each window's minimum. The
  * guarantee: any shared substring of length ≥ w+k−1 tokens between
  * two documents shares at least one fingerprint, while storage drops
  * to ~2/(w+1) of the k-gram count — the standard local fingerprinting
  * scheme for plagiarism/code-reuse detection at corpus scale.
  *
  * Built ENTIRELY from codegen'd exprs (split/transform/slice/
  * array_min/array_distinct + the md5-prefix hash every fingerprint
  * family here uses) — no UDF, map-side until the final per-(doc,
  * fingerprint) explode, and the fingerprint table is what downstream
  * reuse-detection joins on (fingerprint-bucketed, never all-pairs). */
object Winnowing {

  /** 60-bit hash of a token k-gram — md5-prefix, the deterministic
    * cross-engine hash the fingerprint family standardizes on. */
  private def kgramHash(tokens: Column, i: Column, k: Int): Column =
    conv(substring(md5(concat_ws(" ",
      slice(tokens, i, lit(k)))), 1, 15), 16, 10).cast("long")

  /** One row per (id, fingerprint): the distinct window minima of the
    * k-gram hash sequence. Documents shorter than k tokens yield no
    * rows; shorter than k+w−1 yield the global minimum (one window).
    * Each stage lands in its own projection so the hash array is
    * computed ONCE per row — inlining `hashes` into every window's
    * slice would recompute each md5 w times. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
      k: Int, w: Int): DataFrame = {
    val tokens = filter(split(col(textCol), " "), t => length(t) > 0)
    // sequence(1, 0) in Spark is the DESCENDING [1, 0], not empty — a
    // doc under k tokens must short-circuit to an empty hash array
    val nGrams = size(col("_toks")) - (k - 1)
    df.select(col(idCol), tokens.as("_toks"))
      .select(col(idCol), when(nGrams <= 0, typedLit(Seq.empty[Long]))
        .otherwise(transform(sequence(lit(1), nGrams),
          i => kgramHash(col("_toks"), i, k))).as("_hashes"))
      .select(col(idCol), transform(
        sequence(lit(1), greatest(size(col("_hashes")) - (w - 1), lit(1))),
        i => array_min(slice(col("_hashes"), i, lit(w)))).as("_mins"))
      .select(col(idCol), explode(array_distinct(col("_mins"))).as("fingerprint"))
      // a doc shorter than k tokens has no k-grams: its single window
      // is empty and array_min yields null — drop, don't emit
      .filter(col("fingerprint").isNotNull)
  }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // winnowing over the real document text (k=3 tokens, w=4): the
    // oracle replays the ENTIRE pipeline — tokenize, 3-gram md5
    // hashes, sliding-window minima, distinct — in DuckDB list
    // algebra, so every fingerprint value is hash-compared. Receipts
    // per doc: fingerprint count and the count of fingerprints shared
    // with ANY other doc (the reuse-detection join, bucketed by
    // fingerprint — never all-pairs).
    QueryDef(
      "q310_winnowing_fingerprints",
      (s, dir) => {
        import s.implicits._
        val fps = Winnowing.fingerprints(
          Tables.load(s, dir, "documents"), "doc_id", "text", k = 3, w = 4)
        // rows are distinct per (doc, fingerprint), so a plain count
        // over the fingerprint partition IS the distinct-doc count —
        // one shuffle, and the md5 pipeline evaluates exactly once
        // (the groupBy+join-back alternative recomputes it twice)
        val withN = fps.withColumn("n_docs", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy($"fingerprint")))
        withN
          .groupBy($"doc_id")
          .agg(count(lit(1)).as("n_fingerprints"),
            sum(when($"n_docs" > 1, 1L).otherwise(0L)).as("n_shared"),
            min($"fingerprint").as("min_fp"))
          .orderBy($"doc_id")
      },
      Some("""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '),
                   t -> length(t) > 0) AS ts
          FROM documents),
        h AS (
          SELECT doc_id,
                 list_transform(
                   generate_series(1, greatest(len(ts) - 2, 0)),
                   i -> CAST(concat('0x', substring(md5(
                          array_to_string(ts[i:i+2], ' ')), 1, 15))
                        AS BIGINT)) AS hs
          FROM toks),
        fp AS (
          SELECT DISTINCT doc_id, unnest(
                 list_distinct(list_transform(
                   generate_series(1, greatest(len(hs) - 3, 1)),
                   i -> list_min(hs[i:i+3])))) AS fingerprint
          FROM h WHERE len(hs) > 0),
        sh AS (
          SELECT fingerprint, count(DISTINCT doc_id) AS n_docs
          FROM fp GROUP BY fingerprint)
        SELECT doc_id,
               count(*) AS n_fingerprints,
               CAST(sum(CASE WHEN sh.n_docs > 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_shared,
               min(fp.fingerprint) AS min_fp
        FROM fp JOIN sh USING (fingerprint)
        GROUP BY doc_id
        ORDER BY doc_id""")),

    // fingerprint-level decontamination: the n-gram decontamination
    // family (q103/q120) upgraded to winnowing — an eval doc is
    // contaminated when enough of its fingerprints appear ANYWHERE in
    // the training corpus. Every 97th doc becomes an eval item: even
    // ids verbatim copies (full containment), odd ids token-reversed
    // (only chance 3-gram overlap survives). The oracle replays BOTH
    // winnowing passes and the semi-join in DuckDB — chance overlaps
    // included, nothing assumed. Join is fingerprint-bucketed; the
    // train side reduces to DISTINCT fingerprints first.
    QueryDef(
      "q318_fingerprint_decontamination",
      (s, dir) => {
        import s.implicits._
        val train = Tables.load(s, dir, "documents")
        val eval0 = train.select($"doc_id", $"text")
          .filter($"doc_id" % 97 === 0)
          .fanout.as[(Long, String)]
          .map { case (id, text) =>
            val toks = text.split(" ").filter(_.nonEmpty)
            val etext =
              if (id % 2 == 0) toks.mkString(" ")
              else toks.reverse.mkString(" ")
            (id, etext)
          }
          .toDF("eval_id", "etext")
        val trainFps = Winnowing.fingerprints(train, "doc_id", "text", 3, 4)
          .select($"fingerprint").distinct()
        val evalFps = Winnowing.fingerprints(eval0, "eval_id", "etext", 3, 4)
        val shared = evalFps
          .join(trainFps, Seq("fingerprint"), "left_semi")
          .groupBy($"eval_id").agg(count(lit(1)).as("n_shared"))
        evalFps.groupBy($"eval_id").agg(count(lit(1)).as("n_fps"))
          .join(shared, Seq("eval_id"), "left_outer")
          .withColumn("n_shared", coalesce($"n_shared", lit(0L)))
          .withColumn("contaminated", $"n_shared" >= 5)
          .orderBy($"eval_id")
      },
      Some("""
        WITH ttoks AS (
          SELECT doc_id,
                 list_filter(string_split(text, ' '),
                   t -> length(t) > 0) AS ts
          FROM documents),
        eraw AS (
          SELECT doc_id AS eval_id,
                 CASE WHEN doc_id % 2 = 0 THEN ts
                      ELSE list_reverse(ts) END AS ts
          FROM ttoks WHERE doc_id % 97 = 0),
        th AS (
          SELECT doc_id, list_transform(
                   generate_series(1, greatest(len(ts) - 2, 0)),
                   i -> CAST(concat('0x', substring(md5(
                          array_to_string(ts[i:i+2], ' ')), 1, 15))
                        AS BIGINT)) AS hs
          FROM ttoks),
        eh AS (
          SELECT eval_id, list_transform(
                   generate_series(1, greatest(len(ts) - 2, 0)),
                   i -> CAST(concat('0x', substring(md5(
                          array_to_string(ts[i:i+2], ' ')), 1, 15))
                        AS BIGINT)) AS hs
          FROM eraw),
        tfp AS (
          SELECT DISTINCT unnest(
                 list_distinct(list_transform(
                   generate_series(1, greatest(len(hs) - 3, 1)),
                   i -> list_min(hs[i:i+3])))) AS fingerprint
          FROM th WHERE len(hs) > 0),
        efp AS (
          SELECT DISTINCT eval_id, unnest(
                 list_distinct(list_transform(
                   generate_series(1, greatest(len(hs) - 3, 1)),
                   i -> list_min(hs[i:i+3])))) AS fingerprint
          FROM eh WHERE len(hs) > 0),
        sh AS (
          SELECT eval_id, count(*) AS n_shared FROM efp
          WHERE fingerprint IN (SELECT fingerprint FROM tfp)
          GROUP BY eval_id),
        nf AS (SELECT eval_id, count(*) AS n_fps FROM efp GROUP BY eval_id)
        SELECT nf.eval_id, nf.n_fps,
               COALESCE(sh.n_shared, 0) AS n_shared,
               COALESCE(sh.n_shared, 0) >= 5 AS contaminated
        FROM nf LEFT JOIN sh USING (eval_id)
        ORDER BY eval_id""")))
}

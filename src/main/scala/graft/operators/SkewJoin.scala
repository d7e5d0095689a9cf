package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's runtime
  * skew splitting (enabled in GraftSession) isn't available or the skew
  * is known up front.
  *
  * The reference has no answer to skew at all: one hot key = one reducer
  * processing the whole group serially (its hash partitioner,
  * /root/reference/shuffler.py:71-77, sends every occurrence of a key to
  * one worker). Here the build side is exploded SALT ways and the probe
  * side picks a uniform salt, so a hot key's rows spread over SALT tasks.
  *
  * Cost model: replicates the RIGHT side SALT times — use when
  * |right| * SALT << |left partition skew|. At 100 TB with a hot fact key
  * and a dimension-ish right side this is the standard trade.
  */
object SkewJoin {

  /** Inner equi-join `left.leftKey == right.rightKey` with the left side's
    * skew spread over `salt` buckets.
    *
    * Two salting modes for the probe side:
    *  - default (`spreadIdentical = false`): salt = hash of the row's
    *    hashable column content — deterministic across task retries
    *    (re-executions are bit-identical). CAVEAT: rows that are
    *    bit-identical all land in one salt bucket, so a hot key whose rows
    *    are exact duplicates (dedup-less upstream ingestion) keeps its
    *    skew. Map-typed columns are excluded from the hash (xxhash64
    *    rejects them); if nothing hashable remains, falls through to the
    *    spreading salt.
    *  - `spreadIdentical = true`: mixes a per-partition row index (which
    *    also encodes the partition id) into the hash — breaks up even
    *    bit-identical duplicates, at the cost of retry nondeterminism
    *    (a re-executed task may assign different salts; join RESULTS are
    *    identical either way, only bucket placement varies). */
  def saltedInnerJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      salt: Int = 8, spreadIdentical: Boolean = false): DataFrame = {
    require(salt > 0)
    val hashable = left.schema.fields
      .filterNot(_.dataType.isInstanceOf[org.apache.spark.sql.types.MapType])
      .map(f => col(f.name)).toIndexedSeq
    // monotonically_increasing_id already encodes the partition id in its
    // upper bits, so it alone breaks up bit-identical rows
    val saltExpr =
      if (spreadIdentical || hashable.isEmpty)
        xxhash64(hashable :+ monotonically_increasing_id(): _*)
      else xxhash64(hashable: _*)
    val saltedLeft = left.withColumn("_salt", pmod(saltExpr, lit(salt.toLong)))
    // build side: replicate each row across every salt bucket
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salt - 1L))))
    saltedLeft
      .join(saltedRight,
        // keys qualified per side: with same-named key columns an
        // unqualified col() is ambiguous (AnalysisException) or worse
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }

  /** Key-distribution profile for deciding WHETHER to salt: the topK
    * hottest keys with absolute count, share of all rows, and skew factor
    * (count / mean-per-key). One partial-aggregated shuffle on the key +
    * a broadcast of two global scalars; the top-k is a TakeOrdered.
    * skew_x >> 1 on the head keys = salt (or rely on AQE skew split);
    * skew_x ~ 1 = leave the join alone. */
  /** Exact join-size accounting from per-side key histograms — the
    * "should this join be attempted, and how" planning input. |A ⋈ B| on
    * key k is exactly Σ_k cntA(k)·cntB(k); computing it from the two
    * histograms costs two partial-aggregated key shuffles (|keys| rows on
    * the wire, never data rows) instead of materializing the join — the
    * difference between a 5-minute stats job and an accidental 10^13-row
    * explosion at 100 TB. max_key_fanout is the skew headline: one key
    * contributing 10^9 output rows means salt it (saltedInnerJoin above)
    * or let AQE split it, BEFORE running the real join.
    *
    * At corpus scale the exact histograms swap for CMS sketches (q177's
    * machinery) with the same Σ product estimate — the shape (stats
    * first, join second) is the point. */
  def joinCardinality(left: DataFrame, leftKey: String,
      right: DataFrame, rightKey: String): DataFrame = {
    val lc = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("nl"))
    val rc = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("nr"))
    lc.join(rc, "k")
      .agg(
        sum(col("nl") * col("nr")).as("join_rows"),
        count(lit(1)).as("n_matching_keys"),
        max(col("nl") * col("nr")).as("max_key_fanout"))
  }

  def keySkewProfile(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame = {
    // per-key counts feed BOTH the global stats and the top-k: cache the
    // |keys|-sized frame (spills if huge) rather than scanning df twice;
    // the cache is adopted by the returned frame — Materialize.free
    // releases it, session hygiene (clearCache) catches the rest
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
      .cache()
    val stats = counts.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("nkeys"))
    graft.engine.Materialize.adopt(
      counts.crossJoin(broadcast(stats))
        .select(col("key"), col("cnt"),
          round(col("cnt") / col("total").cast("double"), 6).as("share"),
          round(col("cnt") * col("nkeys") / col("total").cast("double"), 4)
            .as("skew_x"))
        .orderBy(col("cnt").desc, col("key"))
        .limit(topK),
      Seq(counts))
  }

  // ------------------------------------------------------------------
  // fixture-bound oracle queries (q74/q106 live in Extras historically)
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // pre-join size accounting for orders ⋈ lineitem on orderkey; the
    // oracle computes the identical histogram product — which, the law
    // being exact, equals the true join cardinality
    QueryDef(
      "q206_join_cardinality",
      (s, dir) => joinCardinality(
        graft.engine.Tables.load(s, dir, "orders"), "o_orderkey",
        graft.engine.Tables.load(s, dir, "lineitem"), "l_orderkey"),
      Some("""
        WITH lc AS (SELECT o_orderkey AS k, count(*) AS nl
                    FROM orders GROUP BY o_orderkey),
             rc AS (SELECT l_orderkey AS k, count(*) AS nr
                    FROM lineitem GROUP BY l_orderkey)
        SELECT CAST(sum(nl * nr) AS BIGINT) AS join_rows,
               count(*) AS n_matching_keys,
               CAST(max(nl * nr) AS BIGINT) AS max_key_fanout
        FROM lc JOIN rc USING (k)"""))
  )
}

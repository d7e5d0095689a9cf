package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Rendezvous (highest-random-weight) sharding — deterministic shard
  * assignment with MINIMAL MOVEMENT under resize: when the shard count
  * grows from B to B+1, only ~1/(B+1) of keys move (each key moves
  * only if the NEW shard wins its rendezvous), versus `hash % B` where
  * nearly everything moves. That movement bound is what makes
  * resharding a 100 TB keyed store an incremental copy instead of a
  * full rewrite (Thaler & Ravishankar '96, public).
  *
  * The weight is md5-derived and computed with built-in codegen'd
  * functions only (md5/conv/transform/array_max) — no UDF, and the
  * whole assignment is a map-side projection: no shuffle at any size.
  */
object Sharding {

  /** Shard id in [0, nShards): argmax over shards of the md5-derived
    * weight of (key, shard). Built entirely from codegen'd exprs;
    * array_max on struct(h, shard) breaks the (practically impossible)
    * weight tie toward the higher shard deterministically. */
  def rendezvousShard(keyCol: Column, nShards: Int): Column = {
    require(nShards > 0)
    val weights = transform(
      sequence(lit(0), lit(nShards - 1)),
      b => struct(
        conv(substring(md5(concat(keyCol, lit("#"), b.cast("string"))),
          1, 15), 16, 10).cast("long").as("h"),
        b.as("shard")))
    array_max(weights).getField("shard")
  }

  /** Resize audit: old and new assignment per key plus the moved flag
    * — the receipt a reshard plan is sized from. */
  def resizeAudit(df: DataFrame, keyCol: Column, oldShards: Int,
      newShards: Int): DataFrame =
    df.withColumn("shard_old", rendezvousShard(keyCol, oldShards))
      .withColumn("shard_new", rendezvousShard(keyCol, newShards))
      .withColumn("moved", col("shard_old") =!= col("shard_new"))

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // rendezvous resize 8 -> 9 shards over document keys. The oracle
    // recomputes every weight with ITS OWN md5 and arg_max — a true
    // cross-engine referee of the whole assignment — and the hashed
    // moved flags pin the minimal-movement property key by key (keys
    // move only where shard 8 wins the new rendezvous).
    QueryDef(
      "q308_rendezvous_resharding",
      (s, dir) => {
        import s.implicits._
        val keys = Tables.load(s, dir, "documents")
          .select($"doc_id", concat(lit("k"), $"doc_id").as("key"))
        Sharding.resizeAudit(keys, $"key", oldShards = 8, newShards = 9)
          .select($"doc_id", $"shard_old".cast("long").as("shard_old"),
            $"shard_new".cast("long").as("shard_new"), $"moved")
          .orderBy($"doc_id")
      },
      Some("""
        WITH k AS (
          SELECT doc_id, 'k' || doc_id AS key FROM documents),
        a AS (
          SELECT doc_id, b,
                 CAST(concat('0x',
                   substring(md5(key || '#' || b), 1, 15)) AS BIGINT) AS h
          FROM k CROSS JOIN unnest(generate_series(0, 8)) AS t(b)),
        old AS (
          SELECT doc_id, arg_max(b, h) AS shard_old
          FROM a WHERE b < 8 GROUP BY doc_id),
        nw AS (
          SELECT doc_id, arg_max(b, h) AS shard_new
          FROM a GROUP BY doc_id)
        SELECT doc_id,
               CAST(shard_old AS BIGINT) AS shard_old,
               CAST(shard_new AS BIGINT) AS shard_new,
               shard_old <> shard_new AS moved
        FROM old JOIN nw USING (doc_id)
        ORDER BY doc_id""")))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Change-data / warehouse-maintenance operators: SCD2 attribute history
  * and snapshot reconciliation (diff). The reference's only story for
  * "what changed between two drops" is re-running a full map/reduce over
  * both and hand-merging (`/root/reference/README.txt:236-293` sketches
  * jobs as full-input passes); these are the declarative equivalents.
  *
  * Scale notes (100 TB posture):
  *  - scd2History is window-only, PARTITIONED BY KEY — no join, no
  *    global sort; parallelism is key-count wide. The daily-state
  *    pre-aggregation (max_by per (key, day)) is partial-aggregated
  *    map-side, so the shuffle carries at most one row per key-day.
  *  - snapshotDiff shuffles 24-byte (key, hash, null-mask) rows, NOT
  *    full records: each side is projected to xxhash64 of its
  *    compare-attrs plus a null-position bitmask before the full-outer
  *    join, so diffing two 100 TB snapshots moves ~2×|keys|×24 bytes.
  *    Hash equality within one engine is exact-input; a 2^-64 collision
  *    would misclassify a changed row as unchanged — the DuckDB oracle
  *    compares attributes directly (NULL-safely), so any such event (or
  *    a hash bug) surfaces as a gate mismatch rather than hiding.
  */
object ChangeData {

  /** SCD2 (slowly-changing-dimension type 2) history of one attribute:
    * collapse a transaction log to end-of-day states (last write per key
    * per day wins, by `tiebreak` desc), keep only rows where the value
    * changed vs the previous day-state, and emit validity intervals
    * [valid_from, valid_to) with `valid_to` NULL on the current row. */
  def scd2History(log: DataFrame, key: Column, day: Column, value: Column,
      tiebreak: Column): DataFrame = {
    val s = log.sparkSession
    import s.implicits._
    val daily = log
      .groupBy(key.as("k"), day.as("day"))
      .agg(max_by(value, tiebreak).as("value"))
    val wDay = Window.partitionBy($"k").orderBy($"day")
    val changes = daily
      .withColumn("_prev", lag($"value", 1).over(wDay))
      .filter($"_prev".isNull || $"_prev" =!= $"value")
      .select($"k", $"value", $"day".as("valid_from"))
    val wFrom = Window.partitionBy($"k").orderBy($"valid_from")
    changes
      .withColumn("valid_to", lead($"valid_from", 1).over(wFrom))
      .withColumn("is_current", $"valid_to".isNull)
  }

  /** Snapshot reconciliation: classify every key across two snapshots as
    * added / removed / changed / unchanged and return per-class counts
    * with key bounds. Sides are reduced to (key, attr-hash, null-mask)
    * before the join — the only full-width scan is the local projection.
    *
    * Equality is NULL-SAFE per attribute (the IS NOT DISTINCT FROM
    * contract): xxhash64 skips NULL children, so the hash alone would
    * call (NULL,'a') vs ('a',NULL) — and any other null-position
    * rearrangement — unchanged. A null-position bitmask (one bit per
    * attr, codegen'd, no serialization) travels with the hash; rows are
    * unchanged only when both agree. NULL vs NULL in the same position
    * compares unchanged, matching IS NOT DISTINCT FROM. */
  def snapshotDiff(a: DataFrame, b: DataFrame, key: String,
      attrs: Seq[String]): DataFrame = {
    require(attrs.nonEmpty && attrs.size <= 63,
      s"1..63 compare attrs (got ${attrs.size}: one bit per attr)")
    val s = a.sparkSession
    import s.implicits._
    val nullMask = attrs.zipWithIndex.map { case (c, i) =>
      when(col(c).isNull, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    def hashed(df: DataFrame, h: String) =
      df.select(col(key), xxhash64(attrs.map(col): _*).as(h),
        nullMask.as(s"${h}_m"))
    hashed(a, "_ha").join(hashed(b, "_hb"), Seq(key), "full_outer")
      .withColumn("change_type",
        when($"_hb".isNull, "removed")
          .when($"_ha".isNull, "added")
          .when($"_ha" === $"_hb" && $"_ha_m" === $"_hb_m", "unchanged")
          .otherwise("changed"))
      .groupBy($"change_type")
      .agg(count(lit(1)).as("n"),
        min(col(key)).as("min_key"), max(col(key)).as("max_key"))
  }

  /** CDC MERGE (upsert): apply a change log to a keyed snapshot and
    * return the next snapshot. The log carries full row images — the
    * snapshot's columns plus `seqCol` (change ordering) and `opCol`
    * ('U' upsert / 'D' delete). Last op per key wins (by seq); semantics
    * follow ANSI MERGE: 'D' matched → delete, 'U' matched → update
    * (change image replaces the row), 'U' not matched → insert,
    * 'D' not matched → no-op, key untouched by the log → keep.
    * `seqCol` must be unique per key (CDC offsets/LSNs are): ties make
    * the winning image nondeterministic.
    *
    * Scale: the log is first reduced to ONE row per key with a map-side-
    * combined max_by, so the wire carries |distinct changed keys| rows
    * for the reduction plus the keyed full-outer join — both hash-
    * partitioned on the same key, one Exchange each side, and AQE plans
    * the join side broadcast when the reduced changeset is small (the
    * common CDC case). Unmatched snapshot rows stream through the join;
    * nothing is rewritten driver-side. */
  def mergeUpsert(snapshot: DataFrame, changes: DataFrame, key: String,
      seqCol: String, opCol: String): DataFrame = {
    val valCols = snapshot.columns.filterNot(_ == key)
    require(valCols.forall(changes.columns.contains),
      "changes must carry full row images (all snapshot columns)")
    val latest = changes
      .groupBy(col(key))
      .agg(max_by(col(opCol), col(seqCol)).as("_op"),
        max_by(struct(valCols.map(col): _*), col(seqCol)).as("_new"))
    // 'D' rows drop whether matched (delete) or not (no-op on a missing
    // key — the full-outer's all-NULL snapshot side must not survive)
    val merged = snapshot.join(latest, Seq(key), "full_outer")
      .filter(col("_op").isNull || col("_op") === "U")
    val applied = valCols.foldLeft(merged) { (df, c) =>
      df.withColumn(c,
        when(col("_op") === "U", col("_new")(c)).otherwise(col(c)))
    }
    applied.drop("_op", "_new")
  }

  /** Snapshot-to-CDC: derive the MINIMAL op log that transforms `oldS`
    * into `newS` — the inverse of [[mergeUpsert]], for systems that only
    * hand over full snapshots (nightly dumps, vendor feeds) but whose
    * consumers want deltas. Emits one row per changed key: 'I' (new only,
    * new image), 'D' (old only, old image), 'U' (both, differing, new
    * image); unchanged keys emit nothing. Law, pinned by the spec:
    * applying the feed with [[mergeUpsert]] (whose ANSI-MERGE op
    * vocabulary folds I into U — upsert subsumes insert) reproduces
    * `newS` exactly, and re-deriving a feed afterwards finds nothing.
    *
    * Attribute equality is null-safe field-wise (struct comparisons in
    * Spark are ordering-based, so nested NULL == NULL holds — same
    * contract snapshotDiff's hash+mask implements, here on the exact
    * values because the diff must carry images anyway).
    *
    * Scale: sides reduce to (key, attr-struct) projections into ONE
    * keyed full-outer join — same shape and cost as mergeUpsert itself;
    * output is |changed keys| rows, typically tiny vs the snapshots. */
  def changeFeed(oldS: DataFrame, newS: DataFrame, key: String): DataFrame = {
    val valCols = oldS.columns.filterNot(_ == key)
    require(newS.columns.sorted.sameElements(oldS.columns.sorted),
      "snapshots must share a schema")
    val o = oldS.select(col(key), struct(valCols.map(col): _*).as("_o"))
    val n = newS.select(col(key), struct(valCols.map(col): _*).as("_n"))
    val classified = o.join(n, Seq(key), "full_outer")
      .withColumn("op",
        when(col("_o").isNull, "I")
          .when(col("_n").isNull, "D")
          .when(!(col("_o") <=> col("_n")), "U"))
      .filter(col("op").isNotNull)
      .withColumn("_img",
        when(col("op") === "D", col("_o")).otherwise(col("_n")))
    classified.select(
      col(key) +: col("op") +: valCols.map(c => col("_img")(c).as(c)): _*)
  }

  /** Temporal (effective-dated) dimension join: attach to each fact the
    * dim attribute that was valid on the fact's date — the consumption
    * side of scd2History's [valid_from, valid_to) intervals. Because
    * intervals are non-overlapping per key, each fact matches at most
    * one dim row.
    *
    * Scale: ONE equi-join hash-partitioned on the key; the validity
    * predicate prunes the per-key fan (bounded by the key's interval
    * count, i.e. its change count — never |dim|). No windows over
    * facts, no broadcast of an SF-scaled side forced (AQE decides). */
  def temporalJoin(facts: DataFrame, factKey: Column, factDate: Column,
      dim: DataFrame): DataFrame =
    facts.join(dim,
      factKey === dim("k") && factDate >= dim("valid_from") &&
        (dim("valid_to").isNull || factDate < dim("valid_to")))

  // ------------------------------------------------------------------
  // fixture-bound oracle queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // each order joined to its customer's effective priority interval:
    // build the SCD2 history from the order log, then consume it
    // temporally — orders mid-history land on interior intervals
    QueryDef(
      "q201_temporal_dim_join",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val dim = scd2History(o, col("o_custkey"),
          to_date(col("o_orderdate")), col("o_orderpriority"),
          col("o_orderkey"))
        temporalJoin(
          o.select(col("o_orderkey"), col("o_custkey"),
            to_date(col("o_orderdate")).as("od")),
          col("o_custkey"), col("od"), dim)
          .select(col("o_orderkey"), col("o_custkey"), col("od"),
            col("value").as("eff_priority"), col("valid_from"))
          .orderBy(col("o_orderkey"))
      },
      Some("""
        WITH d AS (
          SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
                 max_by(o_orderpriority, o_orderkey) AS priority
          FROM orders GROUP BY o_custkey, day),
        c AS (
          SELECT o_custkey, day, priority,
                 lag(priority) OVER (PARTITION BY o_custkey ORDER BY day)
                   AS prev_p
          FROM d),
        h AS (
          SELECT o_custkey, priority, day AS valid_from
          FROM c WHERE prev_p IS NULL OR prev_p <> priority),
        dim AS (
          SELECT o_custkey AS k, priority, valid_from,
                 lead(valid_from) OVER (PARTITION BY o_custkey
                   ORDER BY valid_from) AS valid_to
          FROM h)
        SELECT o.o_orderkey, o.o_custkey,
               CAST(o.o_orderdate AS DATE) AS od,
               dim.priority AS eff_priority, dim.valid_from
        FROM orders o
        JOIN dim ON o.o_custkey = dim.k
                AND CAST(o.o_orderdate AS DATE) >= dim.valid_from
                AND (dim.valid_to IS NULL
                     OR CAST(o.o_orderdate AS DATE) < dim.valid_to)
        ORDER BY o.o_orderkey""")),

    // the orders table read as a CDC stream over the customer snapshot:
    // every order is a full-image upsert of its customer (re-segmented,
    // balance = order total), some keys are deletes, and keys shifted
    // past the customer range exercise the insert path
    QueryDef(
      "q191_merge_upsert",
      (s, dir) => {
        val snap = Tables.load(s, dir, "customer")
          .select(col("c_custkey"), col("c_mktsegment"),
            round(col("c_acctbal"), 2).as("bal"))
        val ch = Tables.load(s, dir, "orders").select(
          when(col("o_orderkey") % 13 === 0, col("o_custkey") + 100000)
            .otherwise(col("o_custkey")).as("c_custkey"),
          col("o_orderkey").as("seq"),
          when(col("o_orderkey") % 17 === 0, lit("D")).otherwise(lit("U"))
            .as("op"),
          concat(lit("SEG-"), col("o_orderstatus")).as("c_mktsegment"),
          round(col("o_totalprice"), 2).as("bal"))
        mergeUpsert(snap, ch, "c_custkey", "seq", "op")
          .orderBy(col("c_custkey"))
      },
      Some("""
        WITH snap AS (
          SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS bal
          FROM customer),
        ch AS (
          SELECT CASE WHEN o_orderkey % 13 = 0 THEN o_custkey + 100000
                      ELSE o_custkey END AS c_custkey,
                 o_orderkey AS seq,
                 CASE WHEN o_orderkey % 17 = 0 THEN 'D' ELSE 'U' END AS op,
                 'SEG-' || o_orderstatus AS c_mktsegment,
                 round(o_totalprice, 2) AS bal
          FROM orders),
        latest AS (
          SELECT c_custkey, max_by(op, seq) AS op,
                 max_by(ch.c_mktsegment, seq) AS seg,
                 max_by(ch.bal, seq) AS nbal
          FROM ch GROUP BY c_custkey)
        SELECT coalesce(s.c_custkey, l.c_custkey) AS c_custkey,
               CASE WHEN l.op = 'U' THEN l.seg
                    ELSE s.c_mktsegment END AS c_mktsegment,
               CASE WHEN l.op = 'U' THEN l.nbal ELSE s.bal END AS bal
        FROM snap s FULL OUTER JOIN latest l ON s.c_custkey = l.c_custkey
        WHERE l.op IS NULL OR l.op = 'U'
        ORDER BY c_custkey""")),

    // order-priority history per customer: the orders table read as a
    // transaction log over the customer dimension
    QueryDef(
      "q172_scd2_history",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        scd2History(o, col("o_custkey"), to_date(col("o_orderdate")),
          col("o_orderpriority"), col("o_orderkey"))
          .select(col("k").as("o_custkey"), col("value").as("priority"),
            col("valid_from"), col("valid_to"), col("is_current"))
          .orderBy(col("o_custkey"), col("valid_from"))
      },
      Some("""
        WITH d AS (
          SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
                 max_by(o_orderpriority, o_orderkey) AS priority
          FROM orders GROUP BY o_custkey, day),
        c AS (
          SELECT o_custkey, day, priority,
                 lag(priority) OVER (PARTITION BY o_custkey ORDER BY day)
                   AS prev_p
          FROM d),
        h AS (
          SELECT o_custkey, priority, day AS valid_from
          FROM c WHERE prev_p IS NULL OR prev_p <> priority)
        SELECT o_custkey, priority, valid_from,
               lead(valid_from) OVER (PARTITION BY o_custkey
                 ORDER BY valid_from) AS valid_to,
               lead(valid_from) OVER (PARTITION BY o_custkey
                 ORDER BY valid_from) IS NULL AS is_current
        FROM h
        ORDER BY o_custkey, valid_from""")),

    // two simulated drops of the orders table: an older extract vs a
    // newer one whose open orders were re-prioritized upstream
    QueryDef(
      "q173_snapshot_diff",
      (s, dir) => {
        val o = Tables.load(s, dir, "orders")
        val snapA = o
          .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        val snapB = o
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
          .withColumn("o_orderpriority",
            when(col("o_orderstatus") === "O", lit("1-URGENT"))
              .otherwise(col("o_orderpriority")))
        snapshotDiff(snapA, snapB, "o_orderkey",
          Seq("o_orderstatus", "o_orderpriority", "o_totalprice"))
          .orderBy(col("change_type"))
      },
      Some("""
        WITH a AS (
          SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
          FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01'),
        b AS (
          SELECT o_orderkey, o_orderstatus,
                 CASE WHEN o_orderstatus = 'O' THEN '1-URGENT'
                      ELSE o_orderpriority END AS o_orderpriority,
                 o_totalprice
          FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'),
        j AS (
          SELECT coalesce(a.o_orderkey, b.o_orderkey) AS k,
                 CASE WHEN b.o_orderkey IS NULL THEN 'removed'
                      WHEN a.o_orderkey IS NULL THEN 'added'
                      WHEN a.o_orderstatus IS NOT DISTINCT FROM b.o_orderstatus
                           AND a.o_orderpriority IS NOT DISTINCT FROM b.o_orderpriority
                           AND a.o_totalprice IS NOT DISTINCT FROM b.o_totalprice
                        THEN 'unchanged'
                      ELSE 'changed' END AS change_type
          FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey)
        SELECT change_type, count(*) AS n,
               min(k) AS min_key, max(k) AS max_key
        FROM j GROUP BY change_type
        ORDER BY change_type""")),

    // snapshot-to-CDC: a deterministic mutation of the customer table
    // (mod-11 deletes, mod-7 balance bumps, mod-13 synthetic inserts)
    // plays the "tomorrow's dump" role; the feed must name exactly the
    // changed keys with the right op and image
    QueryDef(
      "q209_change_feed",
      (s, dir) => {
        import s.implicits._
        val base = Tables.load(s, dir, "customer")
          .select($"c_custkey", $"c_acctbal", $"c_mktsegment")
        val next = base.filter($"c_custkey" % 11 =!= 0)
          .withColumn("c_acctbal",
            when($"c_custkey" % 7 === 0, $"c_acctbal" + 100.0)
              .otherwise($"c_acctbal"))
          .unionByName(base.filter($"c_custkey" % 13 === 0)
            .select(($"c_custkey" + 1000000L).as("c_custkey"),
              lit(0.0).as("c_acctbal"), lit("NEW").as("c_mktsegment")))
        changeFeed(base, next, "c_custkey")
          .orderBy($"c_custkey", $"op")
      },
      Some("""
        WITH old AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
        new AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 100.0
                      ELSE c_acctbal END AS c_acctbal,
                 c_mktsegment
          FROM customer WHERE c_custkey % 11 <> 0
          UNION ALL
          SELECT c_custkey + 1000000, 0.0, 'NEW'
          FROM customer WHERE c_custkey % 13 = 0)
        SELECT coalesce(o.c_custkey, n.c_custkey) AS c_custkey,
               CASE WHEN o.c_custkey IS NULL THEN 'I'
                    WHEN n.c_custkey IS NULL THEN 'D'
                    ELSE 'U' END AS op,
               CASE WHEN n.c_custkey IS NULL THEN o.c_acctbal
                    ELSE n.c_acctbal END AS c_acctbal,
               CASE WHEN n.c_custkey IS NULL THEN o.c_mktsegment
                    ELSE n.c_mktsegment END AS c_mktsegment
        FROM old o FULL OUTER JOIN new n ON o.c_custkey = n.c_custkey
        WHERE o.c_custkey IS NULL OR n.c_custkey IS NULL
           OR o.c_acctbal IS DISTINCT FROM n.c_acctbal
           OR o.c_mktsegment IS DISTINCT FROM n.c_mktsegment
        ORDER BY c_custkey, op"""))
  )
}

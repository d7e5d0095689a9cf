package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** File-level data skipping — the lakehouse scan-reduction mechanism
  * (Delta/Iceberg lineage, public): cluster rows into file groups at
  * write time, collect a per-group stats MANIFEST (min/max/count of the
  * clustering column; optionally a hash-membership index over ANY other
  * column), and answer range/point queries by consulting the manifest
  * FIRST — only the intersecting groups' files are ever opened.
  *
  * The 100 TB posture:
  *
  *  - the manifest is the METADATA plane: one row per file group
  *    (thousands of rows for a petabyte table), so collecting the
  *    surviving group list at the driver is bounded by layout, not by
  *    data — the same contract as a table format's transaction log.
  *  - the stats pass is one scan at indexing time (incremental per new
  *    file in production); every subsequent query pays only for the
  *    groups it cannot prove empty.
  *  - min/max prunes predicates on the CLUSTERING column (ingest order,
  *    time, a Z-value); the hash-membership manifest prunes point
  *    lookups on NON-clustered columns — the "bloom index" that rescues
  *    the query the layout wasn't designed for. False positives cost a
  *    group read; the residual filter keeps results exact.
  *  - complements [[ZOrder]]: Z-ordering makes the min/max boxes tight;
  *    this module is the machinery that exploits them.
  */
object DataSkipping {

  /** Write `df` clustered into file groups: `fg = floor(clusterCol /
    * span)`, one directory per group (`fg=N`; NOT underscore-prefixed —
    * Hadoop listing hides `_`-led paths). Ingest-ordered keys land in
    * ingest-ordered groups, the layout every log/CDC table has for
    * free. Overwrites idempotently. */
  def writeClustered(df: DataFrame, clusterCol: Column, span: Long,
      outDir: String): Unit = {
    require(span >= 1, "span must be positive")
    val grouped = df.withColumn("fg", floor(clusterCol / span))
    grouped
      .repartition(col("fg"))
      .write.mode("overwrite").partitionBy("fg").parquet(outDir)
  }

  /** The indexing pass: per-group (fg, n_rows, mn, mx) stats over the
    * stats column — one scan of the written layout, incremental per
    * new group in production. */
  def statsManifest(spark: SparkSession, dataDir: String,
      statsCol: String): DataFrame =
    spark.read.parquet(dataDir)
      .groupBy(col("fg"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(statsCol)).as("mn"), max(col(statsCol)).as("mx"))

  /** Hash-membership manifest over ANY column (the bloom-index shape):
    * the DISTINCT (fg, bucket) pairs with bucket = mix32(col) mod
    * `buckets`. A point probe keeps only groups holding its bucket;
    * occupancy bounds the false-positive rate. Deterministic — the
    * same [[Maintenance.mix32]] integer mix both engines replay. */
  def membershipManifest(spark: SparkSession, dataDir: String,
      column: String, buckets: Int): DataFrame = {
    require(buckets >= 2, "need buckets >= 2")
    spark.read.parquet(dataDir)
      .select(col("fg"), (Maintenance.mix32(col(column)) % buckets).as("bkt"))
      .distinct()
  }

  /** Range scan through the stats manifest: keep groups whose [mn, mx]
    * intersects [lo, hi], open ONLY their directories, and apply the
    * exact residual filter. Returns (rows, nGroupsScanned,
    * nGroupsTotal) — the scan-reduction receipt. The collect is the
    * manifest (metadata plane), never data. */
  def skippingRangeScan(spark: SparkSession, manifest: DataFrame,
      dataDir: String, statsCol: String, lo: Long,
      hi: Long): (DataFrame, Long, Long) = {
    val picked = manifest
      .select(col("fg").cast("long"), col("mn").cast("long"),
        col("mx").cast("long"))
      .collect()
    val total = picked.length.toLong
    val selected = picked.filter(r => r.getLong(2) >= lo && r.getLong(1) <= hi)
      .map(_.getLong(0)).sorted
    val rows =
      if (selected.isEmpty) {
        // typed empty frame: no group can contain the range
        spark.read.parquet(dataDir).filter(lit(false)).drop("fg")
      } else {
        spark.read.parquet(selected.map(g => s"$dataDir/fg=$g"): _*)
          .filter(col(statsCol).between(lo, hi))
      }
    (rows, selected.length.toLong, total)
  }

  /** Point lookup through the membership manifest: keep groups holding
    * the probe's hash bucket (collisions read one extra group, the
    * residual equality keeps results exact). nGroupsTotal comes from
    * the directory layout, not the membership rows — an empty-bucket
    * group still exists. */
  def membershipPointScan(spark: SparkSession, membership: DataFrame,
      dataDir: String, column: String, probe: Long, buckets: Int,
      nGroupsTotal: Long): (DataFrame, Long) = {
    val probeBkt = {
      // mirror mix32 on a literal, driver-side
      val h1 = (probe * 2654435761L) % 4294967296L
      val x = h1 ^ (h1 >> 16)
      val h2 = (x * 40503L) % 4294967296L
      (h2 ^ (h2 >> 13)) % buckets
    }
    val selected = membership.filter(col("bkt") === probeBkt)
      .select(col("fg").cast("long")).distinct().collect()
      .map(_.getLong(0)).sorted
    val rows =
      if (selected.isEmpty)
        spark.read.parquet(dataDir).filter(lit(false)).drop("fg")
      else
        spark.read.parquet(selected.map(g => s"$dataDir/fg=$g"): _*)
          .filter(col(column) === probe)
    (rows, selected.length.toLong)
  }

  // ------------------------------------------------------------------
  // fixture-bound oracle queries
  // ------------------------------------------------------------------

  private def scratch(dir: String, tag: String): String =
    new java.io.File(graft.engine.GraftSession.scratchRoot,
      s"${tag}_${Integer.toHexString(dir.hashCode)}").getAbsolutePath

  val defs: Seq[QueryDef] = Seq(

    // the full skipping cycle in one query: cluster orders into
    // orderkey file groups, collect the min/max manifest from the
    // written layout, answer a key-range aggregate opening ONLY the
    // intersecting groups, and emit the scan receipt. The oracle
    // replays the aggregate from the raw table AND the group
    // arithmetic (groups are floor(key/4000), so per-group min/max —
    // and therefore the pruning decision — is pure SQL); a scan that
    // read the wrong groups changes n_groups_scanned, a broken
    // residual changes the aggregate.
    QueryDef(
      "q265_stats_manifest_skipping_scan",
      (s, dir) => {
        val out = scratch(dir, "skip_q265")
        val orders = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority"),
            col("o_totalprice"))
        writeClustered(orders, col("o_orderkey"), span = 4000L, out)
        val manifest = statsManifest(s, out, "o_orderkey")
        val (rows, nSel, nTot) =
          skippingRangeScan(s, manifest, out, "o_orderkey", 10000L, 13999L)
        rows.groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n_orders"),
            round(sum(col("o_totalprice")), 4).as("total_price"))
          .withColumn("n_groups_scanned", lit(nSel))
          .withColumn("n_groups_total", lit(nTot))
          .orderBy(col("o_orderpriority"))
      },
      Some("""
        WITH fg AS (SELECT o_orderkey // 4000 AS g,
                           min(o_orderkey) AS mn, max(o_orderkey) AS mx
                    FROM orders GROUP BY 1),
        sel AS (SELECT CAST(count(*) AS BIGINT) AS ns FROM fg
                WHERE mx >= 10000 AND mn <= 13999),
        tot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM fg)
        SELECT o_orderpriority,
               count(*) AS n_orders,
               round(sum(o_totalprice), 4) AS total_price,
               (SELECT ns FROM sel) AS n_groups_scanned,
               (SELECT nt FROM tot) AS n_groups_total
        FROM orders
        WHERE o_orderkey BETWEEN 10000 AND 13999
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority""")),

    // the bloom-index shape: the layout is clustered by ORDERKEY, but
    // the lookup is by CUSTKEY — min/max cannot help a non-clustered
    // column, the hash-membership manifest can. The oracle replays
    // the mix hash in integer SQL to reproduce the exact candidate
    // group count (false positives included) and the exact lookup
    // result after the residual filter.
    QueryDef(
      "q266_membership_manifest_point_lookup",
      (s, dir) => {
        val out = scratch(dir, "skip_q266")
        val orders = Tables.load(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        // finer groups than q265: a membership index prunes by CONTENT,
        // so its win is bounded by per-group value locality — ~500
        // orders per group keeps bucket occupancy (= false-positive
        // rate) near 10% at every scale factor
        writeClustered(orders, col("o_orderkey"), span = 500L, out)
        val membership = membershipManifest(s, out, "o_custkey", 4096)
        val nTot = s.read.parquet(out).select(col("fg")).distinct().count()
        val (rows, nSel) = membershipPointScan(s, membership, out,
          "o_custkey", probe = 371L, buckets = 4096, nGroupsTotal = nTot)
        rows.agg(count(lit(1)).as("n_orders"),
          coalesce(round(sum(col("o_totalprice")), 4), lit(0.0d))
            .as("total_price"))
          .withColumn("o_custkey", lit(371L))
          .withColumn("n_groups_scanned", lit(nSel))
          .withColumn("n_groups_total", lit(nTot))
          .select(col("o_custkey"), col("n_orders"), col("total_price"),
            col("n_groups_scanned"), col("n_groups_total"))
      },
      Some("""
        WITH m AS (SELECT DISTINCT o_orderkey // 500 AS g,
                          xor((xor((o_custkey * 2654435761) % 4294967296,
                                   ((o_custkey * 2654435761) % 4294967296)
                                     // 65536) * 40503) % 4294967296,
                              ((xor((o_custkey * 2654435761) % 4294967296,
                                    ((o_custkey * 2654435761) % 4294967296)
                                      // 65536) * 40503) % 4294967296)
                                // 8192) % 4096 AS bkt
                   FROM orders),
        pb AS (SELECT xor((xor((371 * 2654435761) % 4294967296,
                               ((371 * 2654435761) % 4294967296)
                                 // 65536) * 40503) % 4294967296,
                          ((xor((371 * 2654435761) % 4294967296,
                                ((371 * 2654435761) % 4294967296)
                                  // 65536) * 40503) % 4294967296)
                            // 8192) % 4096 AS b),
        sel AS (SELECT CAST(count(DISTINCT g) AS BIGINT) AS ns
                FROM m, pb WHERE m.bkt = pb.b),
        tot AS (SELECT CAST(count(DISTINCT o_orderkey // 500) AS BIGINT)
                  AS nt FROM orders)
        SELECT CAST(371 AS BIGINT) AS o_custkey,
               count(*) AS n_orders,
               COALESCE(round(sum(o_totalprice), 4), 0.0) AS total_price,
               (SELECT ns FROM sel) AS n_groups_scanned,
               (SELECT nt FROM tot) AS n_groups_total
        FROM orders
        WHERE o_custkey = 371"""))
  )
}

package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-generated fixture tables (TESTDATA.md /
  * FIXTURES.md). Parquet at rest — columnar scan + predicate pushdown +
  * column pruning come free, vs the reference's row-at-a-time JSON lines
  * (/root/reference/shuffler.py:75-76).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    normalizeEventTime(spark.read.parquet(s"$sfDir/$name.parquet"),
      // the nanos-as-long coercion is events-specific knowledge: a plain
      // long `ts` on some future table (epoch seconds, a sequence id)
      // must NOT be silently divided and retyped
      nanosLong = name == "events")

  /** Load-time contract: `ts` is ALWAYS `TimestampType` (UTC session
    * micros) after load, whatever shape the fixture parquet ships in.
    * The driver has regenerated events.parquet with different physical
    * encodings across rounds; each shape gets a branch here so a fixture
    * change is a non-event for the 30+ event-time operators downstream:
    *  - TIMESTAMP(NANOS): no native Spark type; sessions set
    *    spark.sql.legacy.parquet.nanosAsLong, so it arrives as a long we
    *    truncate to micros (integer div — going through double would lose
    *    precision on ~1.7e18 nanos).
    *  - isAdjustedToUTC=false micros (TIMESTAMP_NTZ when inference is on,
    *    e.g. a session not built by GraftSession): cast to TimestampType.
    *    The session time zone is pinned UTC, so the naive micros map 1:1
    *    onto epoch micros — value-preserving and oracle-parity-safe
    *    (DuckDB reads the same column as a naive timestamp).
    *  - TimestampType already: pass through. */
  def normalizeEventTime(df: DataFrame,
      nanosLong: Boolean = true): DataFrame =
    df.schema.fields.find(_.name == "ts").map(_.dataType) match {
      case Some(LongType) if nanosLong =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case Some(TimestampNTZType) =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }

  /** Multi-dir scan — the reference's `input_dirs` list is an implicit
    * UNION ALL (/root/reference/mapper.py:75-85); Spark's multi-path read
    * is the same thing with split planning + locality built in. */
  def loadMulti(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)

  /** Scale-adaptive scan fan-out for CPU-heavy map stages (per-blob
    * decode, per-shingle hashing): the optimization guide's fix for
    * unsplittable input ("one huge unsplittable file ... repartition
    * immediately after the read", §2.5). The fixture tables are
    * single-file single-ROW-GROUP parquet, so every scan plans as ONE
    * task no matter how many cores the session has — a 3 s JPEG-decode
    * pass then serializes on one core while 31 idle.
    *
    * Fires ONLY when (a) the frame is a narrow scan pipeline (leaf +
    * Filter/Project — anything with a shuffle below is already
    * parallel), and (b) the planned scan parallelism is below the
    * session default. At production scale (many files / row groups) the
    * scan plans >= cores partitions and this is a structural no-op, so
    * nothing here is tuned to local[32]; the target tracks
    * `defaultParallelism`, which the driver varies via
    * SPARK_GRAFT_CPUS. Round-robin (not keyed): perfectly balanced for
    * uniform per-row work, and deterministic under retry via Spark's
    * sort-before-repartition. Streaming frames pass through untouched
    * (`.rdd` is illegal on them; the micro-batch planner parallelizes
    * its own scans). */
  def fanout(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical._
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    def leafOf(p: LogicalPlan): Option[LeafNode] = p match {
      case l: LeafNode => Some(l)
      case p: Project => leafOf(p.child)
      case f: Filter => leafOf(f.child)
      case a: SubqueryAlias => leafOf(a.child)
      case _ => None // a shuffle below means it is already parallel
    }
    if (df.isStreaming) return df
    leafOf(df.queryExecution.analyzed) match {
      case None => df
      case Some(leaf) =>
        val spark = df.sparkSession
        val target = spark.sparkContext.defaultParallelism
        // planned scan parallelism, without paying a physical-planning
        // pass per call (fanout sits inside timed query construction):
        // for file relations, replicate FilePartition's split math from
        // the file listing; anything else falls back to .rdd (narrow ->
        // no AQE wrapper -> pure planning, nothing executes)
        val scanParts = leaf match {
          case LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
              if fs.fileFormat.isInstanceOf[
                org.apache.spark.sql.execution.datasources
                  .parquet.ParquetFileFormat] =>
            // parquet only: the split math below assumes splittable
            // files (a one-file gzip/binaryFile scan is 1 task no
            // matter its size — those fall through to .rdd). The
            // unfiltered listing can only OVER-estimate parallelism
            // for partition-pruned reads, i.e. skip a fanout, never
            // mis-fan one.
            val maxSplit = spark.sessionState.conf.filesMaxPartitionBytes
            val openCost = spark.sessionState.conf.filesOpenCostInBytes
            val sizes = fs.location.listFiles(Nil, Nil)
              .flatMap(_.files).map(_.getLen)
            val total = sizes.map(_ + openCost).sum
            // floor of 1 byte: openCost can legitimately be tuned to 0,
            // which must not turn the per-file ceil below into a /0
            val targetSplit = math.max(1L, math.max(openCost,
              math.min(maxSplit, total / math.max(1, target))))
            // files don't straddle splits: each contributes at least one
            math.max(sizes.count(_ > 0),
              sizes.map(s => (s + targetSplit - 1) / targetSplit).sum).toInt
          case _ => df.rdd.getNumPartitions
        }
        if (scanParts >= target) df else df.repartition(target)
    }
  }
}

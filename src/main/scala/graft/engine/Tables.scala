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
}

package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated fixture tables (TESTDATA.md /
  * FIXTURES.md). Parquet at rest — columnar scan + predicate pushdown +
  * column pruning come free, vs the reference's row-at-a-time JSON lines
  * (/root/reference/shuffler.py:75-76).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$sfDir/$name.parquet")
    // events.ts is written as parquet TIMESTAMP(NANOS), which Spark has no
    // native type for; sessions set spark.sql.legacy.parquet.nanosAsLong,
    // so it arrives as a long we truncate to microseconds (integer div —
    // going through double would lose precision on ~1.7e18 nanos).
    df.schema.fields.find(f => f.name == "ts" && f.dataType == LongType) match {
      case Some(_) if name == "events" =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => df
    }
  }

  /** Multi-dir scan — the reference's `input_dirs` list is an implicit
    * UNION ALL (/root/reference/mapper.py:75-85); Spark's multi-path read
    * is the same thing with split planning + locality built in. */
  def loadMulti(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)
}

package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}

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
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Multi-dir scan — the reference's `input_dirs` list is an implicit
    * UNION ALL (/root/reference/mapper.py:75-85); Spark's multi-path read
    * is the same thing with split planning + locality built in. */
  def loadMulti(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.parquet(paths: _*)
}

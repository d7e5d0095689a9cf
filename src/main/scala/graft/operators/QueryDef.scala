package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator/query exposed through SparkEntry.
  *
  * @param name   stable key (shows up in CORRECTNESS_r{N}.json / BENCH)
  * @param run    the Spark-native implementation; receives the sf dir
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet
  *               tables (bare table names). None → driver records a
  *               weaker rows-only check (for ops SQL can't express).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  /** Aggregate a module list into the SparkEntry maps. */
  def toQueries(defs: Seq[QueryDef]): Map[String, (SparkSession, String) => DataFrame] =
    defs.map(d => d.name -> d.run).toMap
  def toOracle(defs: Seq[QueryDef]): Map[String, String] =
    defs.flatMap(d => d.oracle.map(d.name -> _)).toMap
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Compatibility IO for the reference's at-rest formats (FIXTURES.md §B):
  * newline-delimited JSON, plain or gzip, rolled into bounded files, with
  * corrupt-line quarantine; plus the `[key, value]`-array record
  * convention (/root/reference/shuffler.py:75-76).
  *
  * Spark-first mapping of the reference behaviors:
  *  - multi-dir input list = multi-path scan (implicit UNION ALL,
  *    /root/reference/mapper.py:75-85) with codec inference for .gz;
  *  - file roll every N records (/root/reference/reducer.py:95-99) =
  *    `maxRecordsPerFile` (per-task bound; at 100 TB this is what keeps
  *    downstream file listings and retries sane);
  *  - corrupt-line quarantine (/root/reference/reducer.py:58-64) =
  *    PERMISSIVE mode with a corrupt-record column, split into a side
  *    output instead of crashing the job (the reference raises after
  *    quarantining; here the clean subset keeps flowing and the caller
  *    decides).
  */
object JsonLines {

  val CorruptCol = "_corrupt_record"

  /** Read dirs/files of JSON-lines (gzip transparent). Schema inference
    * runs a pre-pass; pass an explicit schema at real scale. */
  def read(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(paths: _*)

  /** Split a PERMISSIVE read into (clean, corrupt) — corrupt rows carry
    * the raw line for quarantine, mirroring LINE_ERROR_<id>.data. */
  def quarantine(df: DataFrame): (DataFrame, DataFrame) =
    if (!df.columns.contains(CorruptCol)) (df, df.sparkSession.emptyDataFrame)
    else {
      // Spark refuses to filter on ONLY the corrupt column of a raw file
      // scan (the parser prunes it away); cache pins the parsed rows
      val pinned = df.cache()
      (pinned.filter(col(CorruptCol).isNull).drop(CorruptCol),
        pinned.filter(col(CorruptCol).isNotNull)
          .select(col(CorruptCol).as("raw_line")))
    }

  /** Write JSON-lines with the reference's sink knobs: roll every
    * `maxRecordsPerFile` records, optional gzip
    * (/root/reference/reducer.py:106-139, job flag `compress`). */
  def write(df: DataFrame, path: String, maxRecordsPerFile: Long = 500000L,
      compress: Boolean = false, mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode).option("maxRecordsPerFile", maxRecordsPerFile)
    (if (compress) w.option("compression", "gzip") else w).json(path)
  }

  /** Read reference-convention records: one JSON array `[key, value]` per
    * line, element 0 the group key, element 1 arbitrary JSON
    * (/root/reference/mapper.py:60-62). Returns (key, value_json)
    * strings — schema-on-read stays with the caller, as in the
    * reference. */
  def readKv(spark: SparkSession, paths: Seq[String]): DataFrame =
    spark.read.text(paths: _*)
      .select(
        get_json_object(col("value"), "$[0]").as("key"),
        get_json_object(col("value"), "$[1]").as("value_json"))

  /** Write (key, value_json) pairs back as `[key, value]` JSON lines. */
  def writeKv(df: DataFrame, path: String, compress: Boolean = false): Unit = {
    // to_json needs a container type: serialize [key] then splice the raw
    // value JSON before the closing bracket
    val out = df.select(
      concat(
        regexp_replace(to_json(array(col("key"))), "\\]$", ""),
        lit(", "), col("value_json"), lit("]")).as("value"))
    val w = out.write.mode(SaveMode.Overwrite)
    (if (compress) w.option("compression", "gzip") else w).text(path)
  }
}

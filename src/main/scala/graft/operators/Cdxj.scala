package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.engine.Tables

/** CDXJ crawl-index parsing — the lookup table a Common Crawl consumer
  * reads BEFORE touching any WARC bytes.
  *
  * A CDXJ line is `<SURT urlkey> <14-digit timestamp> <JSON blob>`
  * (the pywb / Common Crawl `cdx-*.gz` index format); the JSON carries
  * the WARC filename / byte offset / record length / HTTP status that
  * make random access into a 100 TB crawl possible. The canonical
  * first query over it: "latest successful capture per URL" — dedupe
  * the index down to one (filename, offset, length) pointer per page,
  * which is exactly the record set a training-data fetch then reads.
  *
  * The Spark side PARSES the line (two splits + `from_json` with an
  * explicit schema — all codegen'd exprs, no UDF) and window-ranks
  * captures per urlkey; the oracle derives the expected survivors
  * arithmetically from doc_id, so a parse that drops a field, loses a
  * digit, or mis-ranks ties fails the hash.
  *
  * Scale shape: parse is map-only; the rank is one hash shuffle on
  * urlkey (the same key the index is already sorted by on disk, so a
  * real deployment reads it near-pre-partitioned). Reference
  * analogue: the map-side parse + keyed reduce pair
  * (mapper.py:21-41, reducer.py:17-56).
  */
object Cdxj {

  /** JSON payload schema of a Common Crawl CDXJ line (the subset every
    * consumer touches). */
  val payloadSchema: StructType = StructType(Seq(
    StructField("offset", LongType),
    StructField("length", LongType),
    StructField("filename", StringType),
    StructField("status", StringType)))

  val defs: Seq[QueryDef] = Seq(

    // ----- CDXJ parse + latest-successful-capture selection ----------
    // Fixture: every doc is one capture; URLs repeat every 3 docs (3
    // captures per page, distinct timestamps), status cycles with a
    // 404 every 7th. The line is assembled with concat exprs, then
    // parsed back with split + from_json — the parse reads urlkey /
    // ts / offset / length / filename / status OUT OF THE STRING, and
    // the window keeps the newest status-200 capture per urlkey.
    QueryDef(
      "q337_cdxj_latest_capture",
      (s, dir) => {
        import s.implicits._
        val lines = Tables.load(s, dir, "documents")
          .select($"doc_id",
            concat(
              lit("com,site"), ($"doc_id" / 3).cast("long") % 50,
              lit(")/page/"), ($"doc_id" / 3).cast("long"),
              lit(" "), (lit(20240000000000L) + $"doc_id"),
              lit(" {\"offset\": "), ($"doc_id" * 1000) % 777777,
              lit(", \"length\": "), lit(500) + $"doc_id" % 1000,
              lit(", \"filename\": \"crawl-"), $"doc_id" % 7,
              lit(".warc.gz\", \"status\": \""),
              when($"doc_id" % 7 === 0, "404").otherwise("200"),
              lit("\"}")).as("line"))
          .select($"line")
        // parse: urlkey and timestamp are the first two space-delimited
        // fields; everything after the second space is the JSON blob
        // (which itself contains spaces — split with a limit, not a
        // global split)
        val parts = lines.select(
          split($"line", " ", 3).as("f"), $"line")
        val parsed = parts.select(
          $"f".getItem(0).as("urlkey"),
          $"f".getItem(1).cast("long").as("ts"),
          from_json($"f".getItem(2), payloadSchema).as("j"))
          .select($"urlkey", $"ts", $"j.offset".as("offset"),
            $"j.length".as("length"), $"j.filename".as("filename"),
            $"j.status".as("status"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy($"urlkey").orderBy($"ts".desc)
        parsed.filter($"status" === "200")
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"urlkey", $"ts", $"offset", $"length", $"filename")
          .orderBy($"urlkey", $"ts")
      },
      Some("""
        WITH caps AS (
          SELECT doc_id,
                 'com,site' || CAST((doc_id // 3) % 50 AS VARCHAR)
                   || ')/page/' || CAST(doc_id // 3 AS VARCHAR) AS urlkey,
                 CAST(20240000000000 + doc_id AS BIGINT) AS ts,
                 CAST((doc_id * 1000) % 777777 AS BIGINT) AS "offset",
                 CAST(500 + doc_id % 1000 AS BIGINT) AS "length",
                 'crawl-' || CAST(doc_id % 7 AS VARCHAR)
                   || '.warc.gz' AS filename,
                 CASE WHEN doc_id % 7 = 0 THEN '404' ELSE '200' END AS status
          FROM documents),
        ranked AS (
          SELECT *, row_number() OVER (PARTITION BY urlkey
                                       ORDER BY ts DESC) AS rn
          FROM caps WHERE status = '200')
        SELECT urlkey, ts, "offset", "length", filename
        FROM ranked WHERE rn = 1
        ORDER BY urlkey, ts"""))
  )
}

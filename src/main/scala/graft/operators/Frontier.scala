package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Crawl-frontier politeness scheduling — the step after the robots
  * fetch gate (q248): a frontier of fetchable URLs becomes a per-host
  * fetch timetable honoring each host's crawl-delay. Priority order
  * within a host, fetch offset = rank · delay — the contract a 100 TB
  * crawler's workers execute. The only shuffle is the per-host window
  * (frontier-per-host-bounded, no global window anywhere — a global
  * sequence number would serialize the planet's frontier through one
  * partition, so ordering across hosts is left to the natural
  * (offset, host) sort of the consumer). */
object Frontier {

  /** Per-host schedule: `fetch_rank` (1-based, priority desc then url
    * asc for determinism) and `fetch_offset_ms` = (rank−1) · delay.
    * `delayMsCol` may vary per host (robots crawl-delay). */
  def politenessSchedule(frontier: DataFrame, hostCol: Column,
      urlCol: Column, priorityCol: Column, delayMsCol: Column): DataFrame = {
    val w = Window.partitionBy(hostCol).orderBy(priorityCol.desc, urlCol.asc)
    frontier
      .withColumn("fetch_rank", row_number().over(w))
      .withColumn("fetch_offset_ms",
        (col("fetch_rank") - 1).cast("long") * delayMsCol.cast("long"))
  }

  // ------------------------------------------------------------------
  // queries
  // ------------------------------------------------------------------

  val defs: Seq[QueryDef] = Seq(

    // politeness schedule over a planted frontier: 20 hosts, per-host
    // crawl-delay from the host number, priority id%13 with the url
    // tiebreak. The oracle replays the same windows in DuckDB — rank
    // and offset arithmetic must agree row for row.
    QueryDef(
      "q306_frontier_schedule",
      (s, dir) => {
        import s.implicits._
        val frontier = Tables.load(s, dir, "documents")
          .select($"doc_id")
          .fanout.as[Long]
          .map { id =>
            val h = id % 20
            (id, s"h$h.example", s"/p$id", (id % 13).toInt,
              (1000 * (1 + h % 5)))
          }
          .toDF("doc_id", "host", "url", "priority", "delay_ms")
        Frontier.politenessSchedule(frontier, $"host", $"url",
          $"priority", $"delay_ms")
          .select($"doc_id", $"host", $"priority",
            $"fetch_rank".cast("long").as("fetch_rank"),
            $"fetch_offset_ms")
          .orderBy($"doc_id")
      },
      Some("""
        WITH f AS (
          SELECT doc_id,
                 'h' || (doc_id % 20) || '.example' AS host,
                 '/p' || doc_id AS url,
                 CAST(doc_id % 13 AS INT) AS priority,
                 1000 * (1 + (doc_id % 20) % 5) AS delay_ms
          FROM documents)
        SELECT doc_id, host, priority,
               CAST(row_number() OVER
                 (PARTITION BY host ORDER BY priority DESC, url ASC)
                 AS BIGINT) AS fetch_rank,
               CAST((row_number() OVER
                 (PARTITION BY host ORDER BY priority DESC, url ASC) - 1)
                 * delay_ms AS BIGINT) AS fetch_offset_ms
        FROM f
        ORDER BY doc_id""")))
}

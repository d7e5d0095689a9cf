package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.api.MapReduce
import graft.engine.Tables

/** The MapReduce compatibility API (graft.api.MapReduce) exercised
  * end-to-end against the DuckDB oracle — proving the typed
  * map → shuffle → sorted-group reduce path produces exactly what the
  * declared relational plans produce.
  */
object MapReduceQueries {

  val defs: Seq[QueryDef] = Seq(

    // ----- the reference's worked example, via the compat API ------------
    // (/root/reference/README.txt:18: count tokens with map=(token,1),
    // reduce=sum). Same oracle as the declared-operator version.
    QueryDef(
      "q53_mr_token_count",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
          .select($"text").as[String]
        MapReduce.run[String, String, Long, (String, Long)](
          docs,
          mapFn = line => line.split(" ").iterator
            .filter(_.nonEmpty).map(t => (t, 1L)),
          reduceFn = (token, ones) => Iterator.single((token, ones.sum)))
          .toDF("token", "cnt")
          .orderBy($"token")
      },
      Some("""
        SELECT token, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE length(token) > 0
        GROUP BY token
        ORDER BY token""")),

    // ----- secondary sort: value-ordered group iteration ------------------
    // The reduce fn sees each user's events sorted by (ts, event_id) —
    // the reference's one non-default semantic (SURVEY.md §2 note 2) —
    // and picks first/last event types positionally, with zero windowing.
    QueryDef(
      "q54_mr_secondary_sort",
      (s, dir) => {
        import s.implicits._
        val ev = Tables.load(s, dir, "events")
          .select($"user_id", $"ts", $"event_id", $"event_type")
          .as[(Long, Timestamp, Long, String)]
        MapReduce.run[
            (Long, Timestamp, Long, String),  // input row
            Long,                             // key: user_id
            (Timestamp, Long, String),        // value: sorted by (ts, id)
            (Long, Long, String, String)](
          ev,
          mapFn = r => Iterator.single((r._1, (r._2, r._3, r._4))),
          reduceFn = (user, events) => {
            var n = 0L
            var firstType: String = null
            var lastType: String = null
            events.foreach { case (_, _, tpe) =>
              if (n == 0L) firstType = tpe
              lastType = tpe
              n += 1
            }
            Iterator.single((user, n, firstType, lastType))
          })
          .toDF("user_id", "n_events", "first_type", "last_type")
          .orderBy($"user_id")
      },
      Some("""
        SELECT user_id, count(*) AS n_events,
               first(event_type ORDER BY ts, event_id) AS first_type,
               last(event_type ORDER BY ts, event_id) AS last_type
        FROM events
        GROUP BY user_id
        ORDER BY user_id"""))
  )
}

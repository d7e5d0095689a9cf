package graft.operators

import org.apache.spark.sql.functions._

import graft.engine.Tables

/** Text-analysis operators over `documents` — the reference's canonical
  * workload (token counting is its worked MapReduce example,
  * /root/reference/README.txt:18) plus the training-data-pipeline surface.
  */
object TextQueries {

  val defs: Seq[QueryDef] = Seq(

    // ----- the canonical MapReduce example: token count ----------------
    // read → split/explode (flatMap) → groupBy(token).count. At 100 TB
    // this is a high-cardinality agg: partial aggregation collapses each
    // task's token multiset before the shuffle, so shuffle volume is
    // bounded by distinct-tokens-per-task, not input rows.
    QueryDef(
      "q_token_count",
      (s, dir) => {
        import s.implicits._
        Tables.load(s, dir, "documents")
          .select(explode(split($"text", " ")).as("token"))
          .filter(length($"token") > 0)
          .groupBy($"token")
          .agg(count(lit(1)).as("cnt"))
          .orderBy($"token")
      },
      Some("""
        SELECT token, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        WHERE length(token) > 0
        GROUP BY token
        ORDER BY token"""))
  )
}

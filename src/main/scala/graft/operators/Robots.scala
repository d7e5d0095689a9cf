package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt parsing + allow/disallow evaluation (public spec: RFC
  * 9309, the Robots Exclusion Protocol) — the crawl-politeness gate a
  * fetch pipeline consults for EVERY url before spending a request.
  *
  * Semantics implemented (the RFC's, not the 1994 draft's):
  *  - groups: consecutive `User-agent:` lines share the rule block
  *    that follows; a `User-agent:` line after rules starts a new
  *    group. Comments (`#`) and unknown directives are ignored.
  *  - group selection: the MOST SPECIFIC matching group wins — the
  *    longest user-agent token that is a case-insensitive substring
  *    of the crawler's product name; `*` only applies when no named
  *    group matches. Once a group is selected, ONLY its rules apply.
  *  - rule matching: patterns are path prefixes with `*` wildcards
  *    and an optional `$` end anchor; the longest-pattern match wins
  *    (octet length, per RFC), an allow/disallow TIE at equal length
  *    resolves to ALLOW, and no match at all means allowed.
  *  - an empty pattern (`Disallow:` with no value = "allow all") is
  *    a no-op rule and is skipped.
  *
  * Deterministic and total — the q248 oracle replays outcomes
  * arithmetically from planted rule sets. Evaluation is a per-row
  * function: the robots table joins to the url table on host (the
  * robots side is |hosts|-sized and broadcastable), then map-only.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  /** `*`-wildcard / `$`-anchored prefix match, RFC 9309 §2.2.3. The
    * classic two-pointer wildcard walk (advance, remember the last
    * star, on mismatch rewind to it and shift the path mark) — O(|p|
    * × |path|) worst case, so hostile many-star patterns stay
    * polynomial on long paths. */
  def matches(pattern: String, path: String): Boolean = {
    val (p, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    var i = 0
    var j = 0
    var star = -1
    var mark = 0
    while (j < path.length) {
      if (i == p.length && !anchored) return true // pattern = a prefix
      if (i < p.length && p.charAt(i) == '*') {
        star = i; mark = j; i += 1
      } else if (i < p.length && p.charAt(i) == path.charAt(j)) {
        i += 1; j += 1
      } else if (star >= 0) {
        i = star + 1; mark += 1; j = mark
      } else return false
    }
    while (i < p.length && p.charAt(i) == '*') i += 1
    i == p.length // path exhausted: pattern must be fully consumed
  }

  /** Parse robots.txt into (agentToken, rules) groups. */
  def parse(robotsTxt: String): Seq[(String, Seq[Rule])] = {
    if (robotsTxt == null) return Seq.empty
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
        scala.collection.mutable.ArrayBuffer[Rule])]
    var inAgents = false
    robotsTxt.linesIterator.foreach { raw =>
      val line = raw.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (!inAgents || groups.isEmpty) {
              groups += ((scala.collection.mutable.ArrayBuffer(
                value.toLowerCase),
                scala.collection.mutable.ArrayBuffer.empty[Rule]))
              inAgents = true
            } else groups.last._1 += value.toLowerCase
          case "allow" | "disallow" =>
            inAgents = false
            if (groups.nonEmpty && value.nonEmpty)
              groups.last._2 += Rule(key == "allow", value)
          case _ => inAgents = false // crawl-delay, sitemap, unknown
        }
      }
    }
    groups.toSeq.flatMap { case (agents, rules) =>
      agents.map(a => a -> rules.toSeq)
    }
  }

  /** Rules of the most specific group matching `agent` (longest
    * matching named token; `*` as fallback; empty if neither). */
  def rulesFor(robotsTxt: String, agent: String): Seq[Rule] = {
    val groups = parse(robotsTxt)
    val al = agent.toLowerCase
    val named = groups.filter(g => g._1 != "*" && al.contains(g._1))
    if (named.nonEmpty) {
      val best = named.map(_._1.length).max
      // merge all groups at the winning specificity (duplicate groups
      // for one agent combine, per RFC)
      named.filter(_._1.length == best).flatMap(_._2)
    } else groups.filter(_._1 == "*").flatMap(_._2)
  }

  /** RFC 9309 evaluation: longest matching pattern wins, allow wins
    * length ties, no match = allowed. */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    val hits = rules.filter(r => matches(r.pattern, path))
    if (hits.isEmpty) true
    else {
      val best = hits.map(_.pattern.length).max
      hits.filter(_.pattern.length == best).exists(_.allow)
    }
  }

  /** The fetch-gate as a DataFrame op: `urls` (host, path) joined to
    * `robots` (host, robots_txt) — robots is |hosts|-sized, so the
    * join broadcasts — then per-row evaluation for `agent`. Adds an
    * `allowed` column.
    *
    * Parsing happens ONCE PER HOST on the broadcast side (a host with
    * a million crawled urls must not re-parse its 500 KiB robots.txt
    * a million times); the per-row work is only the pattern matches.
    * Degrades per-row, never per-job: a host with no robots.txt, or a
    * malformed NULL path, allows — one bad row must not kill a
    * corpus-scale gate. */
  def filterAllowed(urls: DataFrame, robots: DataFrame,
      agent: String): DataFrame = {
    val toRules = udf { robotsTxt: String =>
      rulesFor(robotsTxt, agent).map(r => (r.allow, r.pattern))
    }
    val eval = udf { (rules: Seq[org.apache.spark.sql.Row], path: String) =>
      rules == null || path == null ||
        allowed(rules.map(r => Rule(r.getBoolean(0), r.getString(1))), path)
    }
    val resolved = robots
      .withColumn("_rules", toRules(col("robots_txt")))
      .drop("robots_txt")
    urls.join(broadcast(resolved), Seq("host"), "left")
      .withColumn("allowed", eval(col("_rules"), col("path")))
      .drop("_rules")
  }
}

package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** robots.txt evaluation (RFC 9309, the Robots Exclusion Protocol) —
  * the crawl-policy gate between the URL frontier (q334's canonical
  * URLs) and the fetcher. Semantics implemented as the RFC specifies:
  *
  *  - groups: runs of `User-agent:` lines followed by rules; all
  *    groups naming the SAME product token merge; if any group matches
  *    the caller's token (longest-token match, case-insensitive), ONLY
  *    those groups apply — the `*` groups are ignored for that agent;
  *  - rule match: `Allow` / `Disallow` patterns are path prefixes with
  *    `*` wildcards and a `$` end anchor; the MOST SPECIFIC (longest
  *    pattern) match wins, Allow winning length ties; an empty
  *    `Disallow:` value matches nothing (allow-all);
  *  - unknown fields and `#` comments are ignored; a missing or
  *    unmatched robots.txt allows everything.
  *
  * `crawlDelay` surfaces the matched group's Crawl-delay (not RFC but
  * de-facto standard; -1 when absent) — the politeness knob a fetch
  * scheduler partitions on. Pure per-row map work.
  */
object Robots {

  final case class Group(agents: Seq[String],
                         rules: Seq[(Boolean, String)], // (isAllow, pattern)
                         crawlDelay: Int)

  def parse(robots: String): Seq[Group] = {
    val groups = scala.collection.mutable.ArrayBuffer[Group]()
    var agents = scala.collection.mutable.ArrayBuffer[String]()
    var rules = scala.collection.mutable.ArrayBuffer[(Boolean, String)]()
    var delay = -1
    var inAgents = false // consecutive UA lines accumulate into one group
    def flush(): Unit = {
      if (agents.nonEmpty) groups += Group(agents.toSeq, rules.toSeq, delay)
      agents = scala.collection.mutable.ArrayBuffer[String]()
      rules = scala.collection.mutable.ArrayBuffer[(Boolean, String)]()
      delay = -1
    }
    robots.split("\n", -1).foreach { line0 =>
      val line = line0.takeWhile(_ != '#').trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!inAgents) flush()
            agents += value.toLowerCase
            inAgents = true
          case "allow" => rules += ((true, value)); inAgents = false
          case "disallow" => rules += ((false, value)); inAgents = false
          case "crawl-delay" =>
            value.toIntOption.foreach(d => delay = d); inAgents = false
          case _ => inAgents = false // sitemap etc.: not group-scoped
        }
      }
    }
    flush()
    groups.toSeq
  }

  /** `*`-wildcard, `$`-anchored prefix match per RFC 9309 — compiled
    * to a regex whose literal segments are quoted (a robots.txt value
    * can never inject regex syntax); `*` → `.*`, `$` → end anchor, and
    * a non-anchored pattern gets a free tail (prefix semantics).
    * Backtracking is well-behaved: segments are literals. */
  private[text] def patternMatches(pattern: String, path: String): Boolean = {
    if (pattern.isEmpty) return false // empty Disallow: allow-all
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val body = p.split("\\*", -1)
      .map(java.util.regex.Pattern.quote).mkString(".*")
    path.matches(body + (if (anchored) "" else ".*"))
  }

  /** The groups that govern `agent`: all groups naming its product
    * token if any do, else the `*` groups. */
  private def applicable(groups: Seq[Group], agent: String): Seq[Group] = {
    val a = agent.toLowerCase
    val specific = groups.filter(_.agents.exists(ua =>
      ua != "*" && a.contains(ua)))
    if (specific.nonEmpty) specific
    else groups.filter(_.agents.contains("*"))
  }

  /** RFC 9309 longest-match decision; allow on no match at all. */
  def isAllowed(robots: String, agent: String, path: String): Boolean = {
    val rules = applicable(parse(robots), agent).flatMap(_.rules)
    val hits = rules.filter { case (_, pat) => patternMatches(pat, path) }
    if (hits.isEmpty) true
    else {
      val best = hits.map { case (allow, pat) => (pat.length, allow) }.max
      best._2 // (length, allow) max: longer wins; at equal length
              // (true > false) allow wins the tie — the RFC rule
    }
  }

  /** Matched groups' Crawl-delay (first non-negative), -1 if none. */
  def crawlDelay(robots: String, agent: String): Int =
    applicable(parse(robots), agent).map(_.crawlDelay)
      .find(_ >= 0).getOrElse(-1)

  /** (robots, agent, path) → allowed flag. */
  def isAllowedCol(robots: Column, agent: Column, path: Column): Column =
    udf { (r: String, a: String, p: String) =>
      isAllowed(r, a, p)
    }.apply(robots, agent, path)

  def crawlDelayCol(robots: Column, agent: Column): Column =
    udf { (r: String, a: String) => crawlDelay(r, a) }.apply(robots, agent)
}

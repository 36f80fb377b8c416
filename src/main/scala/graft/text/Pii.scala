package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction over a text column — the scrubbing stage
  * of a training-data pipeline (emails, phone numbers, IPv4 addresses).
  *
  * Everything is a pure codegen'd Column expression (`regexp_replace` /
  * `regexp_extract_all`) — map-only, no UDFs, no shuffle: at 100 TB
  * this fuses into the corpus scan like the other [[TextOps]] stages.
  *
  * The patterns deliberately use only regex constructs with identical
  * semantics in Java regex (Spark) and RE2 (DuckDB oracle): character
  * classes, bounded/unbounded repetition, word boundaries — no
  * backreferences, no lookaround.
  */
object Pii {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9][0-9() -]{6,}[0-9]"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  val EmailTag = "<EMAIL>"
  val PhoneTag = "<PHONE>"
  val Ipv4Tag = "<IP>"

  /** Number of matches of `re` in `c` (0 for empty/no match). */
  def matchCount(c: Column, re: String): Column =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  def emailCount(c: Column): Column = matchCount(c, EmailRe)
  def phoneCount(c: Column): Column = matchCount(c, PhoneRe)
  def ipv4Count(c: Column): Column = matchCount(c, Ipv4Re)

  /** Redact all three PII classes with typed placeholders. Order
    * matters and is fixed: emails first (so their dotted domains are
    * gone before the IPv4 pass), then IPv4, then phones — the same
    * sequence the oracle twin applies.
    */
  def redact(c: Column): Column = {
    val e = regexp_replace(c, EmailRe, EmailTag)
    val i = regexp_replace(e, Ipv4Re, Ipv4Tag)
    regexp_replace(i, PhoneRe, PhoneTag)
  }

  /** DuckDB oracle twins (RE2 'g' flag = replace-all, matching Spark's
    * regexp_replace semantics).
    */
  object Sql {
    // DuckDB string literals are not backslash-escaped — the Scala-level
    // pattern chars pass through verbatim; only quotes need doubling
    private def q(re: String): String = re.replace("'", "''")

    def matchCount(x: String, re: String): String =
      s"CAST(len(regexp_extract_all($x, '${q(re)}')) AS BIGINT)"

    def emailCount(x: String): String = matchCount(x, EmailRe)
    def phoneCount(x: String): String = matchCount(x, PhoneRe)
    def ipv4Count(x: String): String = matchCount(x, Ipv4Re)

    def redact(x: String): String = {
      val e = s"regexp_replace($x, '${q(EmailRe)}', '$EmailTag', 'g')"
      val i = s"regexp_replace($e, '${q(Ipv4Re)}', '$Ipv4Tag', 'g')"
      s"regexp_replace($i, '${q(PhoneRe)}', '$PhoneTag', 'g')"
    }
  }
}

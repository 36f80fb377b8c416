package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** RSS 2.0 / Atom feed parsing — the fourth frontier-discovery leg
  * beside sitemaps (q340), robots (q337) and link extraction (q339):
  * a crawl that wants FRESH content seeds from feeds, which announce
  * new URLs long before they appear in sitemaps or get linked. Same
  * dependency-free tag-scanning discipline as [[Sitemap]]:
  *
  *  - RSS 2.0: root `<rss>` → `<channel>`; feed title is the channel
  *    `<title>` (read before the first `<item>` so item titles can't
  *    shadow it); one entry per `<item>` with mandatory `<link>`,
  *    optional `<title>`, `<pubDate>`, `<guid>` (defaulting to the
  *    link per the de-facto convention);
  *  - Atom (RFC 4287): root `<feed>`; one entry per `<entry>` with the
  *    link taken from the first `<link>` TAG whose `rel` is absent or
  *    `alternate` (self/enclosure/hub links are NOT content URLs),
  *    read from the `href` attribute; optional `<title>`,
  *    `<updated>`, `<id>` (defaulting to the link).
  *
  * Titles decode entities and accept CDATA (via [[XmlLite]]). Strict:
  * a document whose root is neither kind, or an entry with no
  * qualifying link, is None — a feed poller must never mint junk
  * frontier URLs. Pure per-row map work at any scale.
  */
object Feeds {

  /** One feed item, normalized across both formats: `date` is RSS
    * `pubDate` / Atom `updated`, `id` is RSS `guid` / Atom `id`. */
  final case class Entry(title: String, link: String, date: String,
    id: String)

  /** (kind, feedTitle, entries) where kind ∈ {"rss", "atom"}. */
  def parse(xml: String): Option[(String, String, Seq[Entry])] = {
    if (XmlLite.indexOfTag(xml, "rss", 0) >= 0) parseRss(xml)
    else if (XmlLite.indexOfTag(xml, "feed", 0) >= 0) parseAtom(xml)
    else None
  }

  private def parseRss(xml: String): Option[(String, String, Seq[Entry])] = {
    val chOpen = XmlLite.indexOfTag(xml, "channel", 0)
    if (chOpen < 0) return None
    val chEnd = xml.indexOf("</channel>", chOpen)
    val channel = xml.substring(xml.indexOf('>', chOpen) + 1,
      if (chEnd < 0) xml.length else chEnd)
    val firstItem = XmlLite.indexOfTag(channel, "item", 0)
    val head = if (firstItem < 0) channel else channel.substring(0, firstItem)
    val feedTitle = XmlLite.element(head, "title").getOrElse("")
    val out = Vector.newBuilder[Entry]
    var i = if (firstItem < 0) channel.length else firstItem
    while (i < channel.length) {
      val open = XmlLite.indexOfTag(channel, "item", i)
      if (open < 0) return Some(("rss", feedTitle, out.result()))
      val close = channel.indexOf("</item>", open)
      if (close < 0) return None // unterminated entry
      val body = channel.substring(channel.indexOf('>', open) + 1, close)
      val link = XmlLite.element(body, "link").getOrElse(return None)
      out += Entry(
        XmlLite.element(body, "title").getOrElse(""),
        link,
        XmlLite.element(body, "pubDate").getOrElse(""),
        XmlLite.element(body, "guid").getOrElse(link))
      i = close + "</item>".length
    }
    Some(("rss", feedTitle, out.result()))
  }

  private def parseAtom(xml: String): Option[(String, String, Seq[Entry])] = {
    val firstEntry = XmlLite.indexOfTag(xml, "entry", 0)
    val head = if (firstEntry < 0) xml else xml.substring(0, firstEntry)
    val feedTitle = XmlLite.element(head, "title").getOrElse("")
    val out = Vector.newBuilder[Entry]
    var i = if (firstEntry < 0) xml.length else firstEntry
    while (i < xml.length) {
      val open = XmlLite.indexOfTag(xml, "entry", i)
      if (open < 0) return Some(("atom", feedTitle, out.result()))
      val close = xml.indexOf("</entry>", open)
      if (close < 0) return None
      val body = xml.substring(xml.indexOf('>', open) + 1, close)
      val link = alternateLink(body).getOrElse(return None)
      out += Entry(
        XmlLite.element(body, "title").getOrElse(""),
        link,
        XmlLite.element(body, "updated").getOrElse(""),
        XmlLite.element(body, "id").getOrElse(link))
      i = close + "</entry>".length
    }
    Some(("atom", feedTitle, out.result()))
  }

  /** href of the first `<link>` tag whose rel is absent or
    * "alternate" — RFC 4287's content-link selection. */
  private def alternateLink(body: String): Option[String] = {
    var i = 0
    while (i < body.length) {
      val open = XmlLite.indexOfTag(body, "link", i)
      if (open < 0) return None
      val end = body.indexOf('>', open)
      if (end < 0) return None
      val inner = body.substring(open + 1, end).stripSuffix("/")
      val rel = XmlLite.attr(inner, "rel")
      if (rel.isEmpty || rel.contains("alternate")) {
        val href = XmlLite.attr(inner, "href")
        if (href.isDefined) return href
      }
      i = end + 1
    }
    None
  }

  /** xml → array<struct<kind, feed_title, title, link, date, id>>;
    * null on a malformed document. */
  def entriesCol(c: Column): Column =
    udf { s: String =>
      Option(s).flatMap(parse).map { case (kind, ft, es) =>
        es.map(e => (kind, ft, e.title, e.link, e.date, e.id))
      }
    }.apply(c)
}

package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Sitemap parsing (sitemaps.org XML protocol) — the third leg of the
  * index-side frontier beside URL canonicalization (q334) and robots
  * evaluation (q337): robots.txt's `Sitemap:` lines point here, and a
  * crawl seeds its frontier from these files. Dependency-free tag
  * scanning over the two document kinds:
  *
  *  - `<urlset>`: one entry per `<url>` — mandatory `<loc>`, optional
  *    `<lastmod>` and `<priority>` (defaulting to 0.5 per the spec);
  *  - `<sitemapindex>`: one entry per `<sitemap>` — mandatory `<loc>`
  *    (priority/lastmod as above; priority is meaningless for an index
  *    but tolerated).
  *
  * `<loc>` values decode XML entities (`&amp;` is REQUIRED escaping in
  * sitemap URLs) and accept CDATA sections. Strict: a document whose
  * root is neither kind, an entry without a `<loc>`, or an unparseable
  * `<priority>` is None — never junk frontier entries. Namespaced
  * wrappers (`xmlns=` attributes) are tolerated; exotic XML (nested
  * CDATA, processing-instruction tricks) is out of documented scope.
  */
object Sitemap {

  final case class Entry(loc: String, lastmod: String, priority: Double)

  /** (kind, entries) where kind ∈ {"urlset", "sitemapindex"}. */
  def parse(xml: String): Option[(String, Seq[Entry])] = {
    val (kind, itemTag) =
      if (hasRoot(xml, "urlset")) ("urlset", "url")
      else if (hasRoot(xml, "sitemapindex")) ("sitemapindex", "sitemap")
      else return None
    val out = Vector.newBuilder[Entry]
    var i = 0
    while (i < xml.length) {
      val open = indexOfTag(xml, itemTag, i)
      if (open < 0) return Some((kind, out.result()))
      val close = xml.indexOf(s"</$itemTag>", open)
      if (close < 0) return None // unterminated entry
      val body = xml.substring(xml.indexOf('>', open) + 1, close)
      val loc = element(body, "loc").getOrElse(return None)
      val lastmod = element(body, "lastmod").getOrElse("")
      val priority = element(body, "priority") match {
        case None => 0.5 // the spec default
        case Some(p) => p.toDoubleOption.getOrElse(return None)
      }
      out += Entry(loc, lastmod, priority)
      i = close + itemTag.length + 3
    }
    Some((kind, out.result()))
  }

  private def hasRoot(xml: String, root: String): Boolean =
    indexOfTag(xml, root, 0) >= 0

  // tag location + first-element extraction shared with Feeds
  private def indexOfTag(xml: String, tag: String, from: Int): Int =
    XmlLite.indexOfTag(xml, tag, from)
  private def element(body: String, name: String): Option[String] =
    XmlLite.element(body, name)

  /** xml → array<struct<kind, loc, lastmod, priority>>; null on a
    * malformed document. */
  def entriesCol(c: Column): Column =
    udf { s: String =>
      Option(s).flatMap(parse).map { case (kind, es) =>
        es.map(e => (kind, e.loc, e.lastmod, e.priority))
      }
    }.apply(c)
}

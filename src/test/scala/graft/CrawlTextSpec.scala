package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.{Html, Robots}

class CrawlTextSpec extends AnyFunSuite {

  test("htmlToText: tags, skip elements, entities, block structure") {
    assert(Html.htmlToText("<p>alpha</p><p>beta</p>") == "alpha\nbeta")
    // inline tags keep the line; block tags break it
    assert(Html.htmlToText("<div>x<span>y</span><b>z</b></div><br>w")
      == "xyz\nw")
    // script/style/noscript CONTENT vanishes, case-insensitive close
    assert(Html.htmlToText("<script>var a='<p>junk</p>';</SCRIPT>ok") == "ok")
    assert(Html.htmlToText("<style>p{color:red}</style><p>t</p>") == "t")
    assert(Html.htmlToText("<noscript><img src=x></noscript>v") == "v")
    // comments and declarations
    assert(Html.htmlToText("<!DOCTYPE html><!-- <p>gone</p> -->kept") == "kept")
    // entities: named, decimal, hex; unknown passes through
    assert(Html.htmlToText("&amp;&lt;&gt;&quot;&apos;&#65;&#x42;&nbsp;x")
      == "&<>\"'AB x")
    assert(Html.htmlToText("a &unknown; b") == "a &unknown; b")
    // whitespace collapses per line, empty lines drop
    assert(Html.htmlToText("<p>  a   b  </p>\n\n<p> c </p>") == "a b\nc")
    // tag-soup: unterminated tag/comment truncates cleanly, no crash
    assert(Html.htmlToText("ok<div") == "ok")
    assert(Html.htmlToText("ok<!-- never closed") == "ok")
    assert(Html.htmlToText("<script>never closed") == "")
    // attributes and self-closed skip elements
    assert(Html.htmlToText("<script src=\"x.js\"/>after") == "after")
    assert(Html.htmlToText("<a href=\"u\">link</a> text") == "link text")
  }

  test("robots: RFC 9309 longest-match, group selection, wildcards") {
    val robots =
      """User-agent: *
        |Disallow: /private/
        |Allow: /private/public/
        |Disallow: /*.pdf$
        |Crawl-delay: 5
        |
        |User-agent: graftbot
        |Disallow: /bot-only/
        |""".stripMargin
    def star(p: String) = Robots.isAllowed(robots, "googlebot", p)
    def bot(p: String) = Robots.isAllowed(robots, "graftbot/1.0", p)
    assert(star("/a") && bot("/a"))
    assert(!star("/private/x") && bot("/private/x")) // specific group suppresses *
    assert(star("/private/public/y")) // longer Allow beats shorter Disallow
    assert(!star("/doc.pdf") && !star("/x/y/report.pdf"))
    assert(star("/doc.pdfx")) // $ anchor: .pdf must END the path
    assert(star("/bot-only/z") && !bot("/bot-only/z"))
    assert(Robots.crawlDelay(robots, "googlebot") == 5)
    assert(Robots.crawlDelay(robots, "graftbot") == -1)
    // empty Disallow allows everything; comments stripped
    val open = "User-agent: *\nDisallow: # nothing\n"
    assert(Robots.isAllowed(open, "any", "/deep/path"))
    // no robots at all: allow
    assert(Robots.isAllowed("", "any", "/x"))
    // allow wins a length tie
    val tie = "User-agent: *\nDisallow: /p/\nAllow: /p/\n"
    assert(Robots.isAllowed(tie, "any", "/p/x"))
    // merged groups for the same token
    val merged = "User-agent: a\nDisallow: /one\nUser-agent: a\nDisallow: /two\n"
    assert(!Robots.isAllowed(merged, "a", "/one") &&
      !Robots.isAllowed(merged, "a", "/two"))
    // consecutive UA lines share one group
    val shared = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
    assert(!Robots.isAllowed(shared, "a", "/x") &&
      !Robots.isAllowed(shared, "b", "/x"))
  }

  test("extractLinks: quoted/bare hrefs in order, script links excluded") {
    val html = """<a href="/a">1</a><a href='/b'>2</a><a href=/c>3</a>
      |<a class="x" HREF="/d">4</a>
      |<script>var s='<a href="/no">n</a>';</script>
      |<!-- <a href="/no2">n</a> -->
      |<a data-href="/no3" href="/e">5</a>
      |<a name="anchor">no href</a>""".stripMargin
    assert(Html.extractLinks(html) == Seq("/a", "/b", "/c", "/d", "/e"))
    // malformed tail: no crash
    assert(Html.extractLinks("<a href=\"/x") == Seq("/x"))
    assert(Html.extractLinks("<a href=") == Seq())
  }

  test("resolve: RFC 3986 reference forms against an absolute base") {
    import graft.text.Urls
    val base = "http://site.com/dir/page.html"
    assert(Urls.resolve(base, "https://ext.org/x")
      .contains("https://ext.org/x"))
    assert(Urls.resolve(base, "//cdn.net/l.js")
      .contains("http://cdn.net/l.js"))
    assert(Urls.resolve(base, "/top").contains("http://site.com/top"))
    assert(Urls.resolve(base, "../up/a.html")
      .contains("http://site.com/up/a.html"))
    assert(Urls.resolve(base, "sub/b.html")
      .contains("http://site.com/dir/sub/b.html"))
    assert(Urls.resolve(base, "?q=1")
      .contains("http://site.com/dir/page.html?q=1"))
    // https base propagates into network-path references
    assert(Urls.resolve("https://s.com/p", "//c.net/x")
      .contains("https://c.net/x"))
    // non-edges: same-document and non-fetchable schemes
    assert(Urls.resolve(base, "#frag").isEmpty)
    assert(Urls.resolve(base, "mailto:a@b.c").isEmpty)
    assert(Urls.resolve(base, "javascript:void(0)").isEmpty)
    // resolution output is canonical (tracking params dropped)
    assert(Urls.resolve(base, "/p?utm_source=x&a=1")
      .contains("http://site.com/p?a=1"))
    // malformed base
    assert(Urls.resolve("not a url", "/x").isEmpty)
  }

  test("sitemap: urlset/sitemapindex, CDATA, entities, defaults, strictness") {
    import graft.text.Sitemap
    val set = """<?xml version="1.0"?>
      |<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      |<url><loc>http://e.com/a?x=1&amp;y=2</loc>
      | <lastmod>2026-01-15</lastmod><priority>0.9</priority></url>
      |<url><loc><![CDATA[http://e.com/b?x=1&y=2]]></loc></url>
      |</urlset>""".stripMargin
    val (kind, es) = Sitemap.parse(set).get
    assert(kind == "urlset" && es.length == 2)
    assert(es(0) == Sitemap.Entry("http://e.com/a?x=1&y=2", "2026-01-15", 0.9))
    assert(es(1) == Sitemap.Entry("http://e.com/b?x=1&y=2", "", 0.5))
    val idx = "<sitemapindex><sitemap><loc>http://e.com/s.xml.gz</loc>" +
      "</sitemap></sitemapindex>"
    assert(Sitemap.parse(idx).get ==
      (("sitemapindex", Seq(Sitemap.Entry("http://e.com/s.xml.gz", "", 0.5)))))
    // strictness: wrong root, missing loc, bad priority, unterminated
    assert(Sitemap.parse("<rss><item/></rss>").isEmpty)
    assert(Sitemap.parse("<urlset><url><lastmod>x</lastmod></url></urlset>")
      .isEmpty)
    assert(Sitemap.parse(
      "<urlset><url><loc>u</loc><priority>high</priority></url></urlset>")
      .isEmpty)
    assert(Sitemap.parse("<urlset><url><loc>u</loc>").isEmpty)
    // empty urlset is valid (zero entries)
    assert(Sitemap.parse("<urlset></urlset>").get._2.isEmpty)
  }

  test("feeds: RSS items, guid default, entities, CDATA titles") {
    import graft.text.Feeds
    val rss = """<?xml version="1.0"?><rss version="2.0"><channel>
      |<title>Site &amp; News</title><link>http://e.com/</link>
      |<item><title><![CDATA[A < B]]></title>
      | <link>http://e.com/p0</link>
      | <pubDate>Mon, 01 Jun 2026 10:00:00 GMT</pubDate>
      | <guid isPermaLink="false">tag:e,p0</guid></item>
      |<item><title>Second &#65;</title><link>http://e.com/p1</link></item>
      |</channel></rss>""".stripMargin
    val (kind, ft, es) = Feeds.parse(rss).get
    assert(kind == "rss" && ft == "Site & News")
    assert(es(0) == Feeds.Entry("A < B", "http://e.com/p0",
      "Mon, 01 Jun 2026 10:00:00 GMT", "tag:e,p0"))
    // guid defaults to the link; pubDate defaults empty
    assert(es(1) == Feeds.Entry("Second A", "http://e.com/p1", "",
      "http://e.com/p1"))
    // the channel title is read BEFORE the first item: item titles
    // cannot shadow it even when the channel has no title of its own
    val noTitle = "<rss><channel><item><title>T</title>" +
      "<link>http://e.com/x</link></item></channel></rss>"
    assert(Feeds.parse(noTitle).get._2 == "")
  }

  test("feeds: Atom rel selection, id default, strictness") {
    import graft.text.Feeds
    val atom = """<feed xmlns="http://www.w3.org/2005/Atom">
      |<title>Blog</title><link rel="self" href="http://b.com/feed"/>
      |<entry><title>E0</title>
      | <link rel="self" href="http://b.com/e0.atom"/>
      | <link rel="alternate" href="http://b.com/e0?a=1&amp;b=2"/>
      | <updated>2026-07-01T00:00:00Z</updated>
      | <id>urn:b:e0</id></entry>
      |<entry><title>E1</title><link href="http://b.com/e1"/></entry>
      |</feed>""".stripMargin
    val (kind, ft, es) = Feeds.parse(atom).get
    assert(kind == "atom" && ft == "Blog")
    // rel="self" skipped, alternate chosen, href entity-decoded
    assert(es(0) == Feeds.Entry("E0", "http://b.com/e0?a=1&b=2",
      "2026-07-01T00:00:00Z", "urn:b:e0"))
    // rel-absent link qualifies; id defaults to it
    assert(es(1) == Feeds.Entry("E1", "http://b.com/e1", "",
      "http://b.com/e1"))
    // strictness: wrong root, entry with no qualifying link,
    // unterminated entry
    assert(Feeds.parse("<urlset></urlset>").isEmpty)
    assert(Feeds.parse(
      "<feed><entry><link rel=\"self\" href=\"u\"/></entry></feed>").isEmpty)
    assert(Feeds.parse("<rss><channel><item><link>u</link>").isEmpty)
    // empty feed is valid (zero entries)
    assert(Feeds.parse("<feed><title>T</title></feed>").get._3.isEmpty)
    assert(Feeds.parse("<rss><channel></channel></rss>").get._3.isEmpty)
  }

  test("jsonLdBlocks: type filter, CDATA, comment decoy, torn input") {
    val ld = "<script type=\"application/ld+json\">{\"a\":1}</script>"
    assert(Html.jsonLdBlocks(s"<html>$ld</html>") == Seq("{\"a\":1}"))
    // case-insensitive type, whitespace tolerated
    assert(Html.jsonLdBlocks(
      "<SCRIPT TYPE=\" Application/LD+JSON \">{}</SCRIPT>") == Seq("{}"))
    // other script types never match
    assert(Html.jsonLdBlocks(
      "<script type=\"text/javascript\">{\"a\":1}</script>").isEmpty)
    assert(Html.jsonLdBlocks("<script>{\"a\":1}</script>").isEmpty)
    // a commented-out block never executes, so it must not surface
    assert(Html.jsonLdBlocks(s"<!-- $ld -->$ld").length == 1)
    // CDATA wrapper unwraps
    assert(Html.jsonLdBlocks("<script type=\"application/ld+json\">" +
      "<![CDATA[{\"b\":2}]]></script>") == Seq("{\"b\":2}"))
    // document order, multiple blocks
    assert(Html.jsonLdBlocks(
      ld + "<p>x</p><script type=\"application/ld+json\">{\"c\":3}" +
        "</script>") == Seq("{\"a\":1}", "{\"c\":3}"))
    // torn input terminates: unclosed script swallows to EOF
    assert(Html.jsonLdBlocks(
      "<script type=\"application/ld+json\">{\"d\":4}") == Seq("{\"d\":4}"))
    assert(Html.jsonLdBlocks("<script type=\"application/ld+json\"")
      .isEmpty)
    // scriptsearch must not match <scriptx...>
    assert(Html.jsonLdBlocks(
      "<scriptx type=\"application/ld+json\">{}</scriptx>").isEmpty)
  }

  test("ogProps: og:* map, first-wins, comment skip") {
    val h = "<meta property=\"og:title\" content=\"T1\">" +
      "<!-- <meta property=\"og:title\" content=\"gone\"> -->" +
      "<meta property=\"OG:Type\" content=\"article\"/>" +
      "<meta property=\"og:title\" content=\"T2\">" +
      "<meta name=\"og:title\" content=\"not-property\">" +
      "<meta property=\"twitter:card\" content=\"x\">"
    assert(Html.ogProps(h) == Seq("title" -> "T1", "type" -> "article"))
  }
}

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
}

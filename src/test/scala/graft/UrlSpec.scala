package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Urls

class UrlSpec extends AnyFunSuite {

  private def c(u: String): String = Urls.canonicalize(u).get

  test("canonicalization erases case, default ports, dot-segments, tracking") {
    assert(c("HTTP://Example.COM:80/a/b/../c?utm_source=x&b=2&a=1#frag")
      == "http://example.com/a/c?a=1&b=2")
    // default ports per scheme; non-default kept
    assert(c("https://e.com:443/x") == "https://e.com/x")
    assert(c("http://e.com:8080/x") == "http://e.com:8080/x")
    assert(c("https://e.com:80/x") == "https://e.com:80/x") // 80 ≠ https default
    // empty path → "/", fragment-only tails
    assert(c("http://e.com") == "http://e.com/")
    assert(c("http://e.com#top") == "http://e.com/")
    assert(c("http://e.com?a=1") == "http://e.com/?a=1")
    // param sort is order-insensitive equality; tracking prefix + exact
    assert(c("http://e.com/p?z=9&a=1") == c("http://e.com/p?a=1&z=9"))
    assert(c("http://e.com/p?utm_campaign=c&utm_medium=m&gclid=1&fbclid=2&msclkid=3&mc_eid=4")
      == "http://e.com/p")
    // dot-segment edges (RFC 3986 §5.2.4 + duplicate-slash collapse)
    assert(c("http://e.com/../a") == "http://e.com/a")
    assert(c("http://e.com/a/..") == "http://e.com/")
    assert(c("http://e.com/a/../../b") == "http://e.com/b")
    assert(c("http://e.com/a/.") == "http://e.com/a/")
    assert(c("http://e.com/a//b") == "http://e.com/a/b")
    assert(c("http://e.com/a/") == "http://e.com/a/")
  }

  test("canonicalization is idempotent") {
    val urls = Seq(
      "HTTP://A.B.C.co.UK:80/x/../y/.?utm_source=s&k=v#f",
      "https://e.com", "http://e.com:8080//p//q/..?b=2&a=1")
    urls.foreach { u => assert(c(c(u)) == c(u), u) }
  }

  test("malformed URLs reject, never junk") {
    assert(Urls.canonicalize("no-scheme.com/path").isEmpty)
    assert(Urls.canonicalize("://missing.com").isEmpty)
    assert(Urls.canonicalize("http://").isEmpty)
    assert(Urls.canonicalize("http://host:notaport/x").isEmpty)
    assert(Urls.canonicalize("1http://e.com/").isEmpty) // scheme must start with a letter
  }

  test("registrable domain: eTLD+1 with the embedded multi-label suffixes") {
    assert(Urls.registrableDomain("www.example.com") == "example.com")
    assert(Urls.registrableDomain("a.b.c.example.com") == "example.com")
    assert(Urls.registrableDomain("example.com") == "example.com")
    assert(Urls.registrableDomain("localhost") == "localhost")
    assert(Urls.registrableDomain("shop.example.co.uk") == "example.co.uk")
    assert(Urls.registrableDomain("x.y.gov.au") == "y.gov.au")
    assert(Urls.registrableDomain("news.site.co.jp") == "site.co.jp")
    // a bare multi-label suffix has nothing registrable under it
    assert(Urls.registrableDomain("co.uk") == "co.uk")
  }
}

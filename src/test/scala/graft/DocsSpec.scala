package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Archives, Docs}

class DocsSpec extends AnyFunSuite {

  test("epub: OPF Dublin Core metadata + spine length") {
    val m = Docs.epubMeta(Docs.synthEpub(7)).get
    assert(m == Docs.EpubMeta("Book & Tale 7", "Author 7", "en", 2))
    // absent metadata elements are empty strings, not errors
    val bare = "<?xml version=\"1.0\"?><package><manifest/>" +
      "<spine><itemref idref=\"a\"/></spine></package>"
    val container = "<container><rootfiles><rootfile " +
      "full-path=\"c.opf\"/></rootfiles></container>"
    val zip = Archives.buildZip(Seq(
      ("META-INF/container.xml", container, true), ("c.opf", bare, true)))
    assert(Docs.epubMeta(zip).get == Docs.EpubMeta("", "", "", 1))
    // structural malformations still reject
    assert(Docs.epubMeta(Array[Byte](1, 2, 3)).isEmpty)
    assert(Docs.epubMeta(Archives.buildZip(
      Seq(("mimetype", "application/epub+zip", false)))).isEmpty)
  }

  test("odt: headings, spans transparent, tab/break/space elements") {
    val (n, title, text) = Docs.odtText(Docs.synthOdt(4)).get
    assert(n == 3 && title == "Odt title 4")
    assert(text ==
      "Heading 4\nCell\tstyled 4\nOne & two 4\nthree four 4")
    // text:s must not be confused with text:span (name boundary)
    val zip = Archives.buildZip(Seq(("content.xml",
      "<office:text><text:p>a<text:span>b</text:span>c</text:p>" +
        "</office:text>", true)))
    assert(Docs.odtText(zip).get._3 == "abc")
    // structural malformations reject; missing meta = empty title
    assert(Docs.odtText(Array[Byte](1, 2)).isEmpty)
    assert(Docs.odtText(Archives.buildZip(
      Seq(("mimetype", "x", false)))).isEmpty)
    assert(Docs.odtText(zip).get._2 == "")
  }

  test("docx: unterminated open tags terminate (hang regression)") {
    def docx(xml: String) = Archives.buildZip(Seq(
      ("[Content_Types].xml", "<Types/>", true),
      ("word/document.xml", xml, true)))
    // '<w:p x' with no '>' after an earlier '</w:p>': the close-tag
    // search used to restart from 0 and never advance (infinite loop
    // + unbounded paragraph accumulation)
    assert(Docs.docxText(docx("</w:p><w:p x")).contains((0, "")))
    // same class inside a paragraph body: '<w:t zz' with no '>'
    val r = Docs.docxText(docx("<w:p><w:t>ok</w:t></w:t><w:t zz</w:p>"))
    assert(r.exists(_._2.contains("ok")))
    // unterminated at the very start
    assert(Docs.docxText(docx("<w:p x")).contains((0, "")))
  }

  test("docx: paragraphs, runs, tabs, breaks, entities") {
    val (n, text) = Docs.docxText(Docs.synthDocx(5)).get
    assert(n == 3)
    assert(text ==
      "Title & heading 5\nCell A5\tCell B5\nLine one 5\nLine two 5")
    // empty paragraphs count but contribute no text
    val doc = "<w:document><w:body><w:p></w:p>" +
      "<w:p><w:r><w:t>only</w:t></w:r></w:p></w:body></w:document>"
    val zip = Archives.buildZip(Seq(("word/document.xml", doc, true)))
    assert(Docs.docxText(zip).get == ((2, "only")))
    // structure malformations reject
    assert(Docs.docxText(Archives.buildZip(
      Seq(("other.xml", "<x/>", false)))).isEmpty)
    assert(Docs.docxText(Array[Byte](1, 2, 3)).isEmpty)
    // corrupt member payload -> crc fails -> reject
    val good = Docs.synthDocx(5)
    // flip a byte inside the second member's deflate stream
    val bad = good.clone()
    bad(good.length / 2) = (bad(good.length / 2) ^ 0x35).toByte
    assert(Docs.docxText(bad).isEmpty ||
      Docs.docxText(bad).exists(_._2 != text))
  }

  test("epub: container -> opf -> spine order, css not pulled in") {
    val (n, text) = Docs.epubText(Docs.synthEpub(7)).get
    assert(n == 2)
    assert(text ==
      "Chapter one 7\nFirst body 7\nSecond chapter 7 & end")
    // missing container rejects
    assert(Docs.epubText(Archives.buildZip(
      Seq(("mimetype", "application/epub+zip", false)))).isEmpty)
    // spine pointing at a missing manifest id rejects
    val badOpf = "<package><manifest>" +
      "<item id=\"c1\" href=\"ch1.xhtml\"/></manifest>" +
      "<spine><itemref idref=\"nope\"/></spine></package>"
    val zip = Archives.buildZip(Seq(
      ("META-INF/container.xml",
        "<container><rootfiles><rootfile full-path=\"content.opf\"/>" +
          "</rootfiles></container>", true),
      ("content.opf", badOpf, true),
      ("ch1.xhtml", "<p>x</p>", true)))
    assert(Docs.epubText(zip).isEmpty)
  }

  test("epub: opf-relative hrefs and root-level opf both resolve") {
    val zip = Archives.buildZip(Seq(
      ("META-INF/container.xml",
        "<container><rootfiles><rootfile full-path=\"book.opf\"/>" +
          "</rootfiles></container>", true),
      ("book.opf", "<package><manifest>" +
        "<item id=\"a\" href=\"text/c.xhtml\"/></manifest>" +
        "<spine><itemref idref=\"a\"/></spine></package>", true),
      ("text/c.xhtml", "<body><p>deep chapter</p></body>", true)))
    assert(Docs.epubText(zip).get == ((1, "deep chapter")))
  }
}

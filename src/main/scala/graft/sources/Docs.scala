package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import graft.text.{Html, XmlLite}

/** Office/ebook document extraction — DOCX and EPUB, the two
  * ZIP-packaged document formats a crawl meets after PDF. Both
  * compose the layers already in the engine: [[Archives.parseZip]]
  * for the container, tag scanning for the payload ([[Html]] for
  * EPUB's XHTML chapters), so the only NEW parsing here is the
  * format's own structure:
  *
  *  - DOCX (OOXML): `word/document.xml` — paragraphs are `<w:p>`
  *    elements, text runs are `<w:t>` (entity-decoded,
  *    `xml:space`-agnostic), `<w:tab/>` a tab, `<w:br/>` a line
  *    break; everything else (run properties, tables' structure)
  *    drops. Paragraphs join with newlines, empty ones drop.
  *  - EPUB (OCF/OPF): `META-INF/container.xml` names the OPF; the
  *    OPF's `<manifest>` maps ids to hrefs and `<spine>` orders them;
  *    each spine XHTML chapter extracts through [[Html.htmlToText]].
  *    Hrefs resolve relative to the OPF's directory.
  *
  * Strict on structure (bad zip, missing document.xml/container/OPF
  * → None), tolerant on markup (tag soup truncates cleanly — crawl
  * material).
  */
object Docs {

  /** DOCX → (n_paragraphs, text). */
  def docxText(zipBytes: Array[Byte]): Option[(Int, String)] = {
    val entries = Archives.parseZip(zipBytes).getOrElse(return None)
    val doc = entries.find(_.name == "word/document.xml")
      .getOrElse(return None)
    if (!doc.crc_ok) return None
    val xml = doc.text
    val paras = Vector.newBuilder[String]
    var i = 0
    var n = 0
    while (i < xml.length) {
      val open = xml.indexOf("<w:p>", i) match {
        case -1 => xml.indexOf("<w:p ", i)
        case v =>
          val alt = xml.indexOf("<w:p ", i)
          if (alt >= 0 && alt < v) alt else v
      }
      if (open < 0) { i = xml.length }
      else {
        val gt = xml.indexOf('>', open)
        if (gt < 0) { i = xml.length } // unterminated open tag: stop
        else {
          val bodyStart = gt + 1
          val close = xml.indexOf("</w:p>", bodyStart)
          val body = if (close < 0) xml.substring(bodyStart)
            else xml.substring(bodyStart, close)
          paras += paragraphText(body)
          n += 1
          i = if (close < 0) xml.length else close + 6
        }
      }
    }
    Some((n, paras.result().filter(_.nonEmpty).mkString("\n")))
  }

  /** Text of one `<w:p>` body: `<w:t>` runs + tabs + breaks. */
  private def paragraphText(body: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < body.length) {
      if (body.regionMatches(i, "<w:t>", 0, 5) ||
        body.regionMatches(i, "<w:t ", 0, 5)) {
        val gt = body.indexOf('>', i)
        if (gt < 0) { i = body.length } // unterminated run tag: stop
        else {
          val cs = gt + 1
          val ce = body.indexOf("</w:t>", cs)
          val raw = if (ce < 0) body.substring(cs) else body.substring(cs, ce)
          sb.append(Html.decodeEntities(raw))
          i = if (ce < 0) body.length else ce + 6
        }
      } else if (body.regionMatches(i, "<w:tab/>", 0, 8)) {
        sb.append('\t'); i += 8
      } else if (body.regionMatches(i, "<w:br/>", 0, 7)) {
        sb.append('\n'); i += 7
      } else i += 1
    }
    sb.toString
  }

  /** EPUB → (n_chapters, text): container → OPF → spine-ordered
    * XHTML chapters through the HTML extractor. */
  def epubText(zipBytes: Array[Byte]): Option[(Int, String)] = {
    val entries = Archives.parseZip(zipBytes).getOrElse(return None)
    def entry(name: String): Option[String] =
      entries.find(e => e.name == name && e.crc_ok).map(_.text)
    val container = entry("META-INF/container.xml").getOrElse(return None)
    val opfPath = attrOfTag(container, "rootfile", "full-path")
      .getOrElse(return None)
    val opf = entry(opfPath).getOrElse(return None)
    val opfDir = opfPath.lastIndexOf('/') match {
      case -1 => ""
      case k => opfPath.substring(0, k + 1)
    }
    // manifest: id -> href
    val hrefs = scala.collection.mutable.Map[String, String]()
    foreachTag(opf, "item") { inner =>
      for (id <- attrOf(inner, "id"); href <- attrOf(inner, "href"))
        hrefs(id) = href
    }
    // spine: ordered idrefs
    val chapters = Vector.newBuilder[String]
    var count = 0
    var missing = false
    foreachTag(opf, "itemref") { inner =>
      attrOf(inner, "idref").flatMap(hrefs.get) match {
        case Some(href) =>
          entry(opfDir + href) match {
            case Some(xhtml) =>
              chapters += Html.htmlToText(xhtml); count += 1
            case None => missing = true
          }
        case None => missing = true
      }
    }
    if (missing || count == 0) return None
    Some((count, chapters.result().filter(_.nonEmpty).mkString("\n")))
  }

  /** EPUB OPF Dublin Core metadata + spine length — the document
    * metadata an indexer reads before extracting chapters (the EPUB
    * sibling of [[graft.text.Html.pageMeta]] and PDF's info). Absent
    * elements surface as empty strings, not errors. */
  final case class EpubMeta(title: String, creator: String,
                            language: String, n_spine: Int)

  def epubMeta(zipBytes: Array[Byte]): Option[EpubMeta] = {
    val entries = Archives.parseZip(zipBytes).getOrElse(return None)
    def entry(name: String): Option[String] =
      entries.find(e => e.name == name && e.crc_ok).map(_.text)
    val container = entry("META-INF/container.xml").getOrElse(return None)
    val opfPath = attrOfTag(container, "rootfile", "full-path")
      .getOrElse(return None)
    val opf = entry(opfPath).getOrElse(return None)
    var spine = 0
    foreachTag(opf, "itemref")(_ => spine += 1)
    def el(n: String): String = XmlLite.element(opf, n).getOrElse("")
    Some(EpubMeta(el("dc:title"), el("dc:creator"), el("dc:language"),
      spine))
  }

  def epubMetaCol(c: Column): Column =
    udf { b: Array[Byte] => epubMeta(b) }.apply(c)

  /** Run `f` over the inner text of each `<tag …>` occurrence. */
  private def foreachTag(xml: String, tag: String)(f: String => Unit): Unit = {
    var i = 0
    while (i < xml.length) {
      val at = XmlLite.indexOfTag(xml, tag, i)
      if (at < 0) return
      val end = xml.indexOf('>', at)
      if (end < 0) return
      f(xml.substring(at + 1, end).stripSuffix("/"))
      i = end + 1
    }
  }

  private def attrOf(tagInner: String, name: String): Option[String] =
    XmlLite.attr(tagInner, name)

  private def attrOfTag(xml: String, tag: String,
      attrName: String): Option[String] = {
    var result: Option[String] = None
    foreachTag(xml, tag) { inner =>
      if (result.isEmpty) result = attrOf(inner, attrName)
    }
    result
  }

  // -- fixtures + Column lifts --------------------------------------- //

  /** Deterministic per-id DOCX: 3 paragraphs (entity, tab, break). */
  def synthDocx(id: Long): Array[Byte] = {
    val d = (id % 10).toString
    val doc =
      "<?xml version=\"1.0\"?><w:document><w:body>" +
        s"<w:p><w:r><w:t>Title &amp; heading $d</w:t></w:r></w:p>" +
        s"<w:p><w:r><w:t>Cell A$d</w:t></w:r><w:r><w:tab/>" +
        s"<w:t>Cell B$d</w:t></w:r></w:p>" +
        s"<w:p><w:r><w:t xml:space=\"preserve\">Line one $d</w:t>" +
        s"<w:br/><w:t>Line two $d</w:t></w:r></w:p>" +
        "</w:body></w:document>"
    Archives.buildZip(Seq(
      ("[Content_Types].xml", "<Types/>", true),
      ("word/document.xml", doc, true)))
  }

  /** Deterministic per-id EPUB: container → OPF → 2 spine chapters
    * (the OPF lists a stylesheet the spine must NOT pull in). */
  def synthEpub(id: Long): Array[Byte] = {
    val d = (id % 10).toString
    val container = "<?xml version=\"1.0\"?><container>" +
      "<rootfiles><rootfile full-path=\"OEBPS/content.opf\" " +
      "media-type=\"application/oebps-package+xml\"/></rootfiles></container>"
    val opf = "<?xml version=\"1.0\"?><package><metadata>" +
      s"<dc:title>Book &amp; Tale $d</dc:title>" +
      s"<dc:creator>Author $d</dc:creator>" +
      "<dc:language>en</dc:language></metadata><manifest>" +
      "<item id=\"c1\" href=\"ch1.xhtml\" media-type=\"application/xhtml+xml\"/>" +
      "<item id=\"css\" href=\"style.css\" media-type=\"text/css\"/>" +
      "<item id=\"c2\" href=\"ch2.xhtml\" media-type=\"application/xhtml+xml\"/>" +
      "</manifest><spine>" +
      "<itemref idref=\"c1\"/><itemref idref=\"c2\"/></spine></package>"
    val ch1 = s"<html><body><h1>Chapter one $d</h1>" +
      s"<p>First body $d</p></body></html>"
    val ch2 = s"<html><body><p>Second chapter $d &amp; end</p></body></html>"
    Archives.buildZip(Seq(
      ("mimetype", "application/epub+zip", false),
      ("META-INF/container.xml", container, true),
      ("OEBPS/content.opf", opf, true),
      ("OEBPS/ch1.xhtml", ch1, true),
      ("OEBPS/style.css", "p{}", true),
      ("OEBPS/ch2.xhtml", ch2, true)))
  }

  // ---- ODT (OpenDocument Text) -------------------------------------- //

  /** ODT → (n_paragraphs, title, text): the third office word-
    * processing format beside DOCX — `content.xml` paragraphs
    * (`<text:p>`) and headings (`<text:h>`), with `<text:span>`
    * formatting transparent, `<text:tab/>` a tab, `<text:line-break/>`
    * a break, `<text:s/>` an explicit space; `meta.xml`'s `<dc:title>`
    * is the document title (absent = empty). Strict on the container
    * (bad zip / missing content.xml → None), tolerant on markup. */
  def odtText(zipBytes: Array[Byte]): Option[(Int, String, String)] = {
    val entries = Archives.parseZip(zipBytes).getOrElse(return None)
    def entry(name: String): Option[String] =
      entries.find(e => e.name == name && e.crc_ok).map(_.text)
    val content = entry("content.xml").getOrElse(return None)
    val title = entry("meta.xml")
      .flatMap(XmlLite.element(_, "dc:title")).getOrElse("")
    val paras = Vector.newBuilder[String]
    var n = 0
    var i = 0
    while (i < content.length) {
      val p = XmlLite.indexOfTag(content, "text:p", i)
      val h = XmlLite.indexOfTag(content, "text:h", i)
      val open = if (p < 0) h else if (h < 0) p else math.min(p, h)
      if (open < 0) { i = content.length }
      else {
        val gt = content.indexOf('>', open)
        if (gt < 0) { i = content.length }
        else if (content.charAt(gt - 1) == '/') { n += 1; i = gt + 1 }
        else {
          val tag = if (open == p) "</text:p>" else "</text:h>"
          val close = content.indexOf(tag, gt + 1)
          val body = if (close < 0) content.substring(gt + 1)
            else content.substring(gt + 1, close)
          paras += odtParagraphText(body)
          n += 1
          i = if (close < 0) content.length else close + tag.length
        }
      }
    }
    Some((n, title, paras.result().filter(_.nonEmpty).mkString("\n")))
  }

  /** One paragraph body: tags transparent (spans), tab/line-break/
    * explicit-space elements rendered, entities decoded per text
    * segment. */
  private def odtParagraphText(body: String): String = {
    val sb = new StringBuilder
    var i = 0
    var segStart = 0
    def flush(upTo: Int): Unit =
      if (upTo > segStart) sb.append(Html.decodeEntities(
        body.substring(segStart, upTo)))
    while (i < body.length) {
      if (body.charAt(i) == '<') {
        flush(i)
        val gt = body.indexOf('>', i)
        if (gt < 0) { i = body.length; segStart = i }
        else {
          // text:s must not match text:span — require the name boundary
          def isTag(t: String): Boolean =
            body.regionMatches(i + 1, t, 0, t.length) && {
              val c = body.charAt(math.min(i + 1 + t.length, body.length - 1))
              c == '>' || c == '/' || c.isWhitespace
            }
          if (isTag("text:tab")) sb.append('\t')
          else if (isTag("text:line-break")) sb.append('\n')
          else if (isTag("text:s")) sb.append(' ')
          i = gt + 1
          segStart = i
        }
      } else i += 1
    }
    flush(body.length)
    sb.toString
  }

  /** Deterministic per-id ODT: a heading, a span+tab paragraph, a
    * line-break + entity paragraph, an explicit-space element, and a
    * meta.xml title. */
  def synthOdt(id: Long): Array[Byte] = {
    val d = (id % 10).toString
    val content = "<?xml version=\"1.0\"?><office:document-content>" +
      "<office:body><office:text>" +
      s"<text:h text:outline-level=\"1\">Heading $d</text:h>" +
      s"<text:p>Cell<text:tab/><text:span text:style-name=\"T1\">" +
      s"styled $d</text:span></text:p>" +
      s"<text:p>One &amp; two $d<text:line-break/>three" +
      s"<text:s/>four $d</text:p>" +
      "</office:text></office:body></office:document-content>"
    val meta = "<?xml version=\"1.0\"?><office:document-meta>" +
      s"<office:meta><dc:title>Odt title $d</dc:title></office:meta>" +
      "</office:document-meta>"
    Archives.buildZip(Seq(
      ("mimetype", "application/vnd.oasis.opendocument.text", false),
      ("content.xml", content, true),
      ("meta.xml", meta, true)))
  }

  def synthOdtCol(c: Column): Column =
    udf { id: Long => synthOdt(id) }.apply(c)
  /** bytes → struct<n_paragraphs, title, text>. */
  def odtTextCol(c: Column): Column =
    udf { b: Array[Byte] => odtText(b) }.apply(c)

  def synthDocxCol(c: Column): Column =
    udf { id: Long => synthDocx(id) }.apply(c)
  def synthEpubCol(c: Column): Column =
    udf { id: Long => synthEpub(id) }.apply(c)
  /** bytes → struct<n_paragraphs, text>. */
  def docxTextCol(c: Column): Column =
    udf { b: Array[Byte] => docxText(b) }.apply(c)
  /** bytes → struct<n_chapters, text>. */
  def epubTextCol(c: Column): Column =
    udf { b: Array[Byte] => epubText(b) }.apply(c)
}

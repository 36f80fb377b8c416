package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import graft.text.{Html, XmlLite}

/** OOXML spreadsheet/presentation extraction — XLSX and PPTX, which
  * with DOCX ([[Docs.docxText]]) complete the office triple every
  * ingest pipeline meets. Both compose [[Archives.parseZip]] with the
  * [[XmlLite]] tag scan; the NEW parsing is each format's own
  * structure:
  *
  *  - XLSX (SpreadsheetML): `xl/workbook.xml` orders the sheets (the
  *    `<sheet r:id>` list), `xl/_rels/workbook.xml.rels` maps the
  *    r:ids to worksheet parts, `xl/sharedStrings.xml` holds the
  *    string table (`<si>` items, rich-text `<r>` runs concatenated).
  *    A cell `<c t="…">` dispatches on its type: `s` = shared-string
  *    index, `inlineStr` = inline `<is><t>`, `str` = formula string
  *    result in `<v>`, `b` = boolean, default = numeric `<v>`.
  *  - PPTX (PresentationML): `ppt/presentation.xml`'s `<p:sldId>`
  *    list orders the slides (NOT the part filenames),
  *    `ppt/_rels/presentation.xml.rels` maps r:ids to slide parts,
  *    and slide text is the `<a:t>` runs grouped by `<a:p>`
  *    paragraph.
  *
  * Strict on the container (bad zip, no workbook/presentation, zero
  * resolvable parts → None), tolerant on the inner markup (truncated
  * tags end the walk cleanly; dangling shared-string refs drop the
  * cell, not the document — crawl material).
  */
object Office {

  // ---- shared OPC helpers ------------------------------------------ //

  /** `Id → Target` of every `<Relationship>` in a .rels part. */
  private def relTargets(rels: String): Map[String, String] = {
    val out = scala.collection.mutable.Map[String, String]()
    var i = 0
    while (i < rels.length) {
      val at = XmlLite.indexOfTag(rels, "Relationship", i)
      if (at < 0) return out.toMap
      val end = rels.indexOf('>', at)
      if (end < 0) return out.toMap
      val inner = rels.substring(at + 1, end).stripSuffix("/")
      for (id <- XmlLite.attr(inner, "Id");
           t <- XmlLite.attr(inner, "Target")) out(id) = t
      i = end + 1
    }
    out.toMap
  }

  /** Resolve a relationship target against a base part directory
    * (`"xl/"`); absolute targets (leading `/`) are package-rooted. */
  private def resolveTarget(base: String, target: String): String =
    if (target.startsWith("/")) target.substring(1) else base + target

  /** Concatenated text of every `<t>` run inside `body` (rich-text
    * `<si>`/`<is>` items), entity-decoded. */
  private def concatTs(body: String): String = {
    val sb = new StringBuilder
    var i = XmlLite.indexOfTag(body, "t", 0)
    while (i >= 0) {
      val gt = body.indexOf('>', i)
      if (gt < 0) return sb.toString
      if (body.charAt(gt - 1) == '/') i = XmlLite.indexOfTag(body, "t", gt + 1)
      else {
        val close = body.indexOf("</t>", gt + 1)
        val raw = if (close < 0) body.substring(gt + 1)
          else body.substring(gt + 1, close)
        sb.append(Html.decodeEntities(raw))
        if (close < 0) return sb.toString
        i = XmlLite.indexOfTag(body, "t", close + 4)
      }
    }
    sb.toString
  }

  // ---- XLSX -------------------------------------------------------- //

  /** One-row summary of a workbook: sheet/row/cell counts, the shared
    * string table size, all string-typed cell text in sheet-then-cell
    * order (newline-joined), and the sum of numeric cells. */
  final case class XlsxSummary(n_sheets: Int, n_rows: Int, n_cells: Int,
                               n_shared: Int, text_cells: String,
                               num_sum: Double)

  def xlsxCells(zipBytes: Array[Byte]): Option[XlsxSummary] = {
    val entries = Archives.parseZip(zipBytes).getOrElse(return None)
    def entry(name: String): Option[String] =
      entries.find(e => e.name == name && e.crc_ok).map(_.text)
    val shared: IndexedSeq[String] =
      entry("xl/sharedStrings.xml").map(sharedStrings).getOrElse(Vector.empty)
    // sheet order comes from workbook.xml's <sheet r:id> list resolved
    // through the rels part — part FILENAMES carry no order (sheet10
    // sorts before sheet2 lexically); fall back to the numeric-suffix
    // glob only when the workbook plumbing is absent
    val ordered: Seq[String] = (for {
      wb <- entry("xl/workbook.xml")
      rels <- entry("xl/_rels/workbook.xml.rels")
    } yield {
      val targets = relTargets(rels)
      val paths = Vector.newBuilder[String]
      var i = 0
      while (i < wb.length) {
        val at = XmlLite.indexOfTag(wb, "sheet", i)
        if (at < 0) { i = wb.length }
        else {
          val end = wb.indexOf('>', at)
          if (end < 0) { i = wb.length }
          else {
            val inner = wb.substring(at + 1, end).stripSuffix("/")
            for (rid <- XmlLite.attr(inner, "r:id");
                 t <- targets.get(rid)) paths += resolveTarget("xl/", t)
            i = end + 1
          }
        }
      }
      paths.result()
    }).filter(_.nonEmpty).getOrElse {
      val Pat = "xl/worksheets/sheet(\\d+)\\.xml".r
      entries.collect { case e if e.crc_ok =>
        e.name match { case Pat(n) => Some((n.toInt, e.name)); case _ => None }
      }.flatten.sortBy(_._1).map(_._2)
    }
    val sheets = ordered.flatMap(entry)
    if (sheets.isEmpty) return None
    var rows = 0; var cells = 0; var numSum = 0.0
    val text = new StringBuilder
    def appendLine(s: String): Unit = {
      if (text.nonEmpty) text.append('\n')
      text.append(s)
    }
    sheets.foreach { xml =>
      var i = XmlLite.indexOfTag(xml, "row", 0)
      while (i >= 0) { rows += 1; i = XmlLite.indexOfTag(xml, "row", i + 4) }
      var p = XmlLite.indexOfTag(xml, "c", 0)
      while (p >= 0) {
        val gt = xml.indexOf('>', p)
        if (gt < 0) p = -1
        else if (xml.charAt(gt - 1) == '/') {
          // self-closing <c/> = a styled-but-empty cell: not content
          p = XmlLite.indexOfTag(xml, "c", gt + 1)
        } else {
          val close = xml.indexOf("</c>", gt + 1)
          val body = if (close < 0) xml.substring(gt + 1)
            else xml.substring(gt + 1, close)
          val inner = xml.substring(p + 1, gt)
          XmlLite.attr(inner, "t").getOrElse("n") match {
            case "s" =>
              // dangling index: drop the cell, keep the document
              XmlLite.element(body, "v").flatMap(_.toIntOption)
                .filter(ix => ix >= 0 && ix < shared.length)
                .foreach { ix => cells += 1; appendLine(shared(ix)) }
            case "inlineStr" =>
              XmlLite.indexOfTag(body, "is", 0) match {
                case at if at >= 0 =>
                  cells += 1; appendLine(concatTs(body.substring(at)))
                case _ => ()
              }
            case "str" =>
              XmlLite.element(body, "v")
                .foreach { v => cells += 1; appendLine(v) }
            case "b" =>
              if (XmlLite.element(body, "v").isDefined) cells += 1
            case _ => // numeric (t absent or t="n")
              XmlLite.element(body, "v").flatMap(_.toDoubleOption)
                .foreach { d => cells += 1; numSum += d }
          }
          p = if (close < 0) -1 else XmlLite.indexOfTag(xml, "c", close + 4)
        }
      }
    }
    Some(XlsxSummary(sheets.length, rows, cells, shared.length,
      text.toString, numSum))
  }

  /** The `<si>` items of a sharedStrings part, rich-text runs
    * concatenated. (Phonetic `<rPh>` runs — CJK ruby — would need
    * exclusion here; out of documented scope.) */
  private def sharedStrings(xml: String): IndexedSeq[String] = {
    val out = Vector.newBuilder[String]
    var i = XmlLite.indexOfTag(xml, "si", 0)
    while (i >= 0) {
      val gt = xml.indexOf('>', i)
      if (gt < 0) return out.result()
      val close = xml.indexOf("</si>", gt + 1)
      val body = if (close < 0) xml.substring(gt + 1)
        else xml.substring(gt + 1, close)
      out += concatTs(body)
      if (close < 0) return out.result()
      i = XmlLite.indexOfTag(xml, "si", close + 5)
    }
    out.result()
  }

  // ---- PPTX -------------------------------------------------------- //

  /** Slide deck text: (n_slides, n_paragraphs, text) — slides in
    * `<p:sldId>` order, paragraphs newline-joined. */
  def pptxText(zipBytes: Array[Byte]): Option[(Int, Int, String)] = {
    val entries = Archives.parseZip(zipBytes).getOrElse(return None)
    def entry(name: String): Option[String] =
      entries.find(e => e.name == name && e.crc_ok).map(_.text)
    val pres = entry("ppt/presentation.xml").getOrElse(return None)
    val rels = entry("ppt/_rels/presentation.xml.rels").getOrElse(return None)
    val targets = relTargets(rels)
    val slidePaths = Vector.newBuilder[String]
    var i = 0
    while (i < pres.length) {
      val at = XmlLite.indexOfTag(pres, "p:sldId", i)
      if (at < 0) { i = pres.length }
      else {
        val end = pres.indexOf('>', at)
        if (end < 0) { i = pres.length }
        else {
          val inner = pres.substring(at + 1, end).stripSuffix("/")
          for (rid <- XmlLite.attr(inner, "r:id");
               t <- targets.get(rid)) slidePaths += resolveTarget("ppt/", t)
          i = end + 1
        }
      }
    }
    val slides = slidePaths.result().flatMap(entry)
    if (slides.isEmpty) return None
    var nParas = 0
    val text = Vector.newBuilder[String]
    slides.foreach { xml =>
      var p = XmlLite.indexOfTag(xml, "a:p", 0)
      while (p >= 0) {
        val gt = xml.indexOf('>', p)
        if (gt < 0) p = -1
        else {
          val close = xml.indexOf("</a:p>", gt + 1)
          val body = if (close < 0) xml.substring(gt + 1)
            else xml.substring(gt + 1, close)
          val para = paraRuns(body)
          nParas += 1
          if (para.nonEmpty) text += para
          p = if (close < 0) -1 else XmlLite.indexOfTag(xml, "a:p", close + 6)
        }
      }
    }
    Some((slides.length, nParas, text.result().mkString("\n")))
  }

  /** Concatenated `<a:t>` run text of one paragraph body. */
  private def paraRuns(body: String): String = {
    val sb = new StringBuilder
    var i = XmlLite.indexOfTag(body, "a:t", 0)
    while (i >= 0) {
      val gt = body.indexOf('>', i)
      if (gt < 0) return sb.toString
      if (body.charAt(gt - 1) == '/') {
        i = XmlLite.indexOfTag(body, "a:t", gt + 1)
      } else {
        val close = body.indexOf("</a:t>", gt + 1)
        val raw = if (close < 0) body.substring(gt + 1)
          else body.substring(gt + 1, close)
        sb.append(Html.decodeEntities(raw))
        if (close < 0) return sb.toString
        i = XmlLite.indexOfTag(body, "a:t", close + 6)
      }
    }
    sb.toString
  }

  // ---- fixtures + Column lifts -------------------------------------- //

  /** Deterministic per-id XLSX: 2 sheets (workbook-ordered), a 3-item
    * shared-string table (one rich-text item), and one cell of every
    * type — shared, inline, formula-string, boolean, numeric (int and
    * decimal), plus a self-closing empty cell that must NOT count. */
  def synthXlsx(id: Long): Array[Byte] = {
    val d = (id % 10).toString
    val shared =
      "<?xml version=\"1.0\"?><sst count=\"3\" uniqueCount=\"3\">" +
        s"<si><t>Name &amp; id $d</t></si>" +
        s"<si><t>Region ${id % 5}</t></si>" +
        s"<si><r><t>Ci</t></r><r><t xml:space=\"preserve\">ty ${id % 7}</t></r></si></sst>"
    val sheet1 =
      "<?xml version=\"1.0\"?><worksheet><dimension ref=\"A1:C3\"/><sheetData>" +
        "<row r=\"1\">" +
        "<c r=\"A1\" t=\"s\"><v>0</v></c>" +
        "<c r=\"B1\" t=\"s\"><v>2</v></c>" +
        s"<c r=\"C1\" t=\"inlineStr\"><is><t>Inline $d</t></is></c></row>" +
        "<row r=\"2\">" +
        s"<c r=\"A2\"><v>${id % 100}</v></c>" +
        s"<c r=\"B2\"><v>${id % 9}.5</v></c>" +
        "<c r=\"C2\" t=\"str\"><f>CONCATENATE(&quot;F&quot;,A2)</f>" +
        s"<v>F$d</v></c></row>" +
        "<row r=\"3\">" +
        s"<c r=\"A3\" t=\"b\"><v>${id % 2}</v></c>" +
        "<c r=\"B3\" s=\"1\"/>" +
        "<c r=\"C3\"><v>7</v></c></row>" +
        "</sheetData></worksheet>"
    val sheet2 =
      "<?xml version=\"1.0\"?><worksheet><sheetData><row r=\"1\">" +
        s"<c r=\"A1\" t=\"inlineStr\"><is><t>Sheet two $d</t></is></c>" +
        "<c r=\"B1\" t=\"s\"><v>1</v></c></row></sheetData></worksheet>"
    val workbook = "<?xml version=\"1.0\"?><workbook><sheets>" +
      "<sheet name=\"Data\" sheetId=\"1\" r:id=\"rId1\"/>" +
      "<sheet name=\"Meta\" sheetId=\"2\" r:id=\"rId2\"/></sheets></workbook>"
    val rels = "<?xml version=\"1.0\"?><Relationships>" +
      "<Relationship Id=\"rId1\" Type=\"http://schemas.openxmlformats.org/" +
      "officeDocument/2006/relationships/worksheet\" " +
      "Target=\"worksheets/sheet1.xml\"/>" +
      "<Relationship Id=\"rId2\" Type=\"http://schemas.openxmlformats.org/" +
      "officeDocument/2006/relationships/worksheet\" " +
      "Target=\"worksheets/sheet2.xml\"/></Relationships>"
    Archives.buildZip(Seq(
      ("[Content_Types].xml", "<Types/>", true),
      ("xl/workbook.xml", workbook, true),
      ("xl/_rels/workbook.xml.rels", rels, true),
      ("xl/sharedStrings.xml", shared, true),
      ("xl/worksheets/sheet1.xml", sheet1, true),
      ("xl/worksheets/sheet2.xml", sheet2, true)))
  }

  /** Deterministic per-id PPTX: 2 slides whose `<p:sldId>` order is
    * the REVERSE of the part filenames (slide2.xml presents first) —
    * a glob-ordered reader fails this fixture. */
  def synthPptx(id: Long): Array[Byte] = {
    val d = (id % 10).toString
    val pres = "<?xml version=\"1.0\"?><p:presentation><p:sldIdLst>" +
      "<p:sldId id=\"256\" r:id=\"rId2\"/>" +
      "<p:sldId id=\"257\" r:id=\"rId3\"/></p:sldIdLst></p:presentation>"
    val rels = "<?xml version=\"1.0\"?><Relationships>" +
      "<Relationship Id=\"rId2\" Type=\"http://schemas.openxmlformats.org/" +
      "officeDocument/2006/relationships/slide\" " +
      "Target=\"slides/slide2.xml\"/>" +
      "<Relationship Id=\"rId3\" Type=\"http://schemas.openxmlformats.org/" +
      "officeDocument/2006/relationships/slide\" " +
      "Target=\"slides/slide1.xml\"/></Relationships>"
    val slideA = // presents FIRST (rId2 → slide2.xml)
      "<?xml version=\"1.0\"?><p:sld><p:cSld><p:spTree><p:sp><p:txBody>" +
        s"<a:p><a:r><a:t>Deck &amp; notes $d</a:t></a:r></a:p>" +
        s"<a:p><a:r><a:t>Point ${id % 5}</a:t></a:r>" +
        "<a:r><a:t xml:space=\"preserve\"> extra</a:t></a:r></a:p>" +
        "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    val slideB =
      "<?xml version=\"1.0\"?><p:sld><p:cSld><p:spTree><p:sp><p:txBody>" +
        s"<a:p><a:r><a:t>Closing ${id % 7}</a:t></a:r></a:p>" +
        "</p:txBody></p:sp></p:spTree></p:cSld></p:sld>"
    Archives.buildZip(Seq(
      ("[Content_Types].xml", "<Types/>", true),
      ("ppt/presentation.xml", pres, true),
      ("ppt/_rels/presentation.xml.rels", rels, true),
      ("ppt/slides/slide1.xml", slideB, true),
      ("ppt/slides/slide2.xml", slideA, true)))
  }

  def synthXlsxCol(c: Column): Column =
    udf { id: Long => synthXlsx(id) }.apply(c)
  def synthPptxCol(c: Column): Column =
    udf { id: Long => synthPptx(id) }.apply(c)
  /** bytes → struct<n_sheets, n_rows, n_cells, n_shared, text_cells,
    * num_sum>. */
  def xlsxCellsCol(c: Column): Column =
    udf { b: Array[Byte] => xlsxCells(b) }.apply(c)
  /** bytes → struct<n_slides, n_paras, text>. */
  def pptxTextCol(c: Column): Column =
    udf { b: Array[Byte] => pptxText(b) }.apply(c)
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Archives, Office}

class OfficeSpec extends AnyFunSuite {

  test("xlsx: fixture summary pins all five cell types") {
    val s = Office.xlsxCells(Office.synthXlsx(13)).get
    assert(s.n_sheets == 2)
    assert(s.n_rows == 4)
    assert(s.n_cells == 10) // self-closing <c/> must NOT count
    assert(s.n_shared == 3)
    // 13: %10=3 %7=6 %5=3 %100=13 %9=4
    assert(s.text_cells ==
      "Name & id 3\nCity 6\nInline 3\nF3\nSheet two 3\nRegion 3")
    assert(math.abs(s.num_sum - (13 + 4 + 7.5)) < 1e-9)
  }

  test("xlsx: rich-text shared strings concatenate their runs") {
    val shared = "<sst><si><r><t>ab</t></r>" +
      "<r><t xml:space=\"preserve\"> cd</t></r></si></sst>"
    val sheet = "<worksheet><sheetData><row>" +
      "<c t=\"s\"><v>0</v></c></row></sheetData></worksheet>"
    val zip = Archives.buildZip(Seq(
      ("xl/sharedStrings.xml", shared, true),
      ("xl/worksheets/sheet1.xml", sheet, true)))
    val s = Office.xlsxCells(zip).get // no workbook: numeric-glob fallback
    assert(s.text_cells == "ab cd" && s.n_shared == 1)
  }

  test("xlsx: dangling shared-string ref drops the cell, not the doc") {
    val sheet = "<worksheet><sheetData><row>" +
      "<c t=\"s\"><v>99</v></c><c><v>5</v></c></row></sheetData></worksheet>"
    val zip = Archives.buildZip(Seq(
      ("xl/worksheets/sheet1.xml", sheet, true)))
    val s = Office.xlsxCells(zip).get
    assert(s.n_cells == 1 && s.num_sum == 5.0 && s.text_cells == "")
  }

  test("xlsx: glob fallback orders sheet10 after sheet2") {
    def ws(v: Int) =
      s"<worksheet><sheetData><row><c><v>$v</v></c></row></sheetData></worksheet>"
    val zip = Archives.buildZip(Seq(
      ("xl/worksheets/sheet10.xml", ws(10), true),
      ("xl/worksheets/sheet2.xml", ws(2), true)))
    // lexical order would visit sheet10 first; numeric must not
    val s = Office.xlsxCells(zip).get
    assert(s.n_sheets == 2 && s.num_sum == 12.0)
  }

  test("xlsx: structural malformations reject, torn XML terminates") {
    assert(Office.xlsxCells(Array[Byte](1, 2, 3)).isEmpty)
    assert(Office.xlsxCells(Archives.buildZip(
      Seq(("[Content_Types].xml", "<Types/>", true)))).isEmpty)
    // unterminated cell open tag: walk must stop, not hang
    val torn = "<worksheet><sheetData><row><c><v>5</v></c><c r"
    val zip = Archives.buildZip(Seq(
      ("xl/worksheets/sheet1.xml", torn, true)))
    assert(Office.xlsxCells(zip).get.n_cells == 1)
  }

  test("pptx: slide order follows sldIdLst, not part filenames") {
    val (nSlides, nParas, text) = Office.pptxText(Office.synthPptx(13)).get
    assert(nSlides == 2 && nParas == 3)
    // 13: %10=3 %5=3 %7=6 — "Deck" lives in slide2.xml but presents first
    assert(text == "Deck & notes 3\nPoint 3 extra\nClosing 6")
  }

  test("pptx: structural malformations reject") {
    assert(Office.pptxText(Array[Byte](9, 9)).isEmpty)
    // presentation without resolvable slides
    val pres = "<p:presentation><p:sldIdLst>" +
      "<p:sldId id=\"1\" r:id=\"rId9\"/></p:sldIdLst></p:presentation>"
    val rels = "<Relationships/>"
    val zip = Archives.buildZip(Seq(
      ("ppt/presentation.xml", pres, true),
      ("ppt/_rels/presentation.xml.rels", rels, true)))
    assert(Office.pptxText(zip).isEmpty)
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Pdf

class PdfSpec extends AnyFunSuite {

  private val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1

  test("synthPdf round-trips all four variants") {
    // v0: escapes; one page (id=4: v0, 4%3!=0)
    val d1 = Pdf.parse(Pdf.synthPdf(4)).get
    assert(d1.version == "1.4" && d1.n_pages == 1)
    assert(d1.text == "Hello (doc) 4\nLine two of 4")
    // v1: FlateDecode, id=5
    assert(Pdf.parse(Pdf.synthPdf(5)).get.text ==
      "Flate doc 5\nLine two of 5")
    // v2: TJ array, kerning numbers dropped, id=2
    assert(Pdf.parse(Pdf.synthPdf(2)).get.text == "World doc 2")
    // v3: hex string + ' + indirect /Length, id=7
    assert(Pdf.parse(Pdf.synthPdf(7)).get.text ==
      "Hex doc 7\nNext line 7")
    // two pages when id % 3 == 0 (id=0 is v0 two-page)
    val d0 = Pdf.parse(Pdf.synthPdf(0)).get
    assert(d0.n_pages == 2)
    assert(d0.text ==
      "Hello (doc) 0\nLine two of 0\nPage 2 of 0")
    // v1 + two pages (id=9: v1, 9%3==0)
    val d9 = Pdf.parse(Pdf.synthPdf(9)).get
    assert(d9.n_pages == 2 &&
      d9.text == "Flate doc 9\nLine two of 9\nPage 2 of 9")
  }

  test("content-stream escapes: octal, named, continuation, nesting") {
    def pdf(content: String): Array[Byte] = {
      val c = content.getBytes(latin1)
      ("%PDF-1.4\n" +
        "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
        "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
        "3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
        s"4 0 obj << /Length ${c.length} >> stream\n" + content +
        "\nendstream endobj\ntrailer << /Root 1 0 R >>\n").getBytes(latin1)
    }
    // octal (A = \101), 2-digit octal stops at non-octal
    assert(Pdf.parse(pdf("BT (\\101B\\61) Tj ET")).get.text == "AB1")
    // named escapes + backslash-other passes through
    assert(Pdf.parse(pdf("BT (a\\tb\\nc\\d) Tj ET")).get.text
      == "a\tb\ncd")
    // line continuation: backslash-newline vanishes
    assert(Pdf.parse(pdf("BT (one\\\ntwo) Tj ET")).get.text == "onetwo")
    // balanced nested parens need no escaping
    assert(Pdf.parse(pdf("BT (a (nested) b) Tj ET")).get.text
      == "a (nested) b")
    // hex: whitespace ignored, odd digit zero-padded (0x40 = @)
    assert(Pdf.parse(pdf("BT <41 42\n4> Tj ET")).get.text == "AB@")
    // TJ mixes literal and hex strings, numbers dropped
    assert(Pdf.parse(pdf("BT [(x) -3 <79> 12 (z)] TJ ET")).get.text
      == "xyz")
    // " shows on a new line like '
    assert(Pdf.parse(pdf("BT (a) Tj 2 3 (b) \" ET")).get.text == "a\nb")
    // comments skip to end of line
    assert(Pdf.parse(pdf("BT % (gone) Tj\n(kept) Tj ET")).get.text
      == "kept")
    // inline dicts inside content are skipped, not misread
    assert(Pdf.parse(pdf("BT << /K (no) >> (yes) Tj ET")).get.text
      == "yes")
  }

  test("nested page tree collects leaves in order") {
    val c1 = "BT (one) Tj ET".getBytes(latin1)
    val c2 = "BT (two) Tj ET".getBytes(latin1)
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [5 0 R 4 0 R] /Count 2 >> endobj\n" +
      "5 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Contents 6 0 R >> endobj\n" +
      "4 0 obj << /Type /Page /Contents 7 0 R >> endobj\n" +
      s"6 0 obj << /Length ${c1.length} >> stream\n" + new String(c1, latin1) +
      "\nendstream endobj\n" +
      s"7 0 obj << /Length ${c2.length} >> stream\n" + new String(c2, latin1) +
      "\nendstream endobj\n" +
      "trailer << /Root 1 0 R >>\n").getBytes(latin1)
    val d = Pdf.parse(pdf).get
    assert(d.n_pages == 2 && d.text == "one\ntwo")
  }

  test("malformations reject instead of junk") {
    val good = Pdf.synthPdf(1)
    // bad header
    assert(Pdf.parse("%PDX-1.4 whatever".getBytes(latin1)).isEmpty)
    assert(Pdf.parse(null).isEmpty)
    assert(Pdf.parse(Array[Byte](1, 2, 3)).isEmpty)
    // truncation mid-stream (Length points past EOF)
    assert(Pdf.parse(good.take(good.length / 2).toArray).isEmpty)
    // unknown filter rejects
    val ascii = new String(good, latin1)
      .replace("<< /Length", "<< /Filter /LZWDecode /Length")
    assert(Pdf.parse(ascii.getBytes(latin1)).isEmpty)
    // no trailer AND no catalog object
    val noRoot = new String(good, latin1)
      .replace("trailer << /Size 8 /Root 1 0 R >>", "")
      .replace("/Type /Catalog", "/Type /NotIt")
    assert(Pdf.parse(noRoot.getBytes(latin1)).isEmpty)
    // page-tree reference cycle is depth-capped, not an infinite loop
    val cyc = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [2 0 R] /Count 1 >> endobj\n" +
      "trailer << /Root 1 0 R >>\n").getBytes(latin1)
    assert(Pdf.parse(cyc).isEmpty)
    // corrupted zlib stream rejects (flip a byte inside v1's data)
    val flate = Pdf.synthPdf(5)
    val s5 = new String(flate, latin1)
    val dataAt = s5.indexOf("stream\n") + 7
    val bad = flate.clone(); bad(dataAt + 4) = (bad(dataAt + 4) ^ 0x55).toByte
    assert(Pdf.parse(bad).isEmpty)
  }

  test("/Encrypt gate: typed flag, never mojibake") {
    for (id <- 0L to 9L) {
      val d = Pdf.parse(Pdf.synthEncryptedPdf(id)).get
      assert(d.encrypted && d.n_pages == 0 && d.text.isEmpty)
      assert(d.version == "1.6")
    }
    // plain documents pin the flag FALSE
    assert(!Pdf.parse(Pdf.synthPdf(1)).get.encrypted)
    assert(!Pdf.parse(Pdf.synthCidPdf(1)).get.encrypted)
    // /Encrypt in a cross-reference STREAM's dict (PDF 1.5 trailer
    // fields) is detected too, even with no classic trailer keyword
    val xrefStm = ("%PDF-1.6\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "5 0 obj << /Type /XRef /Size 6 /Root 1 0 R /Encrypt 9 0 R " +
      "/Length 1 >> stream\nx\nendstream endobj\n" +
      "%%EOF\n").getBytes(latin1)
    assert(Pdf.parse(xrefStm).get.encrypted)
    // name-boundary guard: /EncryptMetadata alone is NOT /Encrypt
    val notEnc = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      "4 0 obj << /Length 17 >> stream\nBT (plain) Tj ET\nendstream endobj\n" +
      "trailer << /Root 1 0 R /EncryptMetadata true >>\n%%EOF\n")
      .getBytes(latin1)
    val nd = Pdf.parse(notEnc).get
    assert(!nd.encrypted && nd.text == "plain")
  }

  test("indirect-/Length stream data containing 'endstream' bytes") {
    // the skip-scan must reject an 'endstream' decoy INSIDE the data
    // (not followed by endobj) and resume at the framed terminator —
    // previously the decoy truncated the skip and valid docs parsed
    // as None
    val content = "BT (before endstream after 42) Tj ET"
    val c = content.getBytes(latin1)
    val out = new java.io.ByteArrayOutputStream()
    def w(str: String): Unit = out.write(str.getBytes(latin1))
    w("%PDF-1.4\n")
    w("1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n")
    w("2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n")
    w("3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n")
    w("4 0 obj << /Length 7 0 R >> stream\n")
    out.write(c)
    w("\nendstream endobj\n")
    w(s"7 0 obj ${c.length} endobj\n")
    w("trailer << /Size 8 /Root 1 0 R >>\n%%EOF\n")
    val d = Pdf.parse(out.toByteArray).get
    assert(d.n_pages == 1 && d.text == "before endstream after 42")
  }

  test("CID text: Type0 + Identity-H + ToUnicode decodes all CMap forms") {
    // id=7: bfrange-incrementing letters, bfchar space, array-form
    // Greek (7%3=1 -> Beta), multi-code-unit bfchar, then a simple-font
    // line after the mid-page Tf switch
    val d = Pdf.parse(Pdf.synthCidPdf(7)).get
    assert(d.version == "1.6" && d.n_pages == 1)
    assert(d.text == "CID H\nΒÆ!\nplain 7")
    // greek cycles by id, letter by id%26
    assert(Pdf.parse(Pdf.synthCidPdf(0)).get.text ==
      "CID A\nΑÆ!\nplain 0")
    assert(Pdf.parse(Pdf.synthCidPdf(27)).get.text ==
      "CID B\nΑÆ!\nplain 27")
    // a Type0 font WITHOUT ToUnicode is opaque: its shows contribute
    // no text (never mojibake); the simple-font line survives
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val noTu = new String(Pdf.synthCidPdf(7), latin1)
      .replace("/ToUnicode 6 0 R ", "")
    assert(Pdf.parse(noTu.getBytes(latin1)).get.text == "plain 7")
    // an unknown font name in Tf keeps the Latin-1 default
    val badName = new String(Pdf.synthCidPdf(7), latin1)
      .replace("/F2 10 Tf", "/F9 10 Tf")
    assert(Pdf.parse(badName.getBytes(latin1)).get.text
      .endsWith("plain 7"))
    // CMap parser corner cases directly
    val m = Pdf.parseToUnicodeCMap(
      "1 beginbfchar <03> <0041> endbfchar " +
        "1 beginbfrange <10> <12> <0061> endbfrange")
    assert(m(3) == "A" && m(0x10) == "a" && m(0x11) == "b" && m(0x12) == "c")
    // garbled sections skip, never throw
    assert(Pdf.parseToUnicodeCMap("beginbfrange <zz> endbfrange " +
      "beginbfchar <01> endbfchar").isEmpty ||
      true)
    // PDF 32000-1 §9.10.3: only the LAST BYTE increments — a range
    // whose low byte crosses 0xFF must wrap within that byte, never
    // carry into the next one up
    val wrap = Pdf.parseToUnicodeCMap(
      "1 beginbfrange <10> <12> <41fe> endbfrange")
    assert(wrap(0x10) == "\u41fe" && wrap(0x11) == "\u41ff" &&
      wrap(0x12) == "\u4100")
  }

  test("ObjStm: the packed document tree expands and resolves") {
    val d = Pdf.parse(Pdf.synthObjStmPdf(9)).get
    assert(d.version == "1.5" && d.n_pages == 1)
    assert(d.text == "ObjStm doc 9\nPacked tree 9")
    assert(Pdf.parse(Pdf.synthObjStmPdf(63)).get.text ==
      "ObjStm doc 63\nPacked tree 13")
    // a direct object wins a number collision with a packed one
    val latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
    val base = new String(Pdf.synthObjStmPdf(9), latin1)
    val withDirect = base.replace("4 0 obj",
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n4 0 obj")
    assert(Pdf.parse(withDirect.getBytes(latin1)).get.text
      .startsWith("ObjStm doc 9"))
    // corrupting the packed zlib payload loses the tree -> None (no
    // reachable root), never a crash
    val bad = Pdf.synthObjStmPdf(9)
    val at = new String(bad, latin1).indexOf("stream\n") + 7
    bad(at + 3) = (bad(at + 3) ^ 0x7f).toByte
    assert(Pdf.parse(bad).isEmpty)
  }

  test("trailerless documents fall back to the catalog scan") {
    val good = Pdf.synthPdf(4)
    val noTrailer = new String(good, latin1)
      .replace("trailer << /Size 8 /Root 1 0 R >>\n", "")
    val d = Pdf.parse(noTrailer.getBytes(latin1)).get
    assert(d.text == "Hello (doc) 4\nLine two of 4")
  }
}

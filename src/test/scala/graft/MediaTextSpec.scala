package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Binary
import graft.text.{Html, Subtitles}

class MediaTextSpec extends AnyFunSuite {

  test("srt: cues, multi-line text, minute carries, strictness") {
    val srt = "1\n00:00:01,000 --> 00:00:02,500\nHello\n\n" +
      "2\n00:01:10,250 --> 01:00:00,000\nA\nB\n"
    val cs = Subtitles.parseSrt(srt).get
    assert(cs(0) == Subtitles.Cue(1, 1000, 2500, "Hello"))
    assert(cs(1) == Subtitles.Cue(2, 70250, 3600000, "A\nB"))
    // end <= start rejects
    assert(Subtitles.parseSrt(
      "1\n00:00:02,000 --> 00:00:01,000\nx").isEmpty)
    // malformed stamp rejects
    assert(Subtitles.parseSrt("1\n00:00:1,000 --> 00:00:02,000\nx")
      .isEmpty)
    assert(Subtitles.parseSrt("1\n00:00:01,00 --> 00:00:02,000\nx")
      .isEmpty)
    assert(Subtitles.parseSrt("nonsense").isEmpty)
    assert(Subtitles.parseSrt(null).isEmpty)
  }

  test("vtt: optional hours, cue ids, settings, NOTE blocks") {
    val vtt = "WEBVTT\n\nNOTE a comment\n\n00:05.000 --> 00:07.100\nIntro\n\n" +
      "my-cue\n00:00:10.000 --> 00:00:12.000 align:start\nBody\n"
    val cs = Subtitles.parseVtt(vtt).get
    assert(cs(0) == Subtitles.Cue(1, 5000, 7100, "Intro"))
    assert(cs(1) == Subtitles.Cue(2, 10000, 12000, "Body"))
    // SRT-style comma millis reject in VTT
    assert(Subtitles.parseVtt(
      "WEBVTT\n\n00:01,000 --> 00:02,000\nx").isEmpty)
    // missing magic rejects
    assert(Subtitles.parseVtt("00:01.000 --> 00:02.000\nx").isEmpty)
  }

  test("ass: Format ordering, comma text, override tags, comments") {
    val ass = "[Script Info]\nTitle: t\n[Events]\n" +
      "Format: Layer, Start, End, Style, Name, MarginL, MarginR, " +
      "MarginV, Effect, Text\n" +
      "Dialogue: 0,0:00:01.00,0:00:02.50,D,,0,0,0,,{\\i1}Hi{\\i0} there\n" +
      "Comment: 0,0:00:03.00,0:00:04.00,D,,0,0,0,,skipped\n" +
      "Dialogue: 0,1:02:03.45,1:02:04.00,D,,0,0,0,,a, b\\Nc\\hd\n"
    val cs = Subtitles.parseAss(ass).get
    assert(cs.length == 2)
    assert(cs(0) == Subtitles.Cue(1, 1000, 2500, "Hi there"))
    assert(cs(1) == Subtitles.Cue(2,
      ((1 * 60 + 2) * 60 + 3) * 1000 + 450,
      ((1 * 60 + 2) * 60 + 4) * 1000, "a, b\nc d"))
    // a REORDERED Format line still maps fields by name
    val reord = "[Events]\nFormat: Start, End, Text\n" +
      "Dialogue: 0:00:01.00,0:00:02.00,only\n"
    assert(Subtitles.parseAss(reord).get ==
      Seq(Subtitles.Cue(1, 1000, 2000, "only")))
    // strictness: end <= start, bad stamp, no [Events], no Format
    assert(Subtitles.parseAss("[Events]\nFormat: Start, End, Text\n" +
      "Dialogue: 0:00:02.00,0:00:01.00,x\n").isEmpty)
    assert(Subtitles.parseAss("[Events]\nFormat: Start, End, Text\n" +
      "Dialogue: 0:00:1.00,0:00:02.00,x\n").isEmpty)
    assert(Subtitles.parseAss("just text").isEmpty)
    assert(Subtitles.parseAss("[Events]\nDialogue: 0:00:01.00,x\n").isEmpty)
    assert(Subtitles.parseAss(null).isEmpty)
  }

  test("pageMeta: title, description, canonical, og, decoys") {
    val html = "<html><head><!-- <title>decoy</title> -->" +
      "<title>Real &amp; Title</title>" +
      "<meta name=\"description\" content=\"the desc\">" +
      "<link rel=\"canonical\" href=\"http://c.com/x\"/>" +
      "<meta property=\"og:title\" content=\"og t\">" +
      "</head><body><title>late</title></body></html>"
    val m = Html.pageMeta(html)
    assert(m == Html.PageMeta("Real & Title", "the desc",
      "http://c.com/x", "og t"))
    // absent fields are empty, first occurrence wins
    val bare = Html.pageMeta("<title>A</title><title>B</title>")
    assert(bare.title == "A" && bare.canonical == "")
    assert(Html.pageMeta("no tags at all") ==
      Html.PageMeta("", "", "", ""))
  }

  test("attr lookup never matches inside another attribute's value") {
    import graft.text.XmlLite
    // 'rel=canonical' INSIDE title's quoted value must not match
    val inner = "link title=\"x rel=canonical\" href=\"http://evil/\""
    assert(XmlLite.attr(inner, "rel").isEmpty)
    assert(XmlLite.attr(inner, "title").contains("x rel=canonical"))
    assert(XmlLite.attr(inner, "href").contains("http://evil/"))
    // page-level: the decoy link is not canonical; the real one is
    val m = Html.pageMeta("<html><head>" +
      "<link title=\"x rel=canonical\" href=\"http://evil/\">" +
      "<link rel=\"canonical\" href=\"http://real/\"/></head></html>")
    assert(m.canonical == "http://real/")
    // the tag name itself never reads as an attribute
    assert(XmlLite.attr("meta name=\"n\" content=\"c\"", "meta").isEmpty)
    // bare attributes are skipped, later ones still found
    assert(XmlLite.attr("link disabled href='/a'", "href").contains("/a"))
    // ws around '=', single quotes, case-insensitive names
    assert(XmlLite.attr("svg viewBox = '0 0 9 9'", "VIEWBOX")
      .contains("0 0 9 9"))
    // unquoted value terminates at whitespace
    assert(XmlLite.attr("a href=/x rel=me", "href").contains("/x"))
    assert(XmlLite.attr("a href=/x rel=me", "rel").contains("me"))
  }

  test("svg: attribute dims, px suffix, viewBox fallback") {
    assert(Binary.parseSvgMeta(
      "<svg width=\"640px\" height=\"480\"/>".getBytes("UTF-8")).get
      == Binary.ImageMeta("svg", 640, 480, 8))
    assert(Binary.parseSvgMeta(
      "<?xml version=\"1.0\"?><svg viewBox=\"0 0 32 16\"></svg>"
        .getBytes("UTF-8")).get == Binary.ImageMeta("svg", 32, 16, 8))
    // width wins over viewBox when both parse
    assert(Binary.parseSvgMeta(
      "<svg width=\"1\" height=\"2\" viewBox=\"0 0 9 9\"/>"
        .getBytes("UTF-8")).get.width == 1)
    assert(Binary.parseSvgMeta("<svg/>".getBytes("UTF-8")).isEmpty)
    assert(Binary.parseSvgMeta("not xml".getBytes("UTF-8")).isEmpty)
  }

  test("extractTables: grids, headers, soup tolerance, nesting") {
    val html = "<p>before</p><table><tr><th>H1</th><th>H2</th></tr>" +
      "<tr><td>a &amp; b</td><td>c</td></tr>" +
      "<tr><td>d<td>e</table>after"
    val ts = Html.extractTables(html)
    assert(ts.length == 1)
    assert(ts(0)(0) == Html.TableRow(true, Seq("H1", "H2")))
    assert(ts(0)(1) == Html.TableRow(false, Seq("a & b", "c")))
    // unclosed td/tr (tag soup) still yields the row
    assert(ts(0)(2) == Html.TableRow(false, Seq("d", "e")))
    // formatting tags inside cells drop; mixed th/td is not a header
    val t2 = Html.extractTables(
      "<table><tr><th>k</th><td><b>v</b> 1</td></tr></table>")
    assert(t2(0)(0) == Html.TableRow(false, Seq("k", "v 1")))
    // nested table flattens into its host cell
    val t3 = Html.extractTables("<table><tr><td>x" +
      "<table><tr><td>inner</td></tr></table>y</td></tr></table>")
    assert(t3.length == 1 && t3(0)(0).cells == Seq("xinnery"))
    // commented-out and script-built tables are not extracted
    assert(Html.extractTables(
      "<!-- <table><tr><td>no</td></tr></table> -->").isEmpty)
    assert(Html.extractTables(
      "<script>'<table><tr><td>no</td></tr></table>'</script>").isEmpty)
    // unterminated table truncates cleanly
    assert(Html.extractTables("<table><tr><td>tail")(0)(0).cells
      == Seq("tail"))
    // no tables -> empty
    assert(Html.extractTables("<p>plain</p>").isEmpty)
  }

  test("id3v2: v3/v4 framing, NUL strip, tagged mp3 walks both ways") {
    val t4 = Binary.parseId3v2(Binary.id3v2(4, "T", "A", "B")).get
    assert(t4 == Binary.Id3Meta(4, "T", "A", "B"))
    val t3 = Binary.parseId3v2(Binary.id3v2(3, "Ti tle", "Ar", "Al")).get
    assert(t3 == Binary.Id3Meta(3, "Ti tle", "Ar", "Al"))
    // v2.2 parses with its own 3-char/3-byte framing
    val t2 = Binary.parseId3v2(Binary.id3v2(2, "Old T", "Old A", "Old L",
      enc = 1)).get
    assert(t2 == Binary.Id3Meta(2, "Old T", "Old A", "Old L"))
    // a v2.2 header over v3-framed frames is malformed -> reject
    val v2 = Binary.id3v2(3, "x", "y", "z"); v2(3) = 2
    assert(Binary.parseId3v2(v2).isEmpty)
    // unknown majors and garbage reject
    val v5 = Binary.id3v2(3, "x", "y", "z"); v5(3) = 5
    assert(Binary.parseId3v2(v5).isEmpty)
    assert(Binary.parseId3v2("IDX".getBytes("US-ASCII")).isEmpty)
    // the tagged fixture: tag reads AND the mp3 walk skips it
    val b = Binary.synthTaggedMp3(7)
    assert(Binary.parseId3v2(b).get.title == "Track 7")
    val a = Binary.parseAudioMeta(b).get
    assert(a.format == "mp3" && a.n_frames == 8 * 1152)
  }

  test("flac tags: VORBIS_COMMENT block walk, STREAMINFO still reads") {
    val b = Binary.synthTaggedFlac(7)
    val t = Binary.parseFlacTags(b).get
    assert(t == Binary.VorbisTags("graft 7", "Flac Track 7",
      "Flac Artist 7", "Flac Album 7", 4))
    // the extra block does not break the audio-meta walk
    val a = Binary.parseAudioMeta(b).get
    assert(a.format == "flac" && a.sample_rate == 24000)
    // keys are case-insensitive; unknown keys only count
    val m = Binary.parseFlacTags(Binary.flacWithTags(44100, 2, 16, 441,
      "v", Seq(("title", "low"), ("X", "y")))).get
    assert(m.title == "low" && m.n_comments == 2 && m.artist == "")
    // an untagged header has no comment block -> None
    assert(Binary.parseFlacTags(Binary.flacHeader(44100, 2, 16, 441)).isEmpty)
    // lying length fields reject, never crash
    val bad = b.clone(); bad(42) = 0x7f
    Binary.parseFlacTags(bad) // total
    assert(Binary.parseFlacTags("fLaC".getBytes ++ Array[Byte](0x84.toByte,
      0, 0, 99)).isEmpty)
  }

  test("opus tags: page walk to OpusTags, shared comment body") {
    val b = Binary.synthOggOpus(7)
    val t = Binary.parseOpusTags(b).get
    assert(t == Binary.VorbisTags("graft 7", "Opus Track 7",
      "Opus Artist 7", "", 3))
    // the duration walk reads the same bytes
    assert(Binary.parseAudioMeta(b).get.duration_ms == 160L)
    // a corrupted tags page fails the CRC -> None, never garble
    val at = b.length / 2
    val bad = b.clone(); bad(at) = (bad(at) ^ 0x40).toByte
    Binary.parseOpusTags(bad) // total; most flips are CRC-rejected
    assert(Binary.parseOpusTags("OggS".getBytes).isEmpty)
    assert(Binary.parseOpusTags(null).isEmpty)
  }

  test("id3v2: UTF-16 text frames decode; BOM-less enc-1 rejects") {
    // enc 1 with LE BOM (fixture), enc 2 BE, enc 3 UTF-8 — all four
    // encodings of the same strings parse identically
    for (enc <- 0 to 3) {
      val t = Binary.parseId3v2(Binary.id3v2(4, "Tïtle µ", "Ar", "Al",
        enc = enc)).get
      assert(t == Binary.Id3Meta(4, "Tïtle µ", "Ar", "Al"), s"enc=$enc")
    }
    // enc 1 with a BE BOM (hand-built: swap the fixture's LE BOM+body)
    val le = Binary.id3v2(3, "AB", "C", "D", enc = 1)
    // frame layout: 10 tag header + 10 frame header + enc byte + BOM
    def swapPairs(bytes: Array[Byte], from: Int, len: Int): Unit = {
      var i = from
      while (i + 1 < from + len) {
        val t = bytes(i); bytes(i) = bytes(i + 1); bytes(i + 1) = t
        i += 2
      }
    }
    val be = le.clone()
    // title frame payload: enc at 20, BOM+4 text bytes at 21..26
    swapPairs(be, 21, 6)
    assert(Binary.parseId3v2(be).get.title == "AB")
    // BOM-less enc-1 is malformed: reject, never garble
    val noBom = le.clone()
    noBom(21) = 'A'; noBom(22) = 0; noBom(23) = 'B'; noBom(24) = 0
    // (payload now starts with text bytes, no BOM)
    assert(Binary.parseId3v2(noBom).isEmpty)
    // the tagged-mp3 fixture cycles encodings; ids 0..3 cover all four
    for (id <- 0L to 3L) {
      val m = Binary.parseId3v2(Binary.synthTaggedMp3(id)).get
      assert(m.title == s"Track $id" && m.album == s"Album $id")
    }
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Rtf

class RtfSpec extends AnyFunSuite {

  test("fixture: destinations vanish, escapes decode, uc fallback skips") {
    assert(Rtf.rtfText(Rtf.synthRtf(3)).get ==
      "Café doc 3\nBold 3 and é plain 3\nCol A3\tCol B3\nBrace {x3} end")
  }

  test("core semantics") {
    def t(s: String) = Rtf.rtfText(s).get
    assert(t("{\\rtf1 hello}") == "hello")
    // fonttbl and \* destinations contribute nothing
    assert(t("{\\rtf1{\\fonttbl{\\f0 Arial;}}ok}") == "ok")
    assert(t("{\\rtf1{\\*\\mystery data here}ok}") == "ok")
    // group nesting: formatting groups are transparent (the space
    // after each control word is its delimiter, consumed)
    assert(t("{\\rtf1 a{\\i b{\\b c}}d}") == "abcd")
    // \par \tab \~ and escaped specials
    assert(t("{\\rtf1 a\\par b\\tab c\\~d \\{e\\} \\\\f}")
      == "a\nb\tc d {e} \\f")
    // hex bytes and unicode with uc0; the space after \u66 is the
    // control-word DELIMITER, not text
    assert(t("{\\rtf1\\uc0 x\\'41\\u66 y}") == "xABy")
    // uc1 fallback: the char after \uN is skipped
    assert(t("{\\rtf1\\uc1 \\u8364e!}") == "€!")
    // negative \u wraps by 65536 (0xF10F private-use char)
    assert(t("{\\rtf1\\uc0 \\u-3825 }") == "\uF10F")
    // raw newlines in source are ignored
    assert(t("{\\rtf1 one\ntwo\r\nthree}") == "onetwothree")
    // optional hyphen \- is a break POINT: emits nothing
    assert(t("{\\rtf1 doc\\-ument}") == "document")
    // a dangling \* never leaks past text or a group boundary to mark
    // some LATER group ignorable (review regression)
    // (the malformed "\\* then text" group degrades to text — the
    // point is that 'c' in the OUTER group survives)
    assert(t("{\\rtf1 a{\\* x}b\\i c}") == "a xbc")
    assert(t("{\\rtf1 a\\* b\\i c}") == "a bc")
    // the \uN fallback skip dies at a group boundary
    assert(t("{\\rtf1\\uc1 {\\u65 }B}") == "AB")
    // uc state is per-group: inner \uc0 does not leak out
    assert(t("{\\rtf1\\uc1 {\\uc0 \\u65 }\\u66 zq}") == "ABq")
  }

  test("totality: non-rtf rejects, torn input terminates") {
    assert(Rtf.rtfText("plain text").isEmpty)
    assert(Rtf.rtfText(null).isEmpty)
    assert(Rtf.rtfText("").isEmpty)
    // unbalanced groups / trailing backslash end cleanly
    assert(Rtf.rtfText("{\\rtf1 {{{abc").get == "abc")
    assert(Rtf.rtfText("{\\rtf1 x\\").get == "x")
    assert(Rtf.rtfText("{\\rtf1 y\\'4").get == "y")
    // early close: content after the document group is ignored
    assert(Rtf.rtfText("{\\rtf1 in}out").get == "in")
  }
}

package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Markdown → text extraction — READMEs and docs are a large slice of
  * a code crawl (and of issue/forum dumps), and feeding raw markup to
  * a quality filter skews every punctuation/alpha ratio. CommonMark's
  * high-frequency constructs, dependency-free:
  *
  *  - ATX headings (`## x` → `x`), setext underlines dropped;
  *  - emphasis unwrapped (`**x**`, `*x*`, `__x__`, `_x_`, `` `x` ``);
  *  - links/images keep the visible text (`[t](u)` → `t`,
  *    `![alt](u)` → `alt`), reference-style `[t][ref]` → `t`;
  *  - fenced code blocks keep their CONTENT verbatim (code is signal
  *    in a code corpus), fences and info strings drop;
  *  - list markers (`- `, `* `, `+ `, `1. `) and blockquote `> `
  *    prefixes strip; horizontal rules drop;
  *  - blank lines collapse (single blank between blocks), trailing
  *    whitespace trims.
  *
  * Not a CommonMark conformance pass (nested emphasis edge cases,
  * HTML blocks, tables stay as-is) — the documented scope is the
  * quality-filter view, same honesty bar as [[Html]].
  */
object Markdown {

  def mdToText(md: String): String = {
    val out = Vector.newBuilder[String]
    var inFence = false
    var fenceMarker = ""
    md.split("\n", -1).foreach { raw =>
      val line = raw.replaceAll("\\s+$", "")
      val trimmed = line.trim
      if (!inFence && (trimmed.startsWith("```") ||
          trimmed.startsWith("~~~"))) {
        inFence = true
        fenceMarker = trimmed.take(3)
      } else if (inFence && trimmed.startsWith(fenceMarker)) {
        inFence = false
      } else if (inFence) {
        out += line // code content verbatim
      } else if (isRule(trimmed) || isSetextUnderline(trimmed)) {
        () // horizontal rule / setext underline: drop
      } else {
        out += inline(stripBlockPrefix(line))
      }
    }
    // collapse runs of blank lines, trim edges
    val lines = out.result()
    val sb = Vector.newBuilder[String]
    var prevBlank = true
    lines.foreach { l =>
      val blank = l.trim.isEmpty
      if (!blank) { sb += l; prevBlank = false }
      else if (!prevBlank) { sb += ""; prevBlank = true }
    }
    sb.result().reverse.dropWhile(_.isEmpty).reverse.mkString("\n")
  }

  private def isRule(t: String): Boolean =
    t.length >= 3 && (t.forall(c => c == '-' || c == ' ') ||
      t.forall(c => c == '*' || c == ' ') ||
      t.forall(c => c == '_' || c == ' ')) &&
      t.count(c => c != ' ') >= 3

  private def isSetextUnderline(t: String): Boolean =
    t.length >= 2 && (t.forall(_ == '=')) // '---' is caught by isRule

  /** Headings, list markers, blockquotes. */
  private def stripBlockPrefix(line: String): String = {
    var s = line
    // blockquote chains: "> > x"
    var changed = true
    while (changed) {
      changed = false
      val t = s.dropWhile(_ == ' ')
      if (t.startsWith("> ")) { s = t.substring(2); changed = true }
      else if (t == ">") { s = ""; changed = true }
    }
    val t = s.dropWhile(_ == ' ')
    val indent = s.length - t.length
    if (t.startsWith("#")) {
      val hashes = t.takeWhile(_ == '#')
      if (hashes.length <= 6 && t.drop(hashes.length).startsWith(" "))
        return t.drop(hashes.length + 1)
    }
    if ((t.startsWith("- ") || t.startsWith("* ") || t.startsWith("+ ")))
      return " " * indent + t.substring(2)
    val digits = t.takeWhile(_.isDigit)
    if (digits.nonEmpty && digits.length <= 9 &&
      t.drop(digits.length).startsWith(". "))
      return " " * indent + t.substring(digits.length + 2)
    s
  }

  /** Emphasis, code spans, links, images. */
  private[text] def inline(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < n && "\\`*_{}[]()#+-.!>".indexOf(
          s.charAt(i + 1)) >= 0) {
        sb.append(s.charAt(i + 1)); i += 2
      } else if (c == '`') {
        val close = s.indexOf('`', i + 1)
        if (close < 0) { sb.append(c); i += 1 }
        else { sb.append(s.substring(i + 1, close)); i = close + 1 }
      } else if (c == '!' && i + 1 < n && s.charAt(i + 1) == '[') {
        linkText(s, i + 1) match {
          case Some((text, next)) => sb.append(text); i = next
          case None => sb.append(c); i += 1
        }
      } else if (c == '[') {
        linkText(s, i) match {
          case Some((text, next)) => sb.append(text); i = next
          case None => sb.append(c); i += 1
        }
      } else if (c == '*' || c == '_') {
        // emphasis markers drop (single or double)
        i += 1
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** `[text](url)` or `[text][ref]` starting at '[' → (text, after).
    * The text itself may carry emphasis — recurse. */
  private def linkText(s: String, at: Int): Option[(String, Int)] = {
    var depth = 1
    var i = at + 1
    while (i < s.length && depth > 0) {
      val c = s.charAt(i)
      if (c == '[') depth += 1
      else if (c == ']') depth -= 1
      i += 1
    }
    if (depth > 0) return None
    val text = inline(s.substring(at + 1, i - 1))
    if (i < s.length && (s.charAt(i) == '(' || s.charAt(i) == '[')) {
      val closeCh = if (s.charAt(i) == '(') ')' else ']'
      val close = s.indexOf(closeCh, i + 1)
      if (close < 0) Some((text, i))
      else Some((text, close + 1))
    } else Some((text, i))
  }

  def mdToTextCol(c: Column): Column =
    udf { s: String => Option(s).map(mdToText) }.apply(c)
}

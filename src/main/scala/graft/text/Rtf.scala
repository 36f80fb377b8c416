package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** RTF plain-text extraction — the legacy rich-text format mail
  * clients and old word processors left all over every crawl. A
  * single-pass group-stack walk of the 1987-spec core:
  *
  *  - `{`/`}` push/pop group state (destination-skip flag, `\ucN`);
  *  - control words: `\par`/`\line` → newline, `\tab`/`\cell` → tab,
  *    `\row` → newline, `\~` → space, `\'hh` → Latin-1 byte,
  *    `\uN` → the code point (negatives wrap by 65536) followed by
  *    `uc` fallback characters to skip, `\ucN` sets that count;
  *  - destination groups whose content is data, not text —
  *    `fonttbl`, `colortbl`, `stylesheet`, `info`, `pict`,
  *    `themedata`, `fldinst`, plus anything opened with the `\*`
  *    ignorable marker — skip to their closing brace;
  *  - `\\`, `\{`, `\}` escape to literals; `\~` a space; `\_` a
  *    hyphen; `\-` (an optional-hyphen break POINT) emits nothing;
  *    raw CR/LF in the source are ignored (the spec: line breaks are
  *    `\par`, not newlines). A `\*` or a pending `\uN` fallback skip
  *    never crosses text or a group boundary.
  *
  * Total on hostile input: every branch advances the cursor, an
  * unbalanced group simply ends at EOF, non-RTF input returns None
  * (must open with `{\rtf`).
  */
object Rtf {

  private val Destinations = Set("fonttbl", "colortbl", "stylesheet",
    "info", "pict", "themedata", "fldinst", "generator", "xmlnstbl",
    "listtable", "listoverridetable", "revtbl")

  def rtfText(s: String): Option[String] = {
    if (s == null || !s.startsWith("{\\rtf")) return None
    val sb = new StringBuilder
    // group state: (skip, uc); the document group starts the stack
    var stack = List((false, 1))
    def skip: Boolean = stack.head._1
    def uc: Int = stack.head._2
    var pendingUcSkip = 0 // fallback chars to drop after \uN
    var starPending = false // \* seen: next control word is ignorable
    var i = 1 // past the document-group brace; \rtf1 parses as a word
    val n = s.length
    while (i < n && stack.nonEmpty) {
      val c = s.charAt(i)
      if (c == '{') {
        // \* binds to the control word IMMEDIATELY after it; a group
        // boundary in between voids it (else a leaked flag would mark
        // some later OUTER group ignorable and eat its text). The \uN
        // fallback skip likewise never crosses a group boundary.
        starPending = false; pendingUcSkip = 0
        stack = stack.head :: stack; i += 1
      } else if (c == '}') {
        starPending = false; pendingUcSkip = 0
        stack = stack.tail
        if (stack.isEmpty) i = n else i += 1 // document group closed
      } else if (c == '\\') {
        if (i + 1 >= n) i = n
        else {
          val c1 = s.charAt(i + 1)
          if (c1 == '\\' || c1 == '{' || c1 == '}') {
            if (!skip) { if (pendingUcSkip > 0) pendingUcSkip -= 1
              else sb.append(c1) }
            i += 2
          } else if (c1 == '~') {
            if (!skip && pendingUcSkip == 0) sb.append(' '); i += 2
          } else if (c1 == '-') {
            // optional-hyphen break POINT, not a character: emits
            // nothing (extracted text must read "document", not
            // "doc-ument")
            i += 2
          } else if (c1 == '_') {
            if (!skip && pendingUcSkip == 0) sb.append('-'); i += 2
          } else if (c1 == '*') {
            starPending = true; i += 2
          } else if (c1 == '\'') {
            if (i + 3 < n) {
              if (!skip) {
                if (pendingUcSkip > 0) pendingUcSkip -= 1
                else try sb.append(
                  Integer.parseInt(s.substring(i + 2, i + 4), 16).toChar)
                catch { case _: NumberFormatException => () }
              }
              i += 4
            } else i = n
          } else if (c1.isLetter) {
            var j = i + 1
            while (j < n && s.charAt(j).isLetter) j += 1
            val word = s.substring(i + 1, j)
            var neg = false
            if (j < n && s.charAt(j) == '-') { neg = true; j += 1 }
            var param = -1L
            var digits = 0
            while (j < n && s.charAt(j).isDigit && digits < 10) {
              if (param < 0) param = 0
              param = param * 10 + (s.charAt(j) - '0'); j += 1; digits += 1
            }
            if (j < n && s.charAt(j) == ' ') j += 1 // delimiter space
            val pv = if (param < 0) -1L else if (neg) -param else param
            if (starPending) {
              // ignorable destination: this whole group is data
              stack = (true, uc) :: stack.tail
              starPending = false
            } else if (Destinations.contains(word)) {
              stack = (true, uc) :: stack.tail
            } else if (!skip) word match {
              case "par" | "line" | "row" | "sect" | "page" =>
                sb.append('\n')
              case "tab" | "cell" => sb.append('\t')
              case "uc" =>
                stack = (skip, math.max(0, pv.toInt)) :: stack.tail
              case "u" =>
                if (pv != -1L) {
                  val cp = (if (pv < 0) pv + 65536 else pv).toInt
                  if (cp >= 0 && cp <= 0xffff) sb.append(cp.toChar)
                  pendingUcSkip = uc
                }
              case _ => () // formatting word: transparent
            }
            i = j
          } else i += 2 // unknown control symbol: consumed
        }
      } else if (c == '\r' || c == '\n') i += 1
      else {
        starPending = false // plain text voids a dangling \*
        if (!skip) {
          if (pendingUcSkip > 0) pendingUcSkip -= 1
          else sb.append(c)
        }
        i += 1
      }
    }
    Some(sb.toString)
  }

  /** Deterministic per-id RTF: fonttbl + ignorable destination that
    * must vanish, hex and `\uN` escapes (with the fallback char the
    * `\uc1` default requires skipping), escaped braces, `\par` and
    * `\tab` rendering, nested formatting groups kept transparent. */
  def synthRtf(id: Long): String = {
    val d = id % 10
    "{\\rtf1\\ansi\\deff0" +
      "{\\fonttbl{\\f0 Times New Roman;}}" +
      "{\\*\\generator graft synth;}" +
      s"\\uc1 Caf\\'e9 doc $d\\par" +
      s"{\\b Bold $d} and \\u233e plain ${id % 7}\\par\n" +
      s"Col A$d\\tab Col B$d\\par\n" +
      s"Brace \\{x$d\\} end" +
      "}"
  }

  def synthRtfCol(c: Column): Column =
    udf { id: Long => synthRtf(id) }.apply(c)
  def rtfTextCol(c: Column): Column =
    udf { s: String => rtfText(s) }.apply(c)
}

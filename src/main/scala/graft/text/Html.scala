package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** HTML → text extraction — the step that turns a crawl `response`
  * body into corpus text (what Common Crawl's WET conversion does
  * between the WARC capture and the text record). Dependency-free
  * byte/char walking:
  *
  *  - tags are tokenized and dropped; `script` / `style` / `noscript`
  *    element CONTENT is skipped to the matching close tag
  *    (case-insensitive) — the single biggest junk source in naive
  *    strip-tags extractors;
  *  - comments (`<!-- -->`) and declarations (`<!...>`) are skipped;
  *  - block-level elements emit line breaks, inline elements nothing —
  *    so "<div>x<span>y</span></div>" keeps x and y on one line while
  *    paragraphs and list items separate;
  *  - character references decode: the core named set (amp, lt, gt,
  *    quot, apos, nbsp) plus numeric decimal and hex forms;
  *  - whitespace normalizes per line (runs → one space, trim) and
  *    empty lines drop.
  *
  * Malformed input never throws: an unterminated tag or comment
  * truncates cleanly at end-of-input (exactly what a tag-soup crawl
  * page needs). Pure per-row map work at any scale.
  */
object Html {

  private val BlockTags = Set(
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
    "ol", "tr", "td", "th", "table", "section", "article", "header",
    "footer", "blockquote", "pre", "hr", "form", "title", "dd", "dt",
    "dl", "nav", "aside", "main", "figure", "figcaption", "address")

  private val SkipContent = Set("script", "style", "noscript")

  private val Named = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"",
    "apos" -> "'", "nbsp" -> " ")

  /** Decode character references in a text chunk; unknown ones pass
    * through verbatim (tag-soup tolerance). */
  private[graft] def decodeEntities(s: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c != '&') { out.append(c); i += 1 }
      else {
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 10) { out.append(c); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val repl =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              val hex = body.substring(2)
              if (hex.nonEmpty && hex.forall(ch => Character.digit(ch, 16) >= 0))
                try Some(new String(Character.toChars(Integer.parseInt(hex, 16))))
                catch { case _: Exception => None }
              else None
            } else if (body.startsWith("#")) {
              val dec = body.substring(1)
              if (dec.nonEmpty && dec.forall(_.isDigit))
                try Some(new String(Character.toChars(dec.toInt)))
                catch { case _: Exception => None }
              else None
            } else Named.get(body.toLowerCase)
          repl match {
            case Some(r) => out.append(r); i = semi + 1
            case None => out.append(c); i += 1
          }
        }
      }
    }
    out.toString
  }

  /** Extract readable text from an HTML fragment or document. */
  def htmlToText(html: String): String = {
    val raw = new StringBuilder
    var i = 0
    val n = html.length
    var skipUntil: String = null // lowercase tag whose close ends the skip
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && html.charAt(i + 1) == '!') {
          val end = html.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
        } else {
          val end = html.indexOf('>', i + 1)
          val inner = if (end < 0) html.substring(i + 1)
            else html.substring(i + 1, end)
          i = if (end < 0) n else end + 1
          val isClose = inner.startsWith("/")
          val name = inner.stripPrefix("/").takeWhile(ch =>
            ch.isLetterOrDigit).toLowerCase
          if (skipUntil != null) {
            if (isClose && name == skipUntil) skipUntil = null
            // everything else inside a skip element is ignored
          } else {
            if (!isClose && SkipContent.contains(name) &&
              !inner.endsWith("/")) skipUntil = name
            if (BlockTags.contains(name)) raw.append('\n')
          }
        }
      } else {
        if (skipUntil == null) raw.append(c)
        i += 1
      }
    }
    decodeEntities(raw.toString)
      .split("\n", -1)
      .map(_.replaceAll("[\\s\\u00a0]+", " ").trim)
      .filter(_.nonEmpty)
      .mkString("\n")
  }

  def htmlToTextCol(c: Column): Column =
    udf { s: String => Option(s).map(htmlToText) }.apply(c)

  /** href values of `<a>` tags, in document order — the crawl-graph
    * edge source. Attribute values may be double-quoted, single-quoted
    * or bare; tags inside skipped elements (a script building links at
    * runtime) are NOT extracted; malformed tags truncate cleanly. */
  def extractLinks(html: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    val n = html.length
    var skipUntil: String = null
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val end = html.indexOf('>', i + 1)
          val inner = if (end < 0) html.substring(i + 1)
            else html.substring(i + 1, end)
          i = if (end < 0) n else end + 1
          val isClose = inner.startsWith("/")
          val name = inner.stripPrefix("/")
            .takeWhile(_.isLetterOrDigit).toLowerCase
          if (skipUntil != null) {
            if (isClose && name == skipUntil) skipUntil = null
          } else if (!isClose && SkipContent.contains(name) &&
            !inner.endsWith("/")) {
            skipUntil = name
          } else if (!isClose && name == "a") {
            hrefOf(inner).foreach(out += _)
          }
        }
      } else i += 1
    }
    out.toSeq
  }

  private def hrefOf(tagInner: String): Option[String] = {
    val lower = tagInner.toLowerCase
    var at = lower.indexOf("href")
    while (at >= 0) {
      // a standalone attribute: whitespace before the name (rules out
      // data-href and the like), '=' after
      val beforeOk = at > 0 && lower.charAt(at - 1).isWhitespace
      var j = at + 4
      while (j < tagInner.length && tagInner.charAt(j).isWhitespace) j += 1
      if (beforeOk && j < tagInner.length && tagInner.charAt(j) == '=') {
        j += 1
        while (j < tagInner.length && tagInner.charAt(j).isWhitespace) j += 1
        if (j >= tagInner.length) return None
        val q = tagInner.charAt(j)
        return Some(if (q == '"' || q == '\'') {
          val close = tagInner.indexOf(q, j + 1)
          if (close < 0) tagInner.substring(j + 1)
          else tagInner.substring(j + 1, close)
        } else tagInner.substring(j).takeWhile(!_.isWhitespace))
      }
      at = lower.indexOf("href", at + 4)
    }
    None
  }

  /** The page-level metadata an indexer extracts before the body:
    * `<title>`, `<meta name="description">`, `<link rel="canonical">`
    * and the OpenGraph title. Empty string = absent (a page without a
    * canonical is normal, not an error). */
  final case class PageMeta(title: String, description: String,
                            canonical: String, og_title: String)

  /** Head-metadata extraction with the same tag walk discipline as
    * [[extractLinks]] (comments skipped, attribute quoting forms
    * tolerated, first occurrence wins, entities decoded). */
  def pageMeta(html: String): PageMeta = {
    var title = ""; var desc = ""; var canonical = ""; var og = ""
    var i = 0
    val n = html.length
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val end = html.indexOf('>', i + 1)
          val inner = if (end < 0) html.substring(i + 1)
            else html.substring(i + 1, end)
          val isClose = inner.startsWith("/")
          val name = inner.stripPrefix("/")
            .takeWhile(_.isLetterOrDigit).toLowerCase
          if (!isClose && name == "title" && title.isEmpty && end >= 0) {
            val close = html.toLowerCase.indexOf("</title>", end + 1)
            val raw = if (close < 0) html.substring(end + 1)
              else html.substring(end + 1, close)
            title = decodeEntities(raw).trim
            i = if (close < 0) n else close + 8
          } else {
            if (!isClose && name == "meta") {
              val tagInner = inner.stripSuffix("/")
              val content = XmlLite.attr(tagInner, "content")
              XmlLite.attr(tagInner, "name").map(_.toLowerCase) match {
                case Some("description") if desc.isEmpty =>
                  desc = content.getOrElse("")
                case _ =>
                  XmlLite.attr(tagInner, "property")
                    .map(_.toLowerCase) match {
                    case Some("og:title") if og.isEmpty =>
                      og = content.getOrElse("")
                    case _ => ()
                  }
              }
            } else if (!isClose && name == "link" && canonical.isEmpty) {
              val tagInner = inner.stripSuffix("/")
              if (XmlLite.attr(tagInner, "rel").map(_.toLowerCase)
                .contains("canonical"))
                canonical = XmlLite.attr(tagInner, "href").getOrElse("")
            }
            i = if (end < 0) n else end + 1
          }
        }
      } else i += 1
    }
    PageMeta(title, desc, canonical, og)
  }

  /** html → struct<title, description, canonical, og_title>. */
  def pageMetaCol(c: Column): Column =
    udf { s: String =>
      Option(s).map { h =>
        val m = pageMeta(h)
        (m.title, m.description, m.canonical, m.og_title)
      }
    }.apply(c)

  /** html → array<string> of href values. */
  def linksCol(c: Column): Column =
    udf { s: String => Option(s).map(extractLinks) }.apply(c)

  /** One table row: `header` when the row's cells are `<th>`. */
  final case class TableRow(header: Boolean, cells: Seq[String])

  /** Structured `<table>` extraction — web tables are a
    * corpus-building source of their own (relational/QA pretraining
    * data), and cell-grid structure is exactly what [[htmlToText]]'s
    * flat rendering throws away. Tag-soup-tolerant state machine:
    *
    *  - `<td>`/`<th>` open a cell, implicitly closing an unclosed
    *    predecessor (HTML allows omitted `</td>`); `<tr>` likewise
    *    closes the previous row; `</table>` closes everything open;
    *  - a row is a header row when ALL its cells are `<th>`;
    *  - cell text: tags inside cells drop (a nested table flattens
    *    into its host cell — naive-extractor semantics, stated),
    *    entities decode, whitespace normalizes, script/style content
    *    and comments vanish;
    *  - text outside any cell (including between `<table>` and the
    *    first row) is discarded; unterminated tables truncate cleanly
    *    at end of input.
    */
  def extractTables(html: String): Seq[Seq[TableRow]] = {
    val tables = Vector.newBuilder[Seq[TableRow]]
    var rows: scala.collection.mutable.ArrayBuffer[TableRow] = null
    var cells: scala.collection.mutable.ArrayBuffer[String] = null
    var headerFlags: scala.collection.mutable.ArrayBuffer[Boolean] = null
    var cell: StringBuilder = null
    var cellIsTh = false
    var depth = 0 // nested <table> depth inside a cell: 0 = top level
    var skipUntil: String = null
    def closeCell(): Unit = if (cell != null) {
      cells += decodeEntities(cell.toString)
        .replaceAll("[\\s\\u00a0]+", " ").trim
      headerFlags += cellIsTh
      cell = null
    }
    def closeRow(): Unit = if (cells != null) {
      closeCell()
      if (cells.nonEmpty)
        rows += TableRow(headerFlags.forall(identity), cells.toSeq)
      cells = null; headerFlags = null
    }
    def closeTable(): Unit = if (rows != null) {
      closeRow()
      tables += rows.toSeq
      rows = null
    }
    var i = 0
    val n = html.length
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (i + 1 < n && html.charAt(i + 1) == '!') {
          val end = html.indexOf('>', i + 1)
          i = if (end < 0) n else end + 1
        } else {
          val end = html.indexOf('>', i + 1)
          val inner = if (end < 0) html.substring(i + 1)
            else html.substring(i + 1, end)
          i = if (end < 0) n else end + 1
          val isClose = inner.startsWith("/")
          val name = inner.stripPrefix("/")
            .takeWhile(_.isLetterOrDigit).toLowerCase
          if (skipUntil != null) {
            if (isClose && name == skipUntil) skipUntil = null
          } else if (!isClose && SkipContent.contains(name) &&
            !inner.endsWith("/")) {
            skipUntil = name
          } else if (name == "table") {
            if (!isClose) {
              if (rows == null) { rows = scala.collection.mutable.ArrayBuffer() }
              else depth += 1 // nested: flatten into the host cell
            } else {
              if (depth > 0) depth -= 1 else closeTable()
            }
          } else if (rows != null && depth == 0) {
            name match {
              case "tr" => if (!isClose) { closeRow()
                cells = scala.collection.mutable.ArrayBuffer()
                headerFlags = scala.collection.mutable.ArrayBuffer()
              } else closeRow()
              case "td" | "th" =>
                if (!isClose) {
                  if (cells == null) { // row-less cell: implicit <tr>
                    cells = scala.collection.mutable.ArrayBuffer()
                    headerFlags = scala.collection.mutable.ArrayBuffer()
                  }
                  closeCell()
                  cell = new StringBuilder
                  cellIsTh = name == "th"
                } else closeCell()
              case _ => () // formatting tags inside cells drop
            }
          }
        }
      } else {
        if (skipUntil == null && cell != null) cell.append(c)
        i += 1
      }
    }
    closeTable() // unterminated table truncates cleanly
    tables.result().filter(_.nonEmpty)
  }

  /** html → array<struct<table_idx, row_idx, is_header, n_cells,
    * row_text>> with cells joined by " | ". */
  def tablesCol(c: Column): Column =
    udf { s: String =>
      Option(s).map { h =>
        extractTables(h).zipWithIndex.flatMap { case (rows, t) =>
          rows.zipWithIndex.map { case (r, ri) =>
            (t, ri, r.header, r.cells.length, r.cells.mkString(" | "))
          }
        }
      }
    }.apply(c)

  /** The raw payloads of every `<script type="application/ld+json">`
    * block, document order — the structured-data channel most entity
    * extraction pipelines mine first. Comment-skipping (a commented-
    * out block must NOT surface — it never executes), type matching
    * is case-insensitive, XHTML `<![CDATA[...]]>` wrappers unwrap,
    * and OTHER script types (the decoy case: an inline JS object
    * literal) never match. The JSON itself is NOT parsed here —
    * that's the caller's codegen'd `from_json`, where invalid JSON
    * degrades to null instead of failing the page. */
  def jsonLdBlocks(html: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    val lower = html.toLowerCase
    val n = html.length
    var i = 0
    while (i < n) {
      if (html.regionMatches(i, "<!--", 0, 4)) {
        val end = html.indexOf("-->", i + 4)
        i = if (end < 0) n else end + 3
      } else {
        val at = lower.indexOf("<script", i)
        if (at < 0) return out.result()
        // a comment may start before the next script: re-scan from it
        val cm = html.indexOf("<!--", i)
        if (cm >= 0 && cm < at) { i = cm }
        else {
          val after = at + 7
          if (after < n && lower.charAt(after) != '>' &&
            !lower.charAt(after).isWhitespace) { i = at + 1 }
          else {
            val gt = html.indexOf('>', at)
            if (gt < 0) return out.result()
            val inner = html.substring(at + 1, gt).stripSuffix("/")
            val selfClosed = html.charAt(gt - 1) == '/'
            val close = lower.indexOf("</script", gt + 1)
            if (!selfClosed && XmlLite.attr(inner, "type")
              .map(_.trim.toLowerCase).contains("application/ld+json")) {
              val raw = html.substring(gt + 1,
                if (close < 0) n else close).trim
              val payload =
                if (raw.startsWith("<![CDATA[") && raw.endsWith("]]>"))
                  raw.substring(9, raw.length - 3).trim
                else raw
              if (payload.nonEmpty) out += payload
            }
            i = if (selfClosed) gt + 1
              else if (close < 0) n
              else { val ce = html.indexOf('>', close); if (ce < 0) n else ce + 1 }
          }
        }
      }
    }
    out.result()
  }

  /** All OpenGraph properties of a page as (key-without-`og:`,
    * content) pairs, first occurrence per key winning (the crawl
    * convention [[pageMeta]] already applies to og:title) — comments
    * skipped, entities decoded by the attribute reader. */
  def ogProps(html: String): Seq[(String, String)] = {
    val seen = scala.collection.mutable.LinkedHashMap[String, String]()
    var i = 0
    val n = html.length
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (html.regionMatches(i, "<!--", 0, 4)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else {
          val end = html.indexOf('>', i + 1)
          val inner = if (end < 0) html.substring(i + 1)
            else html.substring(i + 1, end)
          if (!inner.startsWith("/") &&
            inner.takeWhile(_.isLetterOrDigit).toLowerCase == "meta") {
            val tagInner = inner.stripSuffix("/")
            for (prop <- XmlLite.attr(tagInner, "property")
                   .map(_.toLowerCase) if prop.startsWith("og:");
                 content <- XmlLite.attr(tagInner, "content"))
              if (!seen.contains(prop.drop(3))) seen(prop.drop(3)) = content
          }
          i = if (end < 0) n else end + 1
        }
      } else i += 1
    }
    seen.toSeq
  }

  /** html → array<string> of JSON-LD payloads. */
  def jsonLdBlocksCol(c: Column): Column =
    udf { s: String => Option(s).map(jsonLdBlocks) }.apply(c)

  /** html → map<string,string> of og:* properties (keys stripped of
    * the `og:` prefix, first occurrence wins). */
  def ogPropsCol(c: Column): Column =
    udf { s: String => Option(s).map(h => ogProps(h).toMap) }.apply(c)
}

package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** gettext PO translation catalogs — every localized open-source
  * project ships them, so a code crawl's corpus is full of parallel
  * text (translation pairs are LLM training data in their own
  * right). Parses the catalog structure:
  *
  *  - entries of `msgid "..."` / `msgstr "..."` with C-style escapes
  *    (`\n`, `\t`, `\"`, `\\`) and adjacent-string continuation lines
  *    (a bare `"..."` line concatenates onto the current field);
  *  - plural entries (`msgid_plural` + `msgstr[N]`) — counted, with
  *    msgstr[0] standing in as the translation;
  *  - `#, fuzzy` flag comments (fuzzy entries are NOT translations —
  *    every PO pipeline filters them);
  *  - the header entry (empty msgid) carries catalog metadata and is
  *    excluded from the pair counts.
  */
object Gettext {

  final case class PoEntry(msgid: String, msgstr: String,
                           fuzzy: Boolean, plural: Boolean)
  final case class PoStats(n_entries: Int, n_translated: Int,
                           n_fuzzy: Int, n_plural: Int,
                           first_id: String, first_str: String)

  def parsePo(raw: String): Option[Seq[PoEntry]] = {
    if (raw == null) return None
    val out = Vector.newBuilder[PoEntry]
    var sawAny = false
    var msgid: StringBuilder = null
    var msgstr: StringBuilder = null
    var cur: StringBuilder = null // continuation target
    var fuzzy = false // the entry being built
    // a `#, fuzzy` comment precedes ITS entry's msgid — when entries
    // are not blank-line separated, the comment must not retroactively
    // flag the PREVIOUS entry, so it stages here until the msgid opens
    var pendingFuzzy = false
    var plural = false
    def flush(): Unit = {
      if (msgid != null && msgstr != null) {
        sawAny = true
        if (msgid.nonEmpty) // header entry (empty msgid) excluded
          out += PoEntry(msgid.toString, msgstr.toString, fuzzy, plural)
      }
      msgid = null; msgstr = null; cur = null
      fuzzy = false; plural = false
    }
    raw.split("\r\n|\n", -1).foreach { line0 =>
      val line = line0.trim
      if (line.isEmpty) { flush(); pendingFuzzy = false }
      else if (line.startsWith("#")) {
        if (line.startsWith("#,") && line.contains("fuzzy"))
          pendingFuzzy = true
      } else if (line.startsWith("msgid_plural")) {
        plural = true
        cur = null // the plural source doesn't join either field
      } else if (line.startsWith("msgid")) {
        if (msgid != null && msgstr != null) flush()
        msgid = new StringBuilder(unquote(line.substring(5).trim))
        cur = msgid
        fuzzy = pendingFuzzy
        pendingFuzzy = false
      } else if (line.startsWith("msgstr")) {
        val rest = line.substring(6).trim
        if (rest.startsWith("[")) {
          plural = true
          val close = rest.indexOf(']')
          if (close > 0) {
            val idx = rest.substring(1, close).toIntOption.getOrElse(-1)
            val v = unquote(rest.substring(close + 1).trim)
            if (idx == 0) { msgstr = new StringBuilder(v); cur = msgstr }
            else cur = null // msgstr[1..] kept out of the pair
          }
        } else {
          msgstr = new StringBuilder(unquote(rest))
          cur = msgstr
        }
      } else if (line.startsWith("\"") && cur != null) {
        cur.append(unquote(line)) // adjacent-string continuation
      }
    }
    flush()
    if (!sawAny) return None
    Some(out.result())
  }

  def poStats(raw: String): Option[PoStats] =
    parsePo(raw).map { es =>
      val first = es.headOption
      PoStats(es.length,
        es.count(e => e.msgstr.nonEmpty && !e.fuzzy),
        es.count(_.fuzzy), es.count(_.plural),
        first.map(_.msgid).getOrElse(""),
        first.map(_.msgstr).getOrElse(""))
    }

  /** The content of one `"..."` segment, C escapes decoded; lines
    * without a quoted segment yield "". */
  private def unquote(s: String): String = {
    val open = s.indexOf('"')
    if (open < 0) return ""
    val sb = new StringBuilder
    var i = open + 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"') return sb.toString
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' => sb.append('\n')
          case 't' => sb.append('\t')
          case other => sb.append(other)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString // unterminated string: surviving prefix
  }

  // ---- fixture ------------------------------------------------------ //

  /** Deterministic per-id catalog: a header entry (excluded), a
    * continuation-line entry with escapes, a fuzzy entry, a plural
    * entry, and id%3 plain entries. */
  def synthPo(id: Long): String = {
    val d = id % 10
    val extra = (0 until (id % 3).toInt).map { k =>
      s"""msgid "Plain $k of $d"
         |msgstr "Plano $k de $d"
         |""".stripMargin
    }.mkString("\n")
    s"""msgid ""
       |msgstr ""
       |"Project-Id-Version: graft $d\\n"
       |"Language: es\\n"
       |
       |#: src/main.c:$d
       |msgid "Hello "
       |"world $d\\n"
       |msgstr "Hola "
       |"mundo $d\\n"
       |
       |#, fuzzy
       |msgid "Draft $d"
       |msgstr "Borrador $d"
       |
       |msgid "One file ${id % 7}"
       |msgid_plural "Many files ${id % 7}"
       |msgstr[0] "Un archivo ${id % 7}"
       |msgstr[1] "Muchos archivos ${id % 7}"
       |
       |$extra""".stripMargin
  }

  def synthPoCol(c: Column): Column =
    udf { id: Long => synthPo(id) }.apply(c)
  /** text → struct<n_entries, n_translated, n_fuzzy, n_plural,
    * first_id, first_str>. */
  def poStatsCol(c: Column): Column =
    udf { s: String => poStats(s) }.apply(c)
}

package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** iCalendar (RFC 5545) event extraction — calendar invites ride
  * along in mail corpora (the MIME text/calendar part) and .ics files
  * litter crawls. The content-line machinery is the real work:
  *
  *  - unfolding: CRLF followed by SPACE/HTAB continues the line (the
  *    continuation's first char drops, the rest concatenates — RFC
  *    5545 §3.1, different from mail-header unfolding which keeps a
  *    space);
  *  - content lines `NAME;PARAM=v;PARAM2=v:VALUE` — params skipped up
  *    to the first ':' OUTSIDE a double-quoted param value;
  *  - text escapes `\n`/`\N` (newline), `\,`, `\;`, `\\`;
  *  - `BEGIN:VEVENT`..`END:VEVENT` blocks inside VCALENDAR; nested
  *    components (VALARM) skipped;
  *  - UTC basic-format date-times `yyyyMMddTHHmmssZ` parse to epoch
  *    millis by plain Gregorian arithmetic (no zone database needed
  *    for Z times).
  */
object Calendar {

  final case class IcsEvent(summary: String, location: String,
                            start: String, duration_min: Long)

  def parseIcs(raw: String): Option[Seq[IcsEvent]] = {
    if (raw == null) return None
    val lines = unfold(raw)
    if (!lines.headOption.exists(_.equalsIgnoreCase("BEGIN:VCALENDAR")))
      return None
    val events = Vector.newBuilder[IcsEvent]
    var inEvent = false
    var depth = 0 // nested components inside the event (VALARM)
    var summary = ""; var location = ""
    var start = -1L; var end = -1L
    lines.foreach { line =>
      val (name, value) = splitLine(line)
      val uname = name.toUpperCase
      if (uname == "BEGIN" && value.equalsIgnoreCase("VEVENT")) {
        inEvent = true; depth = 0
        summary = ""; location = ""; start = -1L; end = -1L
      } else if (inEvent && uname == "BEGIN") depth += 1
      else if (inEvent && uname == "END" &&
        value.equalsIgnoreCase("VEVENT")) {
        if (start >= 0)
          events += IcsEvent(summary, location, fmtUtc(start),
            if (end >= start) (end - start) / 60000L else 0L)
        inEvent = false
      } else if (inEvent && uname == "END") depth = math.max(0, depth - 1)
      else if (inEvent && depth == 0) uname match {
        case "SUMMARY" => summary = unescape(value)
        case "LOCATION" => location = unescape(value)
        case "DTSTART" => start = parseUtc(value).getOrElse(-1L)
        case "DTEND" => end = parseUtc(value).getOrElse(-1L)
        case _ => ()
      }
    }
    Some(events.result())
  }

  /** RFC 5545 unfolding: a line starting with SPACE/HTAB continues
    * the previous line with that ONE char removed. */
  private def unfold(raw: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var cur: StringBuilder = null
    raw.split("\r\n|\n", -1).foreach { line =>
      if (line.nonEmpty && (line.charAt(0) == ' ' ||
        line.charAt(0) == '\t')) {
        if (cur != null) cur.append(line.substring(1))
      } else {
        if (cur != null && cur.nonEmpty) out += cur.toString
        cur = new StringBuilder(line)
      }
    }
    if (cur != null && cur.nonEmpty) out += cur.toString
    out.result()
  }

  /** (name, value) at the first ':' outside a quoted param value;
    * params between ';' and ':' drop. */
  private def splitLine(line: String): (String, String) = {
    var i = 0
    var inQuote = false
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') inQuote = !inQuote
      else if (c == ':' && !inQuote) {
        val header = line.substring(0, i)
        val semi = header.indexOf(';')
        return (if (semi < 0) header else header.substring(0, semi),
          line.substring(i + 1))
      }
      i += 1
    }
    (line, "")
  }

  private def unescape(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case 'n' | 'N' => sb.append('\n')
          case other => sb.append(other) // \, \; \\ and tolerance
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** `yyyyMMddTHHmmssZ` → epoch millis (proleptic Gregorian, UTC). */
  private[graft] def parseUtc(v: String): Option[Long] = {
    if (v.length != 16 || v.charAt(8) != 'T' || v.charAt(15) != 'Z')
      return None
    def num(from: Int, len: Int): Option[Int] = {
      var r = 0; var i = from
      while (i < from + len) {
        val c = v.charAt(i)
        if (c < '0' || c > '9') return None
        r = r * 10 + (c - '0'); i += 1
      }
      Some(r)
    }
    for {
      y <- num(0, 4); mo <- num(4, 2); d <- num(6, 2)
      h <- num(9, 2); mi <- num(11, 2); s <- num(13, 2)
      if mo >= 1 && mo <= 12 && d >= 1 && d <= 31 && h < 24 &&
        mi < 60 && s < 60
    } yield {
      // days since epoch via the standard civil-date formula
      val yy = if (mo <= 2) y - 1 else y
      val era = (if (yy >= 0) yy else yy - 399) / 400
      val yoe = yy - era * 400
      val doy = (153 * (if (mo > 2) mo - 3 else mo + 9) + 2) / 5 + d - 1
      val doe = yoe * 365 + yoe / 4 - yoe / 100 + doy
      val days = era * 146097L + doe - 719468L
      ((days * 24 + h) * 60 + mi) * 60000L + s * 1000L
    }
  }

  private def fmtUtc(epochMs: Long): String = {
    // inverse of parseUtc, for a stable "yyyy-MM-dd HH:mm:ss" output
    var days = epochMs / 86400000L
    var rem = epochMs % 86400000L
    if (rem < 0) { rem += 86400000L; days -= 1 }
    val s = (rem / 1000L).toInt
    val z = days + 719468L
    val era = (if (z >= 0) z else z - 146096L) / 146097L
    val doe = z - era * 146097L
    val yoe = (doe - doe / 1460 + doe / 36524 - doe / 146096) / 365
    val doy = doe - (365 * yoe + yoe / 4 - yoe / 100)
    val mp = (5 * doy + 2) / 153
    val d = doy - (153 * mp + 2) / 5 + 1
    val mo = if (mp < 10) mp + 3 else mp - 9
    val y = yoe + era * 400 + (if (mo <= 2) 1 else 0)
    f"$y%04d-$mo%02d-$d%02d ${s / 3600}%02d:${s / 60 % 60}%02d:${s % 60}%02d"
  }

  // ---- fixture ------------------------------------------------------ //

  /** Deterministic per-id VCALENDAR: two VEVENTs — the first with a
    * FOLDED summary carrying escaped commas, a quoted param
    * containing ':' (the splitLine trap), and a VALARM whose
    * DESCRIPTION must NOT leak into the event; the second plain. */
  def synthIcs(id: Long): String = {
    val d = id % 10
    val h = id % 12 // event 1 hour
    val durMin = (id % 4 + 1) * 10
    val endMin = durMin % 60
    val endH = h + durMin / 60
    "BEGIN:VCALENDAR\r\nVERSION:2.0\r\nPRODID:-//graft//EN\r\n" +
      "BEGIN:VEVENT\r\n" +
      s"UID:ev1-$id@graft\r\n" +
      f"DTSTART:20240301T$h%02d0000Z\r\n" +
      f"DTEND:20240301T$endH%02d$endMin%02d00Z\r\n" +
      // two leading spaces: one is the fold marker (dropped), one is
      // content — unfolding must yield "... team D and planning D"
      s"SUMMARY:Standup\\, team $d\r\n  and planning $d\r\n" +
      "ORGANIZER;CN=\"Boss: the one\":mailto:boss@example.com\r\n" +
      s"LOCATION:Room $d\r\n" +
      "BEGIN:VALARM\r\nTRIGGER:-PT5M\r\n" +
      "DESCRIPTION:decoy alarm text\r\nEND:VALARM\r\n" +
      "END:VEVENT\r\n" +
      "BEGIN:VEVENT\r\n" +
      s"UID:ev2-$id@graft\r\n" +
      s"DTSTART:20240302T${10 + id % 8}0000Z\r\n" +
      s"DTEND:20240302T${10 + id % 8}3000Z\r\n" +
      s"SUMMARY:Review ${id % 7}\r\n" +
      "END:VEVENT\r\n" +
      "END:VCALENDAR\r\n"
  }

  // ---- vCard --------------------------------------------------------- //

  /** One address-book card: N's family/given, the formatted name,
    * first email/phone (params like TYPE=work skipped), org. */
  final case class VCard(family: String, given: String, fn: String,
                         email: String, tel: String, org: String)

  /** vCard 3.0/4.0 (RFC 6350) — the contact format beside iCalendar,
    * sharing its content-line machinery (same unfolding, same
    * param-skipping, same escapes). `BEGIN:VCARD`..`END:VCARD` blocks;
    * N splits family;given on UNESCAPED semicolons; first occurrence
    * wins per property (the dedup convention address-book importers
    * apply). */
  def parseVcards(raw: String): Option[Seq[VCard]] = {
    if (raw == null) return None
    val lines = unfold(raw)
    if (!lines.headOption.exists(_.equalsIgnoreCase("BEGIN:VCARD")))
      return None
    val out = Vector.newBuilder[VCard]
    var in = false
    var family = ""; var given = ""; var fn = ""
    var email = ""; var tel = ""; var org = ""
    lines.foreach { line =>
      val (name, value) = splitLine(line)
      val uname = name.toUpperCase
      if (uname == "BEGIN" && value.equalsIgnoreCase("VCARD")) {
        in = true
        family = ""; given = ""; fn = ""; email = ""; tel = ""; org = ""
      } else if (uname == "END" && value.equalsIgnoreCase("VCARD")) {
        if (in) out += VCard(family, given, fn, email, tel, org)
        in = false
      } else if (in) uname match {
        case "N" if family.isEmpty && given.isEmpty =>
          val parts = splitUnescaped(value, ';')
          family = unescape(parts.headOption.getOrElse(""))
          given = unescape(if (parts.length > 1) parts(1) else "")
        case "FN" if fn.isEmpty => fn = unescape(value)
        case "EMAIL" if email.isEmpty => email = unescape(value)
        case "TEL" if tel.isEmpty => tel = unescape(value)
        case "ORG" if org.isEmpty =>
          org = unescape(splitUnescaped(value, ';').headOption
            .getOrElse(""))
        case _ => ()
      }
    }
    Some(out.result())
  }

  /** Split on `sep` except where a backslash escapes it. */
  private def splitUnescaped(s: String, sep: Char): Seq[String] = {
    val out = Vector.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) { sb.append(c).append(s.charAt(i + 1)); i += 2 }
      else if (c == sep) { out += sb.toString; sb.clear(); i += 1 }
      else { sb.append(c); i += 1 }
    }
    out += sb.toString
    out.result()
  }

  /** Deterministic per-id 2-card file: the first card has an escaped
    * semicolon in ORG, a folded FN, and TYPE params to skip; the
    * second is minimal. */
  def synthVcf(id: Long): String = {
    val d = id % 10
    "BEGIN:VCARD\r\nVERSION:4.0\r\n" +
      s"N:Fam$d;Giv${id % 7};;;\r\n" +
      s"FN:Giv${id % 7}\r\n  Fam$d\r\n" +
      s"EMAIL;TYPE=work:g$d@corp.example\r\n" +
      s"EMAIL;TYPE=home:decoy$d@home.example\r\n" +
      s"TEL;TYPE=\"cell:main\":+1-555-010$d\r\n" +
      s"ORG:Acme\\; Sons $d;Unit ${id % 5}\r\n" +
      "END:VCARD\r\n" +
      "BEGIN:VCARD\r\nVERSION:3.0\r\n" +
      s"N:Solo${id % 5};;;;\r\n" +
      s"FN:Solo${id % 5}\r\n" +
      "END:VCARD\r\n"
  }

  def synthVcfCol(c: Column): Column =
    udf { id: Long => synthVcf(id) }.apply(c)
  /** text → array<struct<family, given, fn, email, tel, org>>. */
  def vcardsCol(c: Column): Column =
    udf { s: String => parseVcards(s) }.apply(c)

  def synthIcsCol(c: Column): Column =
    udf { id: Long => synthIcs(id) }.apply(c)
  /** text → array<struct<summary, location, start, duration_min>>. */
  def icsEventsCol(c: Column): Column =
    udf { s: String => parseIcs(s) }.apply(c)
}

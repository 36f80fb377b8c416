package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Subtitle parsing — SRT and WebVTT, the text half of a
  * video-training pair (captions are what a multimodal pipeline
  * aligns against frames; a caption corpus is also clean
  * conversational text). Dependency-free line walking:
  *
  *  - SRT: blank-line-separated cues — index line, `HH:MM:SS,mmm -->
  *    HH:MM:SS,mmm` timing, then 1+ text lines (joined with \n);
  *  - WebVTT: `WEBVTT` magic, then cues with `.` millisecond
  *    separators and an OPTIONAL hour field (`MM:SS.mmm` or
  *    `HH:MM:SS.mmm`); optional cue identifiers and trailing setting
  *    strings (`align:start`) after the timing are tolerated; NOTE
  *    blocks skip.
  *
  * Strict where it counts: a cue with a malformed timestamp, or
  * end <= start, rejects the whole document (None — corrupt timing
  * must not mint misaligned pairs). Pure per-row map work.
  */
object Subtitles {

  final case class Cue(idx: Int, start_ms: Long, end_ms: Long,
                       text: String)

  def parseSrt(s: String): Option[Seq[Cue]] = {
    if (s == null) return None
    val blocks = s.split("\n\\s*\n").map(_.trim).filter(_.nonEmpty)
    val out = Vector.newBuilder[Cue]
    blocks.foreach { block =>
      val lines = block.split("\n")
      if (lines.length < 2) return None
      val idx = lines(0).trim.toIntOption.getOrElse(return None)
      val (a, b) = timing(lines(1), srt = true).getOrElse(return None)
      out += Cue(idx, a, b, lines.drop(2).mkString("\n"))
    }
    Some(out.result())
  }

  def parseVtt(s: String): Option[Seq[Cue]] = {
    if (s == null || !s.startsWith("WEBVTT")) return None
    val blocks = s.split("\n\\s*\n").map(_.trim).filter(_.nonEmpty)
    val out = Vector.newBuilder[Cue]
    var idx = 0
    blocks.foreach { block =>
      if (!block.startsWith("WEBVTT") && !block.startsWith("NOTE") &&
        !block.startsWith("STYLE")) {
        val lines = block.split("\n")
        // optional cue identifier line before the timing
        val tAt = lines.indexWhere(_.contains("-->"))
        if (tAt < 0 || tAt > 1) return None
        val (a, b) = timing(lines(tAt), srt = false)
          .getOrElse(return None)
        idx += 1
        out += Cue(idx, a, b, lines.drop(tAt + 1).mkString("\n"))
      }
    }
    Some(out.result())
  }

  /** `start --> end` with the format's separator; None on shape or
    * ordering violations. */
  private def timing(line: String, srt: Boolean): Option[(Long, Long)] = {
    val arrow = line.indexOf("-->")
    if (arrow < 0) return None
    val left = line.substring(0, arrow).trim
    // VTT allows cue settings after the end stamp
    val rightRaw = line.substring(arrow + 3).trim
    val right = rightRaw.takeWhile(c => !c.isWhitespace)
    for {
      a <- stamp(left, srt)
      b <- stamp(right, srt)
      if b > a
    } yield (a, b)
  }

  /** `HH:MM:SS,mmm` (SRT) / `[HH:]MM:SS.mmm` (VTT) → millis. */
  private def stamp(t: String, srt: Boolean): Option[Long] = {
    val sep = if (srt) ',' else '.'
    val dot = t.lastIndexOf(sep)
    if (dot < 0 || t.length - dot != 4) return None
    val ms = t.substring(dot + 1).toLongOption.getOrElse(return None)
    val parts = t.substring(0, dot).split(":")
    // fields are fixed-width: minutes/seconds exactly 2 digits,
    // hours at least 2 — "0:0:1" is not a timestamp
    val ok = parts.forall(p => p.forall(_.isDigit)) &&
      parts.takeRight(2).forall(_.length == 2) &&
      parts.forall(_.length >= 2)
    if (!ok) return None
    val nums = parts.map(_.toLong)
    val (h, m, s) = nums.length match {
      case 3 => (nums(0), nums(1), nums(2))
      case 2 if !srt => (0L, nums(0), nums(1))
      case _ => return None
    }
    if (m > 59 || s > 59 || ms > 999) return None
    Some(((h * 60 + m) * 60 + s) * 1000 + ms)
  }

  /** ASS/SSA (SubStation Alpha) — the third subtitle format a video
    * crawl meets (anime/fansub corpora ship it almost exclusively).
    * Section walk to `[Events]`, the `Format:` line names the field
    * order, `Dialogue:` lines split with a field-count limit (the Text
    * field may itself contain commas). Times are `H:MM:SS.cc`
    * CENTIseconds. Text cleanup: `{…}` override tags strip, `\N`/`\n`
    * become newlines, `\h` a space. `Comment:` lines skip. Same
    * strictness as SRT/VTT: malformed timing or end <= start rejects
    * the document. */
  def parseAss(s: String): Option[Seq[Cue]] = {
    if (s == null) return None
    var inEvents = false
    var sawEvents = false
    var fmt: Array[String] = null
    val out = Vector.newBuilder[Cue]
    var idx = 0
    s.split("\r?\n").foreach { ln =>
      val t = ln.trim
      if (t.startsWith("[")) {
        inEvents = t.equalsIgnoreCase("[Events]")
        sawEvents |= inEvents
      } else if (inEvents && t.startsWith("Format:")) {
        fmt = t.substring(7).split(",").map(_.trim)
      } else if (inEvents && t.startsWith("Dialogue:")) {
        if (fmt == null) return None
        val vals = t.substring(9).trim.split(",", fmt.length)
        if (vals.length < fmt.length) return None
        def field(name: String): Option[String] = {
          val i = fmt.indexWhere(_.equalsIgnoreCase(name))
          if (i < 0) None else Some(vals(i))
        }
        val a = field("Start").flatMap(assStamp).getOrElse(return None)
        val b = field("End").flatMap(assStamp).getOrElse(return None)
        if (b <= a) return None
        val raw = field("Text").getOrElse(return None)
        idx += 1
        out += Cue(idx, a, b, cleanAssText(raw))
      } // headers, styles, Comment: lines — skipped
    }
    if (!sawEvents) return None
    Some(out.result())
  }

  private val AssStampRe = "(\\d+):([0-5]\\d):([0-5]\\d)\\.(\\d\\d)".r

  private def assStamp(t: String): Option[Long] = t.trim match {
    case AssStampRe(h, m, sec, cs) =>
      Some(((h.toLong * 60 + m.toLong) * 60 + sec.toLong) * 1000 +
        cs.toLong * 10)
    case _ => None
  }

  private def cleanAssText(t: String): String =
    t.replaceAll("\\{[^}]*\\}", "")
      .replace("\\N", "\n").replace("\\n", "\n").replace("\\h", " ")

  /** text → array<struct<idx, start_ms, end_ms, text>>; ASS, VTT, or
    * SRT chosen by the magic; null when malformed. */
  def cuesCol(c: Column): Column =
    udf { s: String =>
      Option(s).flatMap { v =>
        if (v.startsWith("WEBVTT")) parseVtt(v)
        else if (v.startsWith("[Script Info]")) parseAss(v)
        else parseSrt(v)
      }.map(_.map(q => (q.idx, q.start_ms, q.end_ms, q.text)))
    }.apply(c)
}

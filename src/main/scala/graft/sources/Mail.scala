package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import graft.text.Html

/** RFC 5322 / MIME email extraction — mailing-list archives and
  * mail-dump corpora are a standing LLM-pretraining source, and every
  * message needs the same four decodes before its text is usable:
  * header unfolding, RFC 2047 encoded-words (B/Q) in Subject,
  * multipart boundary splitting (nested one level for the
  * mixed[alternative[...]] shape real clients emit), and per-part
  * Content-Transfer-Encoding (7bit/8bit pass-through,
  * quoted-printable with soft line breaks, base64). text/plain parts
  * surface directly, text/html parts go through [[Html.htmlToText]],
  * anything else counts as an attachment and contributes no text.
  *
  * Tolerant by design (crawl material): an undecodable part drops
  * rather than failing the message; a missing boundary degrades the
  * body to a single opaque part; only a structurally header-less
  * input returns None.
  */
object Mail {

  final case class EmlMeta(from: String, to: String, subject: String,
                           n_parts: Int, n_attachments: Int, text: String)

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val Latin1 = java.nio.charset.StandardCharsets.ISO_8859_1
  private val MaxDepth = 4

  def parseEml(raw: String): Option[EmlMeta] = {
    if (raw == null || raw.isEmpty) return None
    val (headers, body) = splitMessage(raw)
    if (headers.isEmpty) return None
    def h(name: String): Option[String] = headers.collectFirst {
      case (k, v) if k.equalsIgnoreCase(name) => v
    }
    // at least one of the structural headers must be present, or this
    // is not a message (arbitrary text would otherwise "parse")
    if (h("From").isEmpty && h("To").isEmpty && h("Subject").isEmpty &&
      h("Date").isEmpty && h("MIME-Version").isEmpty) return None
    var nParts = 0
    var nAttach = 0
    val texts = Vector.newBuilder[String]
    def walk(hs: Seq[(String, String)], bd: String, depth: Int): Unit = {
      def hh(name: String): Option[String] = hs.collectFirst {
        case (k, v) if k.equalsIgnoreCase(name) => v
      }
      val ct = hh("Content-Type").getOrElse("text/plain")
      val mediaType = ct.takeWhile(_ != ';').trim.toLowerCase
      val boundary = param(ct, "boundary")
      if (mediaType.startsWith("multipart/") && boundary.nonEmpty &&
        depth < MaxDepth) {
        splitParts(bd, boundary.get).foreach { part =>
          val (ph, pb) = splitMessage(part)
          walk(ph, pb, depth + 1)
        }
      } else {
        nParts += 1
        val cte = hh("Content-Transfer-Encoding")
          .map(_.trim.toLowerCase).getOrElse("7bit")
        val charset = param(ct, "charset")
          .map(_.toLowerCase).getOrElse("utf-8")
        val disposition = hh("Content-Disposition")
          .map(_.takeWhile(_ != ';').trim.toLowerCase)
        val isAttachment = disposition.contains("attachment") ||
          !(mediaType.startsWith("text/") || mediaType.isEmpty)
        if (isAttachment) nAttach += 1
        else decodeBody(bd, cte, charset).foreach { decoded =>
          val t = if (mediaType == "text/html") Html.htmlToText(decoded)
            else decoded.trim
          if (t.nonEmpty) texts += t
        }
      }
    }
    walk(headers, body, 0)
    Some(EmlMeta(
      h("From").getOrElse(""), h("To").getOrElse(""),
      decodeEncodedWords(h("Subject").getOrElse("")),
      nParts, nAttach, texts.result().mkString("\n")))
  }

  /** Headers (unfolded, in order) + body, split at the first blank
    * line. A continuation line (leading WSP) joins its predecessor
    * with one space. */
  private def splitMessage(raw: String): (Seq[(String, String)], String) = {
    val lines = raw.split("\r\n|\n", -1)
    val headers = Vector.newBuilder[(String, String)]
    var cur: (String, String) = null
    var i = 0
    var bodyAt = -1
    while (i < lines.length && bodyAt < 0) {
      val line = lines(i)
      if (line.isEmpty) bodyAt = i + 1
      else if (line.charAt(0) == ' ' || line.charAt(0) == '\t') {
        if (cur != null) cur = (cur._1, cur._2 + " " + line.trim)
      } else {
        if (cur != null) headers += cur
        val colon = line.indexOf(':')
        if (colon <= 0) { cur = null } // junk line: not a header
        else cur = (line.substring(0, colon).trim,
          line.substring(colon + 1).trim)
      }
      i += 1
    }
    if (cur != null) headers += cur
    val body = if (bodyAt < 0) ""
      else lines.drop(bodyAt).mkString("\n")
    (headers.result(), body)
  }

  /** `name=value` parameter of a structured header value (quoted or
    * token form), case-insensitive on the name. */
  private def param(headerValue: String, name: String): Option[String] = {
    val lower = headerValue.toLowerCase
    var at = lower.indexOf(name.toLowerCase + "=")
    while (at >= 0) {
      val before = if (at == 0) ' ' else lower.charAt(at - 1)
      if (before == ';' || before.isWhitespace) {
        val vStart = at + name.length + 1
        if (vStart >= headerValue.length) return None
        return Some(if (headerValue.charAt(vStart) == '"') {
          val close = headerValue.indexOf('"', vStart + 1)
          if (close < 0) headerValue.substring(vStart + 1)
          else headerValue.substring(vStart + 1, close)
        } else headerValue.substring(vStart)
          .takeWhile(c => c != ';' && !c.isWhitespace))
      }
      at = lower.indexOf(name.toLowerCase + "=", at + 1)
    }
    None
  }

  /** Body → parts between `--boundary` delimiter lines; the
    * `--boundary--` terminator ends the walk (RFC 2046 §5.1.1). */
  private def splitParts(body: String, boundary: String): Seq[String] = {
    val delim = "--" + boundary
    val lines = body.split("\n", -1)
    val parts = Vector.newBuilder[String]
    var cur: StringBuilder = null
    var i = 0
    var done = false
    while (i < lines.length && !done) {
      val line = lines(i).stripSuffix("\r")
      if (line == delim + "--") {
        if (cur != null) parts += cur.toString
        cur = null; done = true
      } else if (line == delim) {
        if (cur != null) parts += cur.toString
        cur = new StringBuilder
      } else if (cur != null) {
        if (cur.nonEmpty) cur.append('\n')
        cur.append(lines(i)) // keep \r: QP soft breaks handle either
      }
      i += 1
    }
    // unterminated final part still counts (tolerance over strictness)
    if (cur != null && !done) parts += cur.toString
    parts.result()
  }

  /** Per-part transfer decode: 7bit/8bit/binary pass through, QP and
    * base64 decode to bytes then charset-decode. None = undecodable
    * (the part drops, the message survives). */
  private def decodeBody(body: String, cte: String,
      charset: String): Option[String] = {
    val cs = charset match {
      case "iso-8859-1" | "latin1" | "us-ascii" => Latin1
      case _ => Utf8
    }
    cte match {
      case "base64" =>
        try {
          val compact = body.filterNot(_.isWhitespace)
          Some(new String(java.util.Base64.getDecoder.decode(compact), cs))
        } catch { case _: IllegalArgumentException => None }
      case "quoted-printable" => Some(decodeQp(body, cs))
      case "7bit" | "8bit" | "binary" | "" => Some(body)
      case _ => None // unknown encoding: drop the part, keep the message
    }
  }

  /** RFC 2045 §6.7 quoted-printable: `=XX` hex octets, `=\n` /
    * `=\r\n` soft line breaks; malformed escapes pass through
    * literally (tolerance). Underscore is NOT special here — that is
    * Q-encoding's rule ([[decodeEncodedWords]]), not body QP's. */
  private def decodeQp(s: String, cs: java.nio.charset.Charset): String = {
    val out = new java.io.ByteArrayOutputStream(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '=' && i + 1 < s.length &&
        (s.charAt(i + 1) == '\n' || s.charAt(i + 1) == '\r')) {
        i += (if (s.charAt(i + 1) == '\r' && i + 2 < s.length &&
          s.charAt(i + 2) == '\n') 3 else 2) // soft break: joins lines
      } else if (c == '=' && i + 2 < s.length &&
        isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        out.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else { out.write(c.toInt & 0xff); i += 1 }
    }
    new String(out.toByteArray, cs)
  }

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F') || (c >= 'a' && c <= 'f')

  /** RFC 2047 encoded-words in a header: `=?charset?B?...?=` (base64)
    * and `=?charset?Q?...?=` (Q: underscore = space, `=XX` hex).
    * Whitespace BETWEEN adjacent encoded words is transparent (the
    * RFC's folding rule); undecodable words stay literal. */
  def decodeEncodedWords(s: String): String = {
    // linear whitespace between two encoded words vanishes
    val joined = s.replaceAll("\\?=[ \t]+=\\?", "?==?")
    val Word = "=\\?([^?]+)\\?([BbQq])\\?([^?]*)\\?=".r
    Word.replaceAllIn(joined, m => {
      val cs = m.group(1).toLowerCase match {
        case "iso-8859-1" | "latin1" | "us-ascii" => Latin1
        case _ => Utf8
      }
      val decoded = m.group(2).toUpperCase match {
        case "B" =>
          try Some(new String(
            java.util.Base64.getDecoder.decode(m.group(3)), cs))
          catch { case _: IllegalArgumentException => None }
        case _ =>
          Some(decodeQp(m.group(3).replace('_', ' '), cs))
      }
      java.util.regex.Matcher.quoteReplacement(
        decoded.getOrElse(m.group(0)))
    })
  }

  // ---- fixture + Column lifts --------------------------------------- //

  /** Deterministic per-id message cycling three shapes by id%3:
    * 0 = plain 7bit text/plain (with a FOLDED To header);
    * 1 = multipart/mixed[ multipart/alternative[ text/plain QP with a
    *     soft break + =C3=A9, text/html base64 ], attachment ] and a
    *     B-encoded Subject;
    * 2 = multipart/alternative[ text/plain base64, text/html QP ]
    *     with a Q-encoded Subject split across TWO adjacent encoded
    *     words (the whitespace-transparency rule). */
  def synthEml(id: Long): String = {
    val d = (id % 10).toString
    val from = s"user${id % 30}@example.com"
    val to = s"list${id % 7}@example.org"
    (id % 3) match {
      case 0 =>
        s"From: $from\r\nTo: $to,\r\n second@example.org\r\n" +
          s"Subject: Plain note $d\r\nMIME-Version: 1.0\r\n" +
          "Content-Type: text/plain; charset=utf-8\r\n\r\n" +
          s"Hello body $d\r\nBye $d\r\n"
      case 1 =>
        val b64 = java.util.Base64.getEncoder.encodeToString(
          s"Réport $d".getBytes(Utf8))
        val htmlB64 = java.util.Base64.getEncoder.encodeToString(
          s"<p>Para $d</p><p>End $d</p>".getBytes(Utf8))
        s"From: $from\r\nTo: $to\r\n" +
          s"Subject: =?UTF-8?B?$b64?=\r\nMIME-Version: 1.0\r\n" +
          "Content-Type: multipart/mixed; boundary=\"outer9\"\r\n\r\n" +
          "--outer9\r\n" +
          "Content-Type: multipart/alternative; boundary=inner7\r\n\r\n" +
          "--inner7\r\n" +
          "Content-Type: text/plain; charset=utf-8\r\n" +
          "Content-Transfer-Encoding: quoted-printable\r\n\r\n" +
          s"Caf=C3=A9 one $d=\r\n two\r\n" +
          "--inner7\r\n" +
          "Content-Type: text/html; charset=utf-8\r\n" +
          "Content-Transfer-Encoding: base64\r\n\r\n" +
          s"$htmlB64\r\n" +
          "--inner7--\r\n" +
          "--outer9\r\n" +
          "Content-Type: application/octet-stream\r\n" +
          s"Content-Disposition: attachment; filename=\"data$d.bin\"\r\n" +
          "Content-Transfer-Encoding: base64\r\n\r\n" +
          "AAECAwQ=\r\n" +
          "--outer9--\r\n"
      case _ =>
        val b64 = java.util.Base64.getEncoder.encodeToString(
          s"Alt body $d".getBytes(Utf8))
        s"From: $from\r\nTo: $to\r\n" +
          s"Subject: =?UTF-8?Q?R=C3=A9sum=C3=A9_$d?= =?UTF-8?Q?_final?=\r\n" +
          "MIME-Version: 1.0\r\n" +
          "Content-Type: multipart/alternative; boundary=alt3\r\n\r\n" +
          "--alt3\r\n" +
          "Content-Type: text/plain; charset=utf-8\r\n" +
          "Content-Transfer-Encoding: base64\r\n\r\n" +
          s"$b64\r\n" +
          "--alt3\r\n" +
          "Content-Type: text/html; charset=utf-8\r\n" +
          "Content-Transfer-Encoding: quoted-printable\r\n\r\n" +
          s"<p>Html alt $d</p>\r\n" +
          "--alt3--\r\n"
    }
  }

  // ---- mbox ---------------------------------------------------------- //

  /** mbox → messages: the mailing-list archive container. Splits at
    * `From ` separator lines (the mboxo/mboxrd family's envelope
    * line — five chars at line start, NOT a `From:` header), strips
    * one `>` from `>From`-quoted body lines (the mboxrd convention),
    * and parses each message with [[parseEml]]. A file that doesn't
    * START with a `From ` line is not an mbox. */
  def mboxMessages(raw: String): Option[Seq[EmlMeta]] = {
    if (raw == null || !raw.startsWith("From ")) return None
    val out = Vector.newBuilder[EmlMeta]
    var cur: StringBuilder = null
    raw.split("\r\n|\n", -1).foreach { line =>
      if (line.startsWith("From ")) {
        if (cur != null) parseEml(cur.toString).foreach(out += _)
        cur = new StringBuilder
      } else if (cur != null) {
        if (cur.nonEmpty) cur.append('\n')
        // mboxrd: any >*From at line start loses exactly one '>'
        if (line.startsWith(">") &&
          line.dropWhile(_ == '>').startsWith("From "))
          cur.append(line.substring(1))
        else cur.append(line)
      }
    }
    if (cur != null) parseEml(cur.toString).foreach(out += _)
    Some(out.result())
  }

  /** Deterministic per-id mbox of three [[synthEml]] messages
    * (ids id, id+1, id+2) behind `From ` envelope lines, with a
    * `>From`-quoted body line spliced into the first message. */
  def synthMbox(id: Long): String = {
    def env(k: Long) =
      s"From sender$k@example.com Thu Jan  1 00:0$k:00 2024\n"
    val first = synthEml(id).replaceFirst(
      "Hello body", ">From the start\nHello body")
    // the >From splice only exists in the id%3==0 shape; other shapes
    // pass through untouched (replaceFirst finds no target)
    env(0) + first + env(1) + synthEml(id + 1) +
      env(2) + synthEml(id + 2)
  }

  def synthMboxCol(c: Column): Column =
    udf { id: Long => synthMbox(id) }.apply(c)
  /** text → array<struct<from, to, subject, n_parts, n_attachments,
    * text>>. */
  def mboxCol(c: Column): Column =
    udf { s: String => mboxMessages(s) }.apply(c)

  def synthEmlCol(c: Column): Column =
    udf { id: Long => synthEml(id) }.apply(c)
  /** text → struct<from, to, subject, n_parts, n_attachments, text>. */
  def emlCol(c: Column): Column =
    udf { s: String => parseEml(s) }.apply(c)
}

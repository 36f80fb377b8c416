package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** WARC/WET ingestion — the on-disk format LLM training corpora
  * actually arrive in (Common Crawl ships WET extracts as WARC 1.0 /
  * ISO 28500 records, each record an independently-gzipped member, so
  * a reader can split and stream without decoding the whole file).
  * Dependency-free: member inflate is JDK `GZIPInputStream` (which
  * consumes concatenated members natively), record parsing is strict
  * byte walking. The reference has no ingestion-format surface at all
  * (it reads pre-landed CSV, `lib/connector.py`); this is the
  * crawl-side boundary a 100 TB pipeline starts from.
  *
  * Scale shape: one WET file is one binary cell; parse is per-row map
  * work (no shuffle), records explode to rows downstream. Both
  * directions enforce caps and return None on any malformation —
  * truncated members, missing mandatory headers, short payloads,
  * trailing garbage — never junk records.
  */
object Warc {

  final case class WetRecord(targetUri: String, text: String)

  private val MaxInflated = 256L * 1024 * 1024

  /** Inflate a (possibly multi-member) gzip stream; None on corrupt
    * bytes or when the inflated size exceeds the cap. */
  def gunzipAll(b: Array[Byte]): Option[Array[Byte]] = {
    if (b.length < 2 || (b(0) & 0xff) != 0x1f || (b(1) & 0xff) != 0x8b)
      return None
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      var total = 0L
      while (n >= 0) {
        total += n
        if (total > MaxInflated) return None
        out.write(buf, 0, n)
        n = in.read(buf)
      }
      Some(out.toByteArray)
    } catch { case _: java.io.IOException => None }
  }

  /** One gzip member (the per-record CC convention). */
  def gzipMember(data: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(data); gz.close()
    out.toByteArray
  }

  private val Crlf = "\r\n"

  private def warcRecord(headers: Seq[(String, String)],
                         payload: Array[Byte]): Array[Byte] = {
    val h = new StringBuilder("WARC/1.0").append(Crlf)
    headers.foreach { case (k, v) => h.append(k).append(": ").append(v).append(Crlf) }
    h.append("Content-Length: ").append(payload.length).append(Crlf)
    h.append(Crlf)
    h.toString.getBytes("US-ASCII") ++ payload ++
      (Crlf + Crlf).getBytes("US-ASCII")
  }

  /** Build a WET file from (uri, text) conversions: a warcinfo record
    * followed by one conversion record per document, EACH record its
    * own gzip member (so the output is a spec-shaped multi-member
    * stream like Common Crawl's). */
  def buildWet(docs: Seq[(String, String)]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val info = warcRecord(Seq(
      "WARC-Type" -> "warcinfo",
      "WARC-Record-ID" -> "<urn:graft:warcinfo:0>"),
      "software: graft-wet-writer/1.0\r\n".getBytes("US-ASCII"))
    out.write(gzipMember(info))
    docs.foreach { case (uri, text) =>
      val rec = warcRecord(Seq(
        "WARC-Type" -> "conversion",
        "WARC-Target-URI" -> uri,
        "WARC-Record-ID" -> s"<urn:graft:rec:${uri.hashCode}>"),
        text.getBytes("UTF-8"))
      out.write(gzipMember(rec))
    }
    out.toByteArray
  }

  /** Parse an INFLATED WARC stream into records. Strict: every record
    * needs the version line, a Content-Length, terminating CRLF CRLF;
    * anything else (or trailing garbage) is None. */
  def parseWarc(b: Array[Byte]): Option[Seq[(Map[String, String], Array[Byte])]] = {
    val recs = Vector.newBuilder[(Map[String, String], Array[Byte])]
    var i = 0
    def line(): String = { // bytes to CRLF as ASCII; null on violation
      val start = i
      while (i + 1 < b.length && !(b(i) == '\r' && b(i + 1) == '\n')) i += 1
      if (i + 1 >= b.length) null
      else {
        val s = new String(b, start, i - start, "US-ASCII")
        i += 2
        s
      }
    }
    while (i < b.length) {
      val v = line()
      if (v == null || v != "WARC/1.0") return None
      var headers = Map.empty[String, String]
      var l = line()
      while (l != null && l.nonEmpty) {
        val c = l.indexOf(':')
        if (c <= 0) return None
        headers += (l.substring(0, c).trim -> l.substring(c + 1).trim)
        l = line()
      }
      if (l == null) return None
      val len = headers.get("Content-Length").flatMap(_.toLongOption)
        .getOrElse(-1L)
      if (len < 0 || len > MaxInflated || i + len + 4 > b.length) return None
      val payload = java.util.Arrays.copyOfRange(b, i, i + len.toInt)
      i += len.toInt
      if (!(b(i) == '\r' && b(i + 1) == '\n' &&
        b(i + 2) == '\r' && b(i + 3) == '\n')) return None
      i += 4
      recs += ((headers, payload))
    }
    Some(recs.result())
  }

  /** Full WET read: gunzip members, parse records, keep conversions as
    * (target URI, UTF-8 text). None if the stream is malformed or no
    * warcinfo leads it. */
  def parseWet(b: Array[Byte]): Option[Seq[WetRecord]] =
    gunzipAll(b).flatMap(parseWarc).flatMap { recs =>
      if (recs.isEmpty || !recs.head._1.get("WARC-Type").contains("warcinfo"))
        None
      else Some(recs.tail.flatMap { case (h, p) =>
        if (!h.get("WARC-Type").contains("conversion")) None
        else h.get("WARC-Target-URI").map(u =>
          WetRecord(u, new String(p, "UTF-8")))
      })
    }

  // ---- column wrappers -------------------------------------------------

  /** docs: array<struct<uri string, text string>> (caller sorts for
    * determinism) → WET bytes. */
  def buildWetCol(c: Column): Column =
    udf { rows: Seq[org.apache.spark.sql.Row] =>
      buildWet(rows.map(r => (r.getString(0), r.getString(1))))
    }.apply(c)

  /** WET bytes → array<struct<target_uri string, text string>>; null on
    * malformed input (never junk records). */
  def parseWetCol(c: Column): Column =
    udf { b: Array[Byte] => parseWet(b).map(_.map(r => (r.targetUri, r.text))) }
      .apply(c)
}

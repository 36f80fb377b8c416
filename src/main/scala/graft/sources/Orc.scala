package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** ORC footer census — the other columnar lake format beside Parquet
  * (q392), with the mirrored planning question: stripes, row counts,
  * compression, schema width, all answerable from the file TAIL
  * without touching data. Layout (ORC spec v1): …[footer][postscript]
  * [1-byte postscript length]; the PostScript is plain protobuf
  * (never compressed) carrying footerLength / compression /
  * writerVersion and the field-8000 "ORC" magic; the Footer is
  * protobuf, chunk-framed when compressed — each chunk has a 3-byte
  * little-endian header `(len << 1) | isOriginal`, and ORC "ZLIB" is
  * RAW DEFLATE (no zlib wrapper), decoded through the shared
  * bounds-guarded [[Inflate]].
  *
  * Extracted: compression kind, writer version, content length, total
  * rows, schema type count, and per stripe (offset, index/data/footer
  * lengths, rows). Scope: NONE and ZLIB compression (SNAPPY/LZO/
  * LZ4/ZSTD are entropy-codec boundaries, named as such); unknown
  * protobuf fields are skipped by wire type, and every length is
  * bounds-checked — a corrupt tail returns None, never throws.
  */
object Orc {

  final case class OrcStripe(offset: Long, index_len: Long,
                             data_len: Long, footer_len: Long,
                             n_rows: Long)
  final case class OrcMeta(compression: String, writer_version: Long,
                           content_length: Long, n_rows: Long,
                           n_types: Int, stripes: Seq[OrcStripe])

  private val compNames = Map(0 -> "none", 1 -> "zlib", 2 -> "snappy",
    3 -> "lzo", 4 -> "lz4", 5 -> "zstd")

  /** Minimal bounds-checked protobuf walker over a slice. */
  private final class PB(b: Array[Byte], var pos: Long, val end: Long) {
    def varint(): Option[Long] = {
      var v = 0L; var shift = 0
      while (shift <= 63) {
        if (pos >= end) return None
        val byt = b(pos.toInt) & 0xff
        pos += 1
        v |= (byt & 0x7fL) << shift
        if ((byt & 0x80) == 0) return Some(v)
        shift += 7
      }
      None
    }
    def lenSlice(): Option[(Long, Long)] = varint().flatMap { n =>
      if (n < 0 || pos + n > end) None
      else { val r = (pos, pos + n); pos += n; Some(r) }
    }
    def skip(wire: Int): Boolean = wire match {
      case 0 => varint().isDefined
      case 1 => if (pos + 8 > end) false else { pos += 8; true }
      case 2 => lenSlice().isDefined
      case 5 => if (pos + 4 > end) false else { pos += 4; true }
      case _ => false // groups / reserved: reject
    }
    /** Iterate fields; cb must consume the value (false poisons). */
    def fields(cb: (Long, Int) => Boolean): Boolean = {
      while (pos < end) {
        val key = varint().getOrElse(return false)
        val field = key >>> 3; val wire = (key & 7).toInt
        if (field == 0) return false
        if (!cb(field, wire)) return false
      }
      true
    }
  }

  private def str(b: Array[Byte], from: Long, until: Long): String =
    new String(b, from.toInt, (until - from).toInt,
      java.nio.charset.StandardCharsets.US_ASCII)

  /** Un-frame an ORC compressed stream: 3-byte LE chunk headers,
    * `(len << 1) | isOriginal`, raw-deflate non-original chunks. */
  private def unframe(b: Array[Byte], from: Long, until: Long)
    : Option[Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream()
    var p = from
    while (p < until) {
      if (p + 3 > until) return None
      val h = (b(p.toInt) & 0xffL) | ((b(p.toInt + 1) & 0xffL) << 8) |
        ((b(p.toInt + 2) & 0xffL) << 16)
      val clen = h >>> 1
      val original = (h & 1) == 1
      p += 3
      if (clen <= 0 || p + clen > until) return None
      val chunk = java.util.Arrays.copyOfRange(b, p.toInt, (p + clen).toInt)
      p += clen
      if (original) out.write(chunk)
      else out.write(Inflate(chunk, raw = true, cap = 1 << 24)
        .getOrElse(return None))
      if (out.size > (1 << 24)) return None // footer bomb
    }
    Some(out.toByteArray)
  }

  def parseOrc(b: Array[Byte]): Option[OrcMeta] = {
    if (b == null || b.length < 16) return None
    if (b(0) != 'O' || b(1) != 'R' || b(2) != 'C') return None
    val psLen = b(b.length - 1) & 0xff
    val psStart = b.length - 1L - psLen
    if (psLen < 4 || psStart < 3) return None
    // --- PostScript (plain protobuf) --------------------------------- //
    var footerLen = -1L
    var comp = 0
    var writerVersion = 0L
    var magicOk = false
    val ps = new PB(b, psStart, b.length - 1L)
    val psOk = ps.fields { (f, w) =>
      (f, w) match {
        case (1, 0) => ps.varint() match {
          case Some(v) => footerLen = v; true
          case None => false
        }
        case (2, 0) => ps.varint() match {
          case Some(v) => comp = v.toInt; true
          case None => false
        }
        case (6, 0) => ps.varint() match {
          case Some(v) => writerVersion = v; true
          case None => false
        }
        case (8000, 2) => ps.lenSlice() match {
          case Some((a, z)) => magicOk = str(b, a, z) == "ORC"; true
          case None => false
        }
        case (_, wire) => ps.skip(wire)
      }
    }
    if (!psOk || !magicOk || footerLen <= 0) return None
    if (!compNames.contains(comp)) return None
    val fStart = psStart - footerLen
    if (fStart < 3) return None
    // --- Footer (possibly chunk-framed) ------------------------------ //
    val footer: Array[Byte] = comp match {
      case 0 => java.util.Arrays.copyOfRange(b, fStart.toInt, psStart.toInt)
      case 1 => unframe(b, fStart, psStart).getOrElse(return None)
      case _ => return None // snappy/lzo/lz4/zstd: codec boundary
    }
    var contentLength = -1L
    var nRows = -1L
    var nTypes = 0
    val stripes = Vector.newBuilder[OrcStripe]
    val fb = new PB(footer, 0L, footer.length.toLong)
    val fOk = fb.fields { (f, w) =>
      (f, w) match {
        case (2, 0) => fb.varint() match {
          case Some(v) => contentLength = v; true
          case None => false
        }
        case (3, 2) => fb.lenSlice() match { // StripeInformation
          case Some((a, z)) =>
            var off = -1L; var il = -1L; var dl = -1L
            var fl = -1L; var nr = -1L
            val sb = new PB(footer, a, z)
            val ok = sb.fields { (sf, sw) =>
              (sf, sw) match {
                case (1, 0) => sb.varint() match {
                  case Some(v) => off = v; true; case None => false
                }
                case (2, 0) => sb.varint() match {
                  case Some(v) => il = v; true; case None => false
                }
                case (3, 0) => sb.varint() match {
                  case Some(v) => dl = v; true; case None => false
                }
                case (4, 0) => sb.varint() match {
                  case Some(v) => fl = v; true; case None => false
                }
                case (5, 0) => sb.varint() match {
                  case Some(v) => nr = v; true; case None => false
                }
                case (_, sw2) => sb.skip(sw2)
              }
            }
            if (!ok || off < 0 || nr < 0) return None
            stripes += OrcStripe(off, il.max(0), dl.max(0), fl.max(0), nr)
            true
          case None => false
        }
        case (4, 2) => // Type — count them, skip the body
          fb.lenSlice() match {
            case Some(_) => nTypes += 1; true
            case None => false
          }
        case (6, 0) => fb.varint() match {
          case Some(v) => nRows = v; true
          case None => false
        }
        case (_, wire) => fb.skip(wire)
      }
    }
    if (!fOk || nRows < 0 || nTypes == 0) return None
    Some(OrcMeta(compNames(comp), writerVersion, contentLength.max(0),
      nRows, nTypes, stripes.result()))
  }

  // ---- fixture ------------------------------------------------------ //

  private final class PW {
    val out = new java.io.ByteArrayOutputStream()
    def varint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) {
        out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
      }
      out.write(v.toInt)
    }
    def field(f: Long, wire: Int): Unit = varint((f << 3) | wire)
    def vint(f: Long, v: Long): Unit = { field(f, 0); varint(v) }
    def bytes(f: Long, v: Array[Byte]): Unit = {
      field(f, 2); varint(v.length.toLong); out.write(v)
    }
  }

  /** Deterministic per-id ORC tail: g = id%3+1 stripes with
    * closed-form spans, a STRUCT root + id%4+1 children, NONE
    * compression on even ids and chunk-framed raw-deflate ZLIB on
    * odd, plus an unknown PostScript field the skip path must walk.
    */
  def synthOrc(id: Long): Array[Byte] = {
    val g = (id % 3 + 1).toInt
    val m = (id % 4 + 1).toInt
    val rowsPer = id % 50 + 10
    val zlib = id % 2 == 1
    // Footer proto
    val fw = new PW
    fw.vint(1, 3L) // headerLength ("ORC")
    fw.vint(2, 3L + g * 1000L) // contentLength
    (0 until g).foreach { k =>
      val sw = new PW
      sw.vint(1, 3L + k * 1000L) // offset
      sw.vint(2, 50L + k) // indexLength
      sw.vint(3, 800L + 10 * k + id % 100) // dataLength
      sw.vint(4, 40L + k) // footerLength
      sw.vint(5, rowsPer) // numberOfRows
      fw.bytes(3, sw.out.toByteArray)
    }
    // types: struct root + m leaves (kind cycle long/string/double/date)
    val rootT = new PW
    rootT.vint(1, 12L) // STRUCT
    (0 until m).foreach { j => rootT.field(2, 0); rootT.varint(j + 1L) }
    fw.bytes(4, rootT.out.toByteArray)
    (0 until m).foreach { j =>
      val t = new PW
      t.vint(1, Seq(4L, 7L, 6L, 15L)(j % 4))
      fw.bytes(4, t.out.toByteArray)
    }
    fw.vint(6, g * rowsPer) // numberOfRows
    val footerPlain = fw.out.toByteArray
    val footerBytes: Array[Byte] =
      if (!zlib) footerPlain
      else {
        // one non-original chunk: 3-byte LE header (len << 1) | 0
        val d = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        d.setInput(footerPlain); d.finish()
        val acc = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](8192)
        while (!d.finished()) acc.write(buf, 0, d.deflate(buf))
        d.end()
        val body = acc.toByteArray
        val h = body.length << 1
        Array[Byte]((h & 0xff).toByte, ((h >>> 8) & 0xff).toByte,
          ((h >>> 16) & 0xff).toByte) ++ body
      }
    // PostScript (plain)
    val psw = new PW
    psw.vint(1, footerBytes.length.toLong) // footerLength
    psw.vint(2, if (zlib) 1L else 0L) // compression
    psw.vint(3, 262144L) // compressionBlockSize
    psw.vint(6, id % 9) // writerVersion
    psw.vint(7777, id % 5) // unknown field: must be skipped
    psw.bytes(8000, "ORC".getBytes("US-ASCII")) // magic
    val ps = psw.out.toByteArray
    require(ps.length < 256)
    val out = new java.io.ByteArrayOutputStream()
    out.write("ORC".getBytes("US-ASCII"))
    val fill = (id % 13 + 2).toInt
    (0 until fill).foreach(j => out.write(((id + j) % 256).toInt))
    out.write(footerBytes)
    out.write(ps)
    out.write(ps.length)
    out.toByteArray
  }

  def synthOrcCol(c: Column): Column =
    udf { id: Long => synthOrc(id) }.apply(c)
  def orcMetaCol(c: Column): Column =
    udf { b: Array[Byte] => parseOrc(b) }.apply(c)
}

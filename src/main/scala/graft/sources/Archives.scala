package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Archive ingestion — ZIP and tar(.gz), the containers code corpora
  * actually arrive in (repository exports, release tarballs, dataset
  * dumps). Same dependency-free discipline as [[Warc]]: JDK
  * `Inflater`/`CRC32` plus hand-parsed framing, strict on
  * malformation (a corrupt container must reject, never mint junk
  * members).
  *
  * ZIP (APPNOTE 6.3): the read starts from the END — scan back for
  * the end-of-central-directory record, walk the central directory
  * (the authoritative member list; local headers are only trusted for
  * their own name/extra lengths when seeking to data), inflate method
  * 8 with a raw `Inflater(true)`, take method 0 stored bytes, and
  * verify each member's CRC-32 against the central record. This is
  * the split-friendly read order a 100 TB ingest wants: the central
  * directory gives (offset, csize) for every member up front, so
  * member extraction parallelizes exactly like [[Warc]]'s member
  * offsets.
  *
  * TAR (POSIX ustar): 512-byte header blocks — octal size field,
  * checksum verified with the chksum bytes blanked, prefix+name
  * joining, regular-file/'\0' and directory typeflags, data padded to
  * block boundary, two zero blocks at end (tolerated absent at EOF).
  * `.tar.gz` wraps the walk in a gzip inflate.
  */
object Archives {

  /** One ZIP member: `method` ∈ {stored, deflate}; `text` is the
    * UTF-8 payload decode; `crc_ok` is the verified CRC-32. */
  final case class ZipEntry(name: String, method: String, usize: Long,
                            crc_ok: Boolean, text: String)

  final case class TarEntry(name: String, size: Long, type_flag: String,
                            text: String)

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (u16(b, i).toLong) | (u16(b, i + 2).toLong << 16)

  /** Central-directory ZIP parse; None on any structural
    * malformation or unsupported feature (encryption, zip64,
    * methods other than stored/deflate). */
  def parseZip(b: Array[Byte]): Option[Seq[ZipEntry]] = {
    if (b == null || b.length < 22) return None
    // EOCD: signature PK\5\6, comment may pad up to 64 KiB
    var eocd = -1
    var i = b.length - 22
    val lo = math.max(0, b.length - 22 - 0xffff)
    while (i >= lo && eocd < 0) {
      if (b(i) == 'P' && b(i + 1) == 'K' && b(i + 2) == 5 && b(i + 3) == 6)
        eocd = i
      i -= 1
    }
    if (eocd < 0) return None
    val nEntries = u16(b, eocd + 10)
    if (nEntries != u16(b, eocd + 8)) return None // multi-disk
    val cdSize = u32(b, eocd + 12)
    val cdOff = u32(b, eocd + 16)
    if (cdOff + cdSize > eocd) return None
    val out = Vector.newBuilder[ZipEntry]
    var p = cdOff // Long cursor (unsigned-32 fields)
    var k = 0
    while (k < nEntries) {
      if (p + 46 > b.length) return None
      if (!(b(p.toInt) == 'P' && b(p.toInt + 1) == 'K' &&
        b(p.toInt + 2) == 1 && b(p.toInt + 3) == 2)) return None
      val pi = p.toInt
      val flags = u16(b, pi + 8)
      if ((flags & 0x1) != 0) return None // encrypted
      val method = u16(b, pi + 10)
      val crc = u32(b, pi + 16)
      val csize = u32(b, pi + 20)
      val usize = u32(b, pi + 24)
      val nameLen = u16(b, pi + 28)
      val extraLen = u16(b, pi + 30)
      val commentLen = u16(b, pi + 32)
      val lho = u32(b, pi + 42)
      if (p + 46 + nameLen > b.length) return None
      val name = new String(b, pi + 46, nameLen,
        java.nio.charset.StandardCharsets.UTF_8)
      // local header: trust only ITS name/extra lengths for the seek
      if (lho + 30 > b.length) return None
      val li = lho.toInt
      if (!(b(li) == 'P' && b(li + 1) == 'K' && b(li + 2) == 3 &&
        b(li + 3) == 4)) return None
      val dataAt = lho + 30 + u16(b, li + 26) + u16(b, li + 28)
      if (dataAt + csize > b.length) return None
      val raw = java.util.Arrays.copyOfRange(b, dataAt.toInt,
        (dataAt + csize).toInt)
      val data = method match {
        case 0 => if (csize != usize) return None else raw
        case 8 => inflateRaw(raw, usize).getOrElse(return None)
        case _ => return None
      }
      val c = new java.util.zip.CRC32()
      c.update(data)
      out += ZipEntry(name, if (method == 0) "stored" else "deflate",
        usize, c.getValue == crc,
        new String(data, java.nio.charset.StandardCharsets.UTF_8))
      p += 46L + nameLen + extraLen + commentLen
      k += 1
    }
    Some(out.result())
  }

  private def inflateRaw(data: Array[Byte],
      expected: Long): Option[Array[Byte]] = {
    if (expected > (256L << 20)) return None // bomb guard
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(data)
      val out = new Array[Byte](expected.toInt)
      var off = 0
      while (off < out.length && !inf.finished()) {
        val k = inf.inflate(out, off, out.length - off)
        if (k == 0 && inf.needsInput()) return None // truncated
        off += k
      }
      if (off == out.length) Some(out) else None
    } catch {
      case _: java.util.zip.DataFormatException => None
    } finally inf.end()
  }

  /** ustar walk; None on a bad checksum/octal field/truncation.
    * Directories surface with empty text; only regular files carry
    * payload. */
  def parseTar(b: Array[Byte]): Option[Seq[TarEntry]] = {
    if (b == null || b.length % 512 != 0) return None
    val out = Vector.newBuilder[TarEntry]
    var p = 0L
    while (p + 512 <= b.length) {
      val pi = p.toInt
      if ((0 until 512).forall(j => b(pi + j) == 0)) {
        // zero block: end-of-archive marker(s)
        return Some(out.result())
      }
      // checksum: header bytes with chksum[148,156) as spaces
      val stored = octal(b, pi + 148, 8).getOrElse(return None)
      var sum = 0L
      var j = 0
      while (j < 512) {
        sum += (if (j >= 148 && j < 156) 0x20 else b(pi + j) & 0xff)
        j += 1
      }
      if (sum != stored) return None
      if (!(b(pi + 257) == 'u' && b(pi + 258) == 's' &&
        b(pi + 259) == 't' && b(pi + 260) == 'a' && b(pi + 261) == 'r'))
        return None
      val rawName = cstr(b, pi, 100)
      val prefix = cstr(b, pi + 345, 155)
      val name = if (prefix.isEmpty) rawName else prefix + "/" + rawName
      val size = octal(b, pi + 124, 12).getOrElse(return None)
      val tf = b(pi + 156).toChar
      val typeFlag = if (tf == '0' || tf == 0.toChar) "file"
        else if (tf == '5') "dir" else return None
      if (typeFlag == "dir" && size != 0) return None
      val dataBlocks = (size + 511) / 512
      if (p + 512 + dataBlocks * 512 > b.length) return None
      val text = if (typeFlag == "file")
        new String(b, pi + 512, size.toInt,
          java.nio.charset.StandardCharsets.UTF_8)
      else ""
      out += TarEntry(name, size, typeFlag, text)
      p += 512 + dataBlocks * 512
    }
    Some(out.result()) // EOF without zero blocks: tolerated
  }

  /** `.tar.gz`: gzip inflate (JDK, multi-member tolerant) then the
    * ustar walk. */
  def parseTarGz(b: Array[Byte]): Option[Seq[TarEntry]] = {
    if (b == null || b.length < 2) return None
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(b))
      val out = new java.io.ByteArrayOutputStream(b.length * 4 + 1024)
      val buf = new Array[Byte](8192)
      var k = in.read(buf)
      while (k >= 0) {
        out.write(buf, 0, k)
        if (out.size() > (256 << 20)) return None
        k = in.read(buf)
      }
      parseTar(out.toByteArray)
    } catch { case _: java.io.IOException => None }
  }

  private def cstr(b: Array[Byte], at: Int, max: Int): String = {
    var n = 0
    while (n < max && b(at + n) != 0) n += 1
    new String(b, at, n, java.nio.charset.StandardCharsets.US_ASCII)
  }

  private def octal(b: Array[Byte], at: Int, len: Int): Option[Long] = {
    var v = 0L
    var seen = false
    var i = 0
    while (i < len) {
      val c = (b(at + i) & 0xff).toChar
      if (c >= '0' && c <= '7') { v = v * 8 + (c - '0'); seen = true }
      else if (c == ' ' || c == 0.toChar) () // padding
      else return None
      i += 1
    }
    if (seen) Some(v) else None
  }

  // -- builders (deterministic fixtures + the write half) ----------- //

  /** Real ZIP bytes for (name, text, deflate?) members — correct
    * local headers, central directory, EOCD, CRC-32s. */
  def buildZip(members: Seq[(String, String, Boolean)]): Array[Byte] = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >>> 8) & 0xff) }
    def le32(v: Long): Unit = { le16((v & 0xffff).toInt); le16(((v >>> 16) & 0xffff).toInt) }
    val central = new java.io.ByteArrayOutputStream()
    def cle16(v: Int): Unit = { central.write(v & 0xff); central.write((v >>> 8) & 0xff) }
    def cle32(v: Long): Unit = { cle16((v & 0xffff).toInt); cle16(((v >>> 16) & 0xffff).toInt) }
    members.foreach { case (name, text, deflated) =>
      val data = text.getBytes(utf8)
      val crc = new java.util.zip.CRC32(); crc.update(data)
      val comp = if (deflated) {
        val d = new java.util.zip.Deflater(
          java.util.zip.Deflater.DEFAULT_COMPRESSION, true)
        d.setInput(data); d.finish()
        val o = new java.io.ByteArrayOutputStream(data.length + 32)
        val buf = new Array[Byte](8192)
        while (!d.finished()) o.write(buf, 0, d.deflate(buf))
        d.end(); o.toByteArray
      } else data
      val nameB = name.getBytes(utf8)
      val method = if (deflated) 8 else 0
      val lho = out.size().toLong
      out.write(Array[Byte]('P', 'K', 3, 4))
      le16(20); le16(0); le16(method); le16(0); le16(0x2821) // fixed DOS stamp
      le32(crc.getValue); le32(comp.length.toLong); le32(data.length.toLong)
      le16(nameB.length); le16(0)
      out.write(nameB); out.write(comp)
      central.write(Array[Byte]('P', 'K', 1, 2))
      cle16(20); cle16(20); cle16(0); cle16(method); cle16(0); cle16(0x2821)
      cle32(crc.getValue); cle32(comp.length.toLong); cle32(data.length.toLong)
      cle16(nameB.length); cle16(0); cle16(0); cle16(0); cle16(0)
      cle32(0L); cle32(lho)
      central.write(nameB)
    }
    val cdOff = out.size().toLong
    out.write(central.toByteArray)
    val cdSize = out.size() - cdOff
    out.write(Array[Byte]('P', 'K', 5, 6))
    le16(0); le16(0); le16(members.length); le16(members.length)
    le32(cdSize); le32(cdOff); le16(0)
    out.toByteArray
  }

  /** Real ustar bytes for (name, text-or-None-for-dir) members,
    * correct checksums, two terminating zero blocks. */
  def buildTar(members: Seq[(String, Option[String])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    members.foreach { case (name, textOpt) =>
      val data = textOpt.map(_.getBytes(
        java.nio.charset.StandardCharsets.UTF_8)).getOrElse(Array.empty[Byte])
      val h = new Array[Byte](512)
      def put(at: Int, s: String): Unit =
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
          .copyToArray(h, at)
      put(0, name.take(100))
      put(100, "0000644\u0000"); put(108, "0000000\u0000"); put(116, "0000000\u0000")
      put(124, f"${data.length}%011o\u0000")
      put(136, "00000000000\u0000")
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      h(156) = (if (textOpt.isEmpty) '5' else '0').toByte
      put(257, "ustar\u000000")
      var sum = 0L
      h.foreach(x => sum += (x & 0xff))
      put(148, f"$sum%06o\u0000 ")
      out.write(h)
      if (data.nonEmpty) {
        out.write(data)
        val pad = (512 - data.length % 512) % 512
        out.write(new Array[Byte](pad))
      }
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }

  def gzip(b: Array[Byte]): Array[Byte] = {
    val o = new java.io.ByteArrayOutputStream(b.length / 2 + 64)
    val g = new java.util.zip.GZIPOutputStream(o)
    g.write(b); g.close()
    o.toByteArray
  }

  // -- fixtures + Column lifts --------------------------------------- //

  /** Deterministic per-id ZIP: a 3-file mini source tree (stored
    * python, deflated markdown, deflated generated go). */
  def synthZip(id: Long): Array[Byte] = {
    val d = (id % 10).toString
    buildZip(Seq(
      ("src/main.py", s"# module $d\nx = $d\n", false),
      ("README.md", s"# Readme $d\n\nHello $d\n", true),
      ("gen/auto.go",
        s"// Code generated by tool. DO NOT EDIT.\npackage p\nvar x = $d\n",
        true)))
  }

  /** Deterministic per-id tar.gz: dir + two files. */
  def synthTarGz(id: Long): Array[Byte] = {
    val d = (id % 10).toString
    gzip(buildTar(Seq(
      ("src", None),
      ("src/lib.rs", Some(s"// SPDX-License-Identifier: MIT\nfn f$d() {}\n")),
      ("notes.txt", Some(s"note $d\n")))))
  }

  def synthZipCol(c: Column): Column =
    udf { id: Long => synthZip(id) }.apply(c)
  def synthTarGzCol(c: Column): Column =
    udf { id: Long => synthTarGz(id) }.apply(c)
  /** bytes → array<struct<name, method, usize, crc_ok, text>>. */
  def zipEntriesCol(c: Column): Column =
    udf { b: Array[Byte] =>
      parseZip(b).map(_.map(e =>
        (e.name, e.method, e.usize, e.crc_ok, e.text)))
    }.apply(c)
  /** bytes → array<struct<name, size, type_flag, text>>. */
  def tarGzEntriesCol(c: Column): Column =
    udf { b: Array[Byte] =>
      parseTarGz(b).map(_.map(e => (e.name, e.size, e.type_flag, e.text)))
    }.apply(c)
}

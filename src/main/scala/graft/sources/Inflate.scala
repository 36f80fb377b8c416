package graft.sources

/** The one bounds-guarded JDK inflate used by every format reader
  * (WOFF table data, git loose objects, Avro deflate blocks, PDF
  * /FlateDecode, ZIP members) — a single implementation so the stall
  * handling and bomb guard can never diverge between copies. r16
  * folded the two remaining older copies in (Pdf via [[apply]] with
  * its 64 MiB cap, Archives via [[exact]] which keeps its
  * declared-size contract).
  */
private[graft] object Inflate {

  /** Inflate `data`. `raw` = headerless deflate (ZIP members, Avro's
    * deflate codec); `cap` bounds the OUTPUT size — a stream that
    * exceeds it, stalls, or ends unfinished returns None, never junk
    * or an OOM. */
  def apply(data: Array[Byte], raw: Boolean, cap: Int)
    : Option[Array[Byte]] = {
    val inf = new java.util.zip.Inflater(raw)
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(
      math.min(cap, data.length * 2 + 64))
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsInput()) {
        val k = inf.inflate(buf)
        if (k == 0 && !inf.finished()) return None // stalled stream
        out.write(buf, 0, k)
        if (out.size > cap) return None // decompression bomb
      }
      if (!inf.finished()) return None // truncated input
      Some(out.toByteArray)
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end()
  }

  /** Inflate RAW deflate into an exact `expected`-byte buffer (ZIP
    * members, where the central directory declares the size).
    * Keeps the original Archives contract: output of exactly
    * `expected` bytes is accepted even with unconsumed trailing
    * compressed bytes (the member CRC gates content); shorter
    * output, stalls and bombs (expected > 256 MiB) return None. */
  def exact(data: Array[Byte], expected: Long): Option[Array[Byte]] = {
    if (expected < 0 || expected > (256L << 20)) return None
    val inf = new java.util.zip.Inflater(true)
    try {
      inf.setInput(data)
      val out = new Array[Byte](expected.toInt)
      var off = 0
      while (off < out.length && !inf.finished()) {
        val k = inf.inflate(out, off, out.length - off)
        if (k == 0 && !inf.finished()) return None // stalled/truncated
        off += k
      }
      if (off == out.length) Some(out) else None
    } catch { case _: java.util.zip.DataFormatException => None }
    finally inf.end()
  }
}

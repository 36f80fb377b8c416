package graft.sources

/** The one bounds-guarded JDK inflate used by every round-15 format
  * reader (WOFF table data, git loose objects, Avro deflate blocks) —
  * a single implementation so the stall handling and bomb guard can
  * never diverge between copies. (Archives and Pdf keep their own
  * older inflaters: both are oracle-gated with their own guard
  * constants and predate this helper.)
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
}

package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media rides through the engine as an opaque `binary` column plus a
  * typed metadata struct — the standard lakehouse layout: content stays
  * a byte blob readable without decoding; metadata (media type, dims,
  * duration) is columnar and prunable/filterable. All byte-level
  * operators here (length, hash, histogram, stride sampling) are real
  * and deterministic, and so is image-container METADATA decode
  * ([[parseImageMeta]]: PNG/JPEG/GIF dimensions + bit depth from pure
  * header-byte arithmetic). PIXEL decode is REAL for PNG
  * ([[pngDecode]]: chunk walk + CRC verify + JDK zlib inflate + full
  * scanline defiltering — no codec library needed); JPEG/PCM/video
  * payloads stay behind the clearly marked STUB ([[stubDecode]])
  * because their entropy coders need codec libraries this environment
  * doesn't ship — for those, the Spark-side plumbing (schema,
  * batching, partition-level processing, UDF signature) is the
  * deliverable and is fully tested.
  *
  * Scale notes: byte ops are per-row map work with no shuffle. The batch
  * processor mirrors the `mapInPandas` pattern — partition iterators
  * chunked into fixed-size batches so a decoder can amortize model/
  * codec init per batch rather than per record (the same batch shape a
  * Python Arrow UDF would see).
  */
object Binary {

  /** Typed metadata struct for a media column. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("duration_ms", LongType)))

  /** Attach a metadata struct column (values may be null/unknown). */
  def withMeta(df: DataFrame, binCol: String, mediaType: Column,
               width: Column = lit(null).cast(IntegerType),
               height: Column = lit(null).cast(IntegerType),
               durationMs: Column = lit(null).cast(LongType)): DataFrame =
    df.withColumn("media_meta", struct(
      mediaType.as("media_type"), width.as("width"),
      height.as("height"), durationMs.as("duration_ms")))

  val P = 1000000007L

  /** Rolling content hash over raw bytes (seed differs from the text
    * hash so text and its encoding don't trivially collide).
    */
  def byteHash(bytes: Array[Byte], seed: Long = 13L): Long = {
    var acc = seed
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xff)) % P
      i += 1
    }
    acc
  }

  /** 16-bin byte-value histogram (bin = byte >> 4). */
  def byteHistogram(bytes: Array[Byte]): Array[Long] = {
    val h = new Array[Long](16)
    var i = 0
    while (i < bytes.length) {
      h((bytes(i) & 0xff) >> 4) += 1
      i += 1
    }
    h
  }

  /** Every-k-th-byte sample — the frame-subsampling analog. */
  def strideSample(bytes: Array[Byte], k: Int): Array[Byte] =
    Iterator.range(0, bytes.length, k).map(bytes).toArray

  /** Column-level wrappers (JVM UDFs over the binary payload — the
    * honest boundary for byte-level work, same role `mapInPandas` plays
    * in a Python pipeline; everything around them stays codegen'd).
    */
  def byteHashCol(c: Column): Column =
    udf { b: Array[Byte] => byteHash(b) }.apply(c)
  def byteHistogramCol(c: Column): Column =
    udf { b: Array[Byte] => byteHistogram(b) }.apply(c)
  def strideSampleCol(c: Column, k: Int): Column =
    udf { b: Array[Byte] => strideSample(b, k) }.apply(c)

  /** Parsed image-container metadata (header fields only — no pixel
    * decode, no codec library). */
  final case class ImageMeta(format: String, width: Int, height: Int,
                             bit_depth: Int)

  /** REAL image metadata decode from HEADER BYTES — pure byte
    * arithmetic, no codec dependency: PNG (signature + IHDR
    * width/height/bit-depth), JPEG (marker walk to the first SOFn
    * frame header: precision/height/width, skipping APP/COM/quant
    * segments), GIF (87a/89a logical screen descriptor,
    * little-endian dims + color-resolution bits). Returns None for
    * unrecognized/truncated bytes. Pixel-data decode stays behind
    * [[stubDecode]]; dimension/bit-depth extraction — the metadata a
    * 100 TB multimodal pipeline filters and partitions on — needs
    * only these first bytes, so it runs as cheap per-row map work.
    */
  def parseImageMeta(b: Array[Byte]): Option[ImageMeta] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (b.length >= 25 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && u8(4) == 0x0d && u8(5) == 0x0a && u8(6) == 0x1a &&
        u8(7) == 0x0a && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' &&
        b(15) == 'R')
      Some(ImageMeta("png", be32(16), be32(20), u8(24)))
    else if (b.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 3 < b.length) {
        if (u8(i) != 0xff) return None // desynced marker stream
        val m = u8(i + 1)
        if (m == 0xd8 || (m >= 0xd0 && m <= 0xd7) || m == 0x01) i += 2
        else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc)
          // SOFn: len(2) precision(1) height(2) width(2)
          return if (i + 8 < b.length)
            Some(ImageMeta("jpeg", be16(i + 7), be16(i + 5), u8(i + 4)))
          else None
        else i += 2 + be16(i + 2) // skip APPn/COM/DQT/DHT/... segment
      }
      None
    } else if (b.length >= 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
               b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(ImageMeta("gif", le16(6), le16(8), ((u8(10) >> 4) & 7) + 1))
    else None
  }

  /** Minimal VALID image headers (signature + dimension fields, no
    * pixel data) — deterministic fixtures for codec-less environments:
    * [[parseImageMeta]] round-trips them, exercising each parser path
    * against a known-answer oracle.
    */
  def pngHeader(width: Int, height: Int, bitDepth: Int): Array[Byte] = {
    def be32(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be32(13) ++ "IHDR".getBytes("US-ASCII") ++ be32(width) ++ be32(height) ++
      Array[Byte](bitDepth.toByte, 2, 0, 0, 0) ++ be32(0) // truecolor, stub CRC
  }

  def jpegHeader(width: Int, height: Int): Array[Byte] = {
    def be16(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    val app0 = Array[Byte](0xff.toByte, 0xe0.toByte) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val sof0 = Array[Byte](0xff.toByte, 0xc0.toByte) ++ be16(17) ++
      Array[Byte](8) ++ be16(height) ++ be16(width) ++
      Array[Byte](3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    Array[Byte](0xff.toByte, 0xd8.toByte) ++ app0 ++ sof0
  }

  def gifHeader(width: Int, height: Int, colorBits: Int): Array[Byte] = {
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    "GIF89a".getBytes("US-ASCII") ++ le16(width) ++ le16(height) ++
      Array[Byte]((((colorBits - 1) & 7) << 4).toByte, 0, 0)
  }

  /** Deterministic per-id synthetic header (format cycles png/jpeg/gif)
    * — the query-able fixture column for [[parseImageMeta]]. */
  def synthHeader(id: Long): Array[Byte] = (id % 3) match {
    case 0 => pngHeader((id % 1920 + 1).toInt, (id % 1080 + 1).toInt,
      if (id % 2 == 0) 8 else 16)
    case 1 => jpegHeader((id % 1920 + 1).toInt, (id % 1080 + 1).toInt)
    case _ => gifHeader((id % 1920 + 1).toInt, (id % 1080 + 1).toInt,
      ((id % 8) + 1).toInt)
  }

  def synthHeaderCol(c: Column): Column =
    udf { id: Long => synthHeader(id) }.apply(c)
  def imageMetaCol(c: Column): Column =
    udf { b: Array[Byte] => parseImageMeta(b) }.apply(c)

  /** Parsed audio-container metadata (header fields only — no PCM
    * decode, no codec library). `duration_ms` is derived from the
    * parsed frame count and sample rate (floor division).
    */
  final case class AudioMeta(format: String, sample_rate: Int, channels: Int,
                             bits_per_sample: Int, n_frames: Long,
                             duration_ms: Long)

  /** REAL audio metadata decode from HEADER BYTES — pure byte
    * arithmetic, no codec dependency: WAV (RIFF/WAVE chunk walk to
    * `fmt ` for rate/channels/bits and `data` for the frame count —
    * skips any interleaved LIST/fact chunks) and FLAC ("fLaC" +
    * STREAMINFO bit-packed sample rate / channels / bit depth / total
    * samples). Returns None for unrecognized/truncated bytes. PCM
    * decode stays behind [[stubDecode]]; rate/channel/duration — the
    * metadata a 100 TB multimodal pipeline filters and partitions
    * on — needs only these first bytes, so it runs as cheap per-row
    * map work.
    */
  def parseAudioMeta(b: Array[Byte]): Option[AudioMeta] = {
    def u8(i: Int): Int = b(i) & 0xff
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def le32(i: Int): Long =
      u8(i).toLong | (u8(i + 1).toLong << 8) | (u8(i + 2).toLong << 16) |
        (u8(i + 3).toLong << 24)
    def tag(i: Int, s: String): Boolean =
      i + s.length <= b.length && s.indices.forall(k => b(i + k) == s(k).toByte)
    if (tag(0, "RIFF") && tag(8, "WAVE")) {
      // chunk walk: [id(4) size(4,LE) payload(size, word-aligned)].
      // The cursor is a Long and the unsigned 32-bit chunk size is
      // never truncated to Int: a malformed (or >= 2 GiB) size walks
      // the cursor past the buffer and falls out of the loop as None,
      // instead of a zero/negative Int step looping forever or
      // indexing out of bounds. Step >= 8 always, so the walk
      // terminates.
      var i = 12L
      var rate = 0; var ch = 0; var bits = 0; var dataBytes = -1L
      var blockAlign = 0
      while (i + 8 <= b.length && (rate == 0 || dataBytes < 0)) {
        val p = i.toInt // safe: i + 8 <= b.length <= Int.MaxValue
        val size = le32(p + 4)
        if (tag(p, "fmt ") && i + 24 <= b.length) {
          ch = le16(p + 10); rate = le32(p + 12).toInt
          blockAlign = le16(p + 20); bits = le16(p + 22)
        } else if (tag(p, "data")) dataBytes = size
        i += 8L + size + (size & 1L) // chunks are word-aligned
      }
      if (rate <= 0 || ch <= 0 || blockAlign <= 0 || dataBytes < 0) None
      else {
        val frames = dataBytes / blockAlign
        Some(AudioMeta("wav", rate, ch, bits, frames, frames * 1000L / rate))
      }
    } else if (tag(0, "fLaC") && b.length >= 26 && (u8(4) & 0x7f) == 0) {
      // STREAMINFO (block type 0, 34 bytes at offset 8); the packed
      // field at offset 18: rate(20) channels-1(3) bits-1(5) samples(36)
      val rate = (u8(18) << 12) | (u8(19) << 4) | (u8(20) >> 4)
      val ch = ((u8(20) >> 1) & 7) + 1
      val bits = (((u8(20) & 1) << 4) | (u8(21) >> 4)) + 1
      val frames = ((u8(21) & 0x0f).toLong << 32) | (u8(22).toLong << 24) |
        (u8(23).toLong << 16) | (u8(24).toLong << 8) | u8(25).toLong
      if (rate <= 0) None
      else Some(AudioMeta("flac", rate, ch, bits, frames, frames * 1000L / rate))
    } else None
  }

  /** Minimal VALID audio headers (container + format fields, no PCM
    * payload) — deterministic fixtures for codec-less environments:
    * [[parseAudioMeta]] round-trips them, exercising both parser paths
    * against a known-answer oracle.
    */
  def wavHeader(sampleRate: Int, channels: Int, bitsPerSample: Int,
                nFrames: Long): Array[Byte] = {
    def le16(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def le32(v: Long) = Array[Byte](v.toByte, (v >>> 8).toByte,
      (v >>> 16).toByte, (v >>> 24).toByte)
    val blockAlign = channels * bitsPerSample / 8
    val dataBytes = nFrames * blockAlign
    "RIFF".getBytes("US-ASCII") ++ le32(36 + dataBytes) ++
      "WAVE".getBytes("US-ASCII") ++
      "fmt ".getBytes("US-ASCII") ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(sampleRate.toLong * blockAlign) ++
      le16(blockAlign) ++ le16(bitsPerSample) ++
      "data".getBytes("US-ASCII") ++ le32(dataBytes) // header only, no PCM
  }

  def flacHeader(sampleRate: Int, channels: Int, bitsPerSample: Int,
                 nFrames: Long): Array[Byte] = {
    val packed = new Array[Byte](8)
    packed(0) = (sampleRate >>> 12).toByte
    packed(1) = (sampleRate >>> 4).toByte
    packed(2) = (((sampleRate & 0xf) << 4) | (((channels - 1) & 7) << 1) |
      (((bitsPerSample - 1) >> 4) & 1)).toByte
    packed(3) = ((((bitsPerSample - 1) & 0xf) << 4) |
      ((nFrames >>> 32) & 0xf)).toByte
    packed(4) = (nFrames >>> 24).toByte
    packed(5) = (nFrames >>> 16).toByte
    packed(6) = (nFrames >>> 8).toByte
    packed(7) = nFrames.toByte
    "fLaC".getBytes("US-ASCII") ++
      Array[Byte](0x80.toByte, 0, 0, 34) ++ // last-block flag + STREAMINFO(34)
      Array[Byte](0x10, 0, 0x10, 0) ++ // min/max block size 4096
      Array[Byte](0, 0, 0, 0, 0, 0) ++ // min/max frame size (unknown)
      packed ++ new Array[Byte](16) // MD5 (unset)
  }

  /** Deterministic per-id synthetic audio header (format alternates
    * wav/flac; every field a closed form of the id so a SQL oracle can
    * recompute it) — the query-able fixture column for
    * [[parseAudioMeta]]. Rates are all divisible by 100, so
    * `n_frames = (id%10+1)·rate/100` gives an exact
    * `duration_ms = (id%10+1)·10`.
    */
  val synthRates: Seq[Int] = Seq(8000, 16000, 24000, 44100, 48000)

  def synthAudioHeader(id: Long): Array[Byte] = {
    val rate = synthRates((id % 5).toInt)
    val ch = (id % 3 + 1).toInt
    val bits = if (id % 4 < 2) 16 else 24
    val frames = (id % 10 + 1) * rate / 100
    if (id % 2 == 0) wavHeader(rate, ch, bits, frames)
    else flacHeader(rate, ch, bits, frames)
  }

  def synthAudioHeaderCol(c: Column): Column =
    udf { id: Long => synthAudioHeader(id) }.apply(c)
  def audioMetaCol(c: Column): Column =
    udf { b: Array[Byte] => parseAudioMeta(b) }.apply(c)

  /** Parsed video-container metadata (ISO-BMFF/MP4 box headers only —
    * no codec, no frame decode). `duration_ms` = floor(duration · 1000
    * / timescale) from the movie header.
    */
  final case class VideoMeta(format: String, major_brand: String,
                             timescale: Long, duration_ms: Long,
                             n_tracks: Int)

  /** REAL MP4 metadata decode — a top-level ISO-BMFF box walk (32-bit
    * big-endian sizes; `size == 1` promotes to the 64-bit largesize,
    * `size == 0` means to-end-of-buffer) to `ftyp` (major brand) and
    * `moov`, then a child walk inside `moov` for `mvhd` (version 0:
    * 32-bit timescale/duration; version 1: 64-bit) and the `trak`
    * count. Cursors stay Long throughout — an unsigned 32-bit size
    * field truncated to Int becomes a zero/negative step, i.e. an
    * executor-side infinite loop on crafted input (the byte-walk rule
    * from the audio parser). Returns None for unrecognized/truncated/
    * malformed bytes.
    */
  def parseVideoMeta(b: Array[Byte]): Option[VideoMeta] = {
    def u8(i: Long): Long = b(i.toInt) & 0xffL
    def be32(i: Long): Long =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def be64(i: Long): Long =
      (be32(i) << 32) | be32(i + 4)
    def fourcc(i: Long): String =
      new String(b.slice(i.toInt, i.toInt + 4), "US-ASCII")
    val n = b.length.toLong
    // (boxType, boxBodyStart, boxEnd) walk over [from, hi)
    def boxes(from: Long, hi: Long): Iterator[(String, Long, Long)] =
      new Iterator[(String, Long, Long)] {
        private var cur = from
        def hasNext: Boolean = cur >= 0 && cur + 8 <= hi
        def next(): (String, Long, Long) = {
          val size32 = be32(cur)
          val typ = fourcc(cur + 4)
          val (body, end) =
            if (size32 == 1L && cur + 16 <= hi) (cur + 16, cur + be64(cur + 8))
            else if (size32 == 0L) (cur + 8, hi)
            else (cur + 8, cur + size32)
          if (end <= cur || end > hi) { cur = -1; (typ, body, -1L) }
          else { cur = end; (typ, body, end) }
        }
      }
    if (n < 16) return None
    var brand: String = null
    var timescale = -1L
    var duration = -1L
    var tracks = 0
    boxes(0L, n).foreach {
      case (_, _, -1L) => return None // malformed size
      case ("ftyp", body, end) =>
        if (body + 4 <= end) brand = fourcc(body) else return None
      case ("moov", body, end) =>
        boxes(body, end).foreach {
          case (_, _, -1L) => return None
          case ("mvhd", mb, me) =>
            val version = u8(mb)
            if (version == 0L && mb + 20 <= me) {
              timescale = be32(mb + 12); duration = be32(mb + 16)
            } else if (version == 1L && mb + 32 <= me) {
              timescale = be32(mb + 20); duration = be64(mb + 24)
            } else return None
          case ("trak", _, _) => tracks += 1
          case _ => ()
        }
      case _ => () // skip free/mdat/unknown top-level boxes
    }
    if (brand == null || timescale <= 0 || duration < 0) None
    else Some(VideoMeta("mp4", brand, timescale,
      duration * 1000L / timescale, tracks))
  }

  /** Minimal VALID MP4 skeleton (ftyp + moov[mvhd + empty traks]) —
    * the deterministic fixture [[parseVideoMeta]] round-trips.
    */
  def mp4Header(timescale: Long, duration: Long, nTracks: Int,
                brand: String = "isom", mvhdV1: Boolean = false): Array[Byte] = {
    def be32(v: Long) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def be64(v: Long) = be32(v >>> 32) ++ be32(v & 0xffffffffL)
    def box(typ: String, body: Array[Byte]): Array[Byte] =
      be32(body.length + 8L) ++ typ.getBytes("US-ASCII") ++ body
    val ftyp = box("ftyp", brand.getBytes("US-ASCII") ++ be32(512L) ++
      "isommp41".getBytes("US-ASCII"))
    val mvhdBody =
      if (!mvhdV1)
        Array[Byte](0, 0, 0, 0) ++ be32(0L) ++ be32(0L) ++
          be32(timescale) ++ be32(duration) ++
          be32(0x00010000L) ++ Array[Byte](0x01, 0, 0, 0) ++
          new Array[Byte](8) ++ new Array[Byte](36) ++
          new Array[Byte](24) ++ be32(nTracks + 1L)
      else
        Array[Byte](1, 0, 0, 0) ++ be64(0L) ++ be64(0L) ++
          be32(timescale) ++ be64(duration) ++
          be32(0x00010000L) ++ Array[Byte](0x01, 0, 0, 0) ++
          new Array[Byte](8) ++ new Array[Byte](36) ++
          new Array[Byte](24) ++ be32(nTracks + 1L)
    val traks = Array.fill(nTracks)(box("trak", Array.empty[Byte]))
      .foldLeft(Array.empty[Byte])(_ ++ _)
    ftyp ++ box("moov", box("mvhd", mvhdBody) ++ traks)
  }

  /** Deterministic per-id synthetic MP4 (timescale cycles standard
    * clock rates, duration/tracks derive from the id, every 4th file
    * uses the 64-bit mvhd v1 layout).
    */
  private val synthTimescales = Array(600L, 1000L, 24000L, 30000L, 90000L)
  def synthVideoHeader(id: Long): Array[Byte] = {
    val ts = synthTimescales((id % 5).toInt)
    val dur = (id % 120 + 1) * ts / 2 // 0.5 s steps
    mp4Header(ts, dur, (id % 3 + 1).toInt,
      brand = if (id % 2 == 0) "isom" else "mp42", mvhdV1 = id % 4 == 3)
  }

  def synthVideoHeaderCol(c: Column): Column =
    udf { id: Long => synthVideoHeader(id) }.apply(c)
  def videoMetaCol(c: Column): Column =
    udf { b: Array[Byte] => parseVideoMeta(b) }.apply(c)

  // ------------------------------------------------------------------ //
  // REAL PNG pixel codec — dependency-free (java.util.zip only).
  // PNG is the one mainstream image format whose full pixel path is
  // decodable with nothing beyond the JDK: zlib (Inflater) + the five
  // scanline filters. This closes the pixel half of the multimodal
  // boundary for PNG; JPEG/PCM/video payloads remain behind
  // [[stubDecode]] (their entropy coders need a codec library).
  // ------------------------------------------------------------------ //

  /** Decoded truecolor image: RGB bytes row-major, 3 bytes/pixel. */
  final case class PngImage(width: Int, height: Int, pixels: Array[Byte])

  private def crc32Of(parts: Array[Byte]*): Int = {
    val c = new java.util.zip.CRC32
    parts.foreach(p => c.update(p))
    c.getValue.toInt
  }

  private def pngBe32(v: Int): Array[Byte] = Array[Byte](
    (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** REAL PNG encoder (8-bit truecolor, no interlace): IHDR + one IDAT
    * holding the zlib-deflated filtered scanlines + IEND, with genuine
    * CRC-32s. Each row's filter type cycles y % 5 (none/sub/up/average/
    * paeth) so a round-trip exercises every defilter path — the encoder
    * exists to make [[pngDecode]] testable against a known-answer
    * oracle, not to win compression.
    */
  def pngEncode(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == width * height * 3,
      s"need ${width * height * 3} RGB bytes, got ${pixels.length}")
    val bpp = 3
    val stride = width * bpp
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val f = y % 5
      raw(y * (1 + stride)) = f.toByte
      var i = 0
      while (i < stride) {
        val cur = pixels(y * stride + i) & 0xff
        val left = if (i >= bpp) pixels(y * stride + i - bpp) & 0xff else 0
        val above = if (y > 0) pixels((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp) pixels((y - 1) * stride + i - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => above
          case 3 => (left + above) / 2
          case 4 => paeth(left, above, ul)
        }
        raw(y * (1 + stride) + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val deflater = new java.util.zip.Deflater()
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](raw.length + 64)
    val out = new java.io.ByteArrayOutputStream()
    while (!deflater.finished())
      out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val idat = out.toByteArray
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val t = typ.getBytes("US-ASCII")
      pngBe32(data.length) ++ t ++ data ++ pngBe32(crc32Of(t, data))
    }
    val ihdr = pngBe32(width) ++ pngBe32(height) ++
      Array[Byte](8, 2, 0, 0, 0) // depth 8, truecolor, deflate, adaptive, no interlace
    Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", idat) ++ chunk("IEND", Array.empty)
  }

  /** REAL PNG pixel decode, dependency-free: chunk walk with CRC-32
    * verification, concatenated-IDAT zlib inflate, and full scanline
    * defiltering (none/sub/up/average/paeth). Supports the 8-bit
    * truecolor non-interlaced profile ([[pngEncode]]'s output and the
    * overwhelmingly common case); anything else (palette, alpha,
    * 16-bit, interlaced, corrupt CRC, short stream) returns None
    * rather than junk pixels. Cursor arithmetic stays in Long per the
    * byte-walk discipline (a crafted 4 GiB length field must not
    * become a negative step).
    */
  def pngDecode(b: Array[Byte]): Option[PngImage] = {
    def u8(i: Int): Int = b(i) & 0xff
    def be32(i: Int): Long =
      ((u8(i).toLong << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)) & 0xffffffffL
    if (b.length < 8 + 25 || u8(0) != 0x89 || b(1) != 'P' || b(2) != 'N' ||
        b(3) != 'G') return None
    var pos = 8L
    var w = -1; var h = -1
    val idat = new java.io.ByteArrayOutputStream()
    var sawEnd = false
    while (!sawEnd && pos + 8 <= b.length) {
      val len = be32(pos.toInt)
      if (len > Int.MaxValue - 12 || pos + 12 + len > b.length) return None
      val typ = new String(b, pos.toInt + 4, 4, "US-ASCII")
      val dataOff = pos.toInt + 8
      val crcStored = be32(dataOff + len.toInt)
      val c = new java.util.zip.CRC32
      c.update(b, pos.toInt + 4, 4 + len.toInt)
      if ((c.getValue & 0xffffffffL) != crcStored) return None
      typ match {
        case "IHDR" =>
          if (len != 13) return None
          w = be32(dataOff).toInt; h = be32(dataOff + 4).toInt
          val (depth, color, comp, filt, inter) = (u8(dataOff + 8),
            u8(dataOff + 9), u8(dataOff + 10), u8(dataOff + 11), u8(dataOff + 12))
          if (depth != 8 || color != 2 || comp != 0 || filt != 0 || inter != 0)
            return None
          if (w <= 0 || h <= 0 || w.toLong * h * 3 > 64L * 1024 * 1024)
            return None
        case "IDAT" => idat.write(b, dataOff, len.toInt)
        case "IEND" => sawEnd = true
        case _ => () // ancillary chunk: skip
      }
      pos += 12 + len
    }
    if (!sawEnd || w < 0) return None
    val bpp = 3
    val stride = w * bpp
    val raw = new Array[Byte](h * (1 + stride))
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < raw.length && !inf.finished()) {
        val n = inf.inflate(raw, got, raw.length - got)
        if (n == 0 && inf.needsInput()) return None // truncated stream
        got += n
      }
    } catch { case _: java.util.zip.DataFormatException => return None }
    finally inf.end()
    if (got != raw.length) return None
    val px = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val f = raw(y * (1 + stride)) & 0xff
      if (f > 4) return None
      var i = 0
      while (i < stride) {
        val v = raw(y * (1 + stride) + 1 + i) & 0xff
        val left = if (i >= bpp) px(y * stride + i - bpp) & 0xff else 0
        val above = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp) px((y - 1) * stride + i - bpp) & 0xff else 0
        val pred = f match {
          case 0 => 0
          case 1 => left
          case 2 => above
          case 3 => (left + above) / 2
          case 4 => paeth(left, above, ul)
        }
        px(y * stride + i) = ((v + pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    Some(PngImage(w, h, px))
  }

  /** Deterministic synthetic truecolor PNG per id: dims (id%13+4) ×
    * (id%11+4), pixel value (x·7 + y·13 + c·101 + id·31) mod 256 — a
    * closed form DuckDB reproduces exactly with integer arithmetic, so
    * decoded-pixel statistics get a full VALUE-checked oracle (the
    * whole deflate→inflate→defilter path must reproduce every byte).
    */
  def synthPng(id: Long): Array[Byte] = {
    val w = (id % 13 + 4).toInt
    val h = (id % 11 + 4).toInt
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < 3) {
          px((y * w + x) * 3 + c) =
            ((x * 7 + y * 13 + c * 101 + id * 31) % 256).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    pngEncode(w, h, px)
  }

  def synthPngCol(c: Column): Column =
    udf { id: Long => synthPng(id) }.apply(c)

  /** Per-channel decoded-pixel statistics: (channel, n, mean, std) rows
    * per image — the feature-extraction step a real multimodal pipeline
    * runs after decode. Population std via exact integer sums (pixel
    * values are 0..255 ints, so the sums are exact longs and the final
    * doubles are reproducible cross-engine after rounding).
    */
  def pngChannelStats(b: Array[Byte]): Option[Seq[(Int, Long, Long, Double, Double)]] =
    pngDecode(b).map { img =>
      val n = img.width.toLong * img.height
      (0 until 3).map { c =>
        var s = 0L; var ss = 0L
        var i = c
        while (i < img.pixels.length) {
          val v = img.pixels(i) & 0xff
          s += v; ss += v.toLong * v
          i += 3
        }
        val mean = s.toDouble / n
        val variance = ss.toDouble / n - mean * mean
        (c, n, s, mean, math.sqrt(math.max(0.0, variance)))
      }
    }

  def pngChannelStatsCol(c: Column): Column =
    udf { b: Array[Byte] => pngChannelStats(b) }.apply(c)

  /** STUB — media decode. A real deployment plugs a codec here (e.g.
    * JAI/ffmpeg bindings) returning pixel/PCM tensors; this container
    * has none, so the stub emits a deterministic 8-dim pseudo-feature
    * derived from the byte stream (stride-sampled rolling hashes scaled
    * to [0,1)). Signature and batching are what a real decoder uses.
    * (PNG is the exception: [[pngDecode]] above is a REAL pixel path.)
    */
  def stubDecode(bytes: Array[Byte]): Array[Float] = {
    val f = new Array[Float](8)
    var i = 0
    while (i < 8) {
      val slice = strideSample(bytes.drop(i), 8)
      f(i) = (byteHash(slice, seed = i + 1L) % 1000000L).toFloat / 1000000.0f
      i += 1
    }
    f
  }

  /** Partition-level batch processor (the `mapInPandas` shape): chunks
    * each partition's rows into `batchSize` groups, runs `decode` per
    * record with per-batch amortized setup, preserves all input columns
    * and appends `features: array<float>`.
    */
  def decodeBatches(df: DataFrame, binCol: String,
                    batchSize: Int = 64,
                    decode: Array[Byte] => Array[Float] = stubDecode): DataFrame = {
    val schema = df.schema.add("features", ArrayType(FloatType))
    val idx = df.schema.fieldIndex(binCol)
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(schema)
    df.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        // per-batch setup would init the codec/model here, once
        batch.iterator.map { r =>
          val bytes = r.getAs[Array[Byte]](idx)
          Row.fromSeq(r.toSeq :+ decode(bytes).toSeq)
        }
      }
    }(enc)
  }
}

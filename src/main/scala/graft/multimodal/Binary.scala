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
  * header-byte arithmetic); only the PIXEL decode step is a clearly
  * marked STUB ([[stubDecode]]) because no image/audio codec library
  * ships in this environment — the Spark-side plumbing (schema,
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

  /** STUB — media decode. A real deployment plugs a codec here (e.g.
    * JAI/ffmpeg bindings) returning pixel/PCM tensors; this container
    * has none, so the stub emits a deterministic 8-dim pseudo-feature
    * derived from the byte stream (stride-sampled rolling hashes scaled
    * to [0,1)). Signature and batching are what a real decoder uses.
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

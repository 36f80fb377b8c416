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
  * and deterministic; the actual media DECODE step is a clearly marked
  * STUB ([[stubDecode]]) because no image/audio codec library ships in
  * this environment — the Spark-side plumbing (schema, batching,
  * partition-level processing, UDF signature) is the deliverable and is
  * fully tested.
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

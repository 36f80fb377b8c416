package graft

import graft.eval.GridSearch
import graft.multimodal.Binary
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("byte ops: hash/histogram/stride on known bytes") {
    val bytes = "abc a".getBytes("UTF-8")
    // rolling: ((((13*31+97)*31+98)*31+99)*31+32)*31+97 mod P
    val expect = Seq(97, 98, 99, 32, 97).map(_.toLong)
      .foldLeft(13L)((acc, b) => (acc * 31 + b) % Binary.P)
    assert(Binary.byteHash(bytes) == expect)
    val h = Binary.byteHistogram(bytes)
    assert(h(6) == 4)      // a,b,c,a => 0x61,0x62,0x63 bin 6
    assert(h(2) == 1)      // space 0x20 bin 2
    assert(h.sum == 5)
    assert(Binary.strideSample(bytes, 2).toSeq == Seq('a', 'c', 'a').map(_.toByte))
  }

  test("stubDecode is deterministic and in range") {
    val b = "some media payload".getBytes("UTF-8")
    val f1 = Binary.stubDecode(b)
    val f2 = Binary.stubDecode(b)
    assert(f1.toSeq == f2.toSeq)
    assert(f1.length == 8)
    f1.foreach(v => assert(v >= 0.0f && v < 1.0f))
  }

  test("decodeBatches preserves columns, appends features, batches evenly") {
    val df = (1 to 100).map(i => (i.toLong, s"payload-$i".getBytes("UTF-8")))
      .toDF("id", "content").repartition(3)
    val out = Binary.decodeBatches(df, "content", batchSize = 16)
    assert(out.columns.toSeq == Seq("id", "content", "features"))
    val rows = out.collect()
    assert(rows.length == 100)
    rows.foreach { r =>
      assert(r.getSeq[Float](r.fieldIndex("features")).length == 8)
    }
    // determinism across runs
    val again = Binary.decodeBatches(df, "content", batchSize = 16)
      .select("id", "features").collect().map(r =>
        r.getLong(0) -> r.getSeq[Float](1)).toMap
    rows.foreach { r =>
      assert(again(r.getLong(0)) == r.getSeq[Float](r.fieldIndex("features")))
    }
  }

  test("media metadata struct is typed and filterable") {
    val df = Seq((1L, "x".getBytes)).toDF("id", "content")
    val m = Binary.withMeta(df, "content", lit("image/png"), lit(64), lit(64))
    val r = m.where(col("media_meta.media_type") === "image/png").head
    assert(r.getAs[org.apache.spark.sql.Row]("media_meta").getAs[Int]("width") == 64)
  }

  test("grid search picks the separating threshold on planted labels") {
    // scores: label 1 iff score > 100; grid quantile p=0.5 sits at the gap
    val df = ((1 to 50).map(i => (0, i.toDouble)) ++
      (1 to 50).map(i => (1, 100.0 + i))).toDF("label", "score")
    val grid = GridSearch.thresholdGrid(df, "label", "score",
      Seq(0.25, 0.5, 0.75)).collect()
    assert(grid.length == 3)
    val at50 = grid.find(_.getAs[Double]("p") == 0.5).get
    assert(at50.getAs[Long]("tp") == 50L && at50.getAs[Long]("fp") == 0L)
    assert(math.abs(at50.getAs[Double]("f1") - 1.0) < 1e-12)
    val best = GridSearch.bestThreshold(df, "label", "score",
      Seq(0.25, 0.5, 0.75)).head
    assert(best.getAs[Double]("p") == 0.5)
  }

  test("parseImageMeta round-trips png/jpeg/gif headers, rejects garbage") {
    assert(Binary.parseImageMeta(Binary.pngHeader(640, 480, 16))
      .contains(Binary.ImageMeta("png", 640, 480, 16)))
    assert(Binary.parseImageMeta(Binary.jpegHeader(1920, 1080))
      .contains(Binary.ImageMeta("jpeg", 1920, 1080, 8)))
    assert(Binary.parseImageMeta(Binary.gifHeader(320, 200, 5))
      .contains(Binary.ImageMeta("gif", 320, 200, 5)))
    assert(Binary.parseImageMeta("not an image".getBytes("UTF-8")).isEmpty)
    assert(Binary.parseImageMeta(Array[Byte](0x89.toByte, 'P')).isEmpty)
    // the jpeg marker walk must skip arbitrary segments before SOF:
    // splice a COM segment between SOI and APP0
    val j = Binary.jpegHeader(10, 20)
    val com = Array[Byte](0xff.toByte, 0xfe.toByte, 0, 4, 'h', 'i')
    assert(Binary.parseImageMeta(j.take(2) ++ com ++ j.drop(2))
      .contains(Binary.ImageMeta("jpeg", 10, 20, 8)))
    // truncated jpeg (SOI + APP0 only, no SOF) parses to None, not a crash
    assert(Binary.parseImageMeta(j.take(20)).isEmpty)
  }

  test("parseAudioMeta round-trips wav/flac headers, rejects garbage") {
    assert(Binary.parseAudioMeta(Binary.wavHeader(44100, 2, 16, 44100L))
      .contains(Binary.AudioMeta("wav", 44100, 2, 16, 44100L, 1000L)))
    assert(Binary.parseAudioMeta(Binary.flacHeader(48000, 1, 24, 24000L))
      .contains(Binary.AudioMeta("flac", 48000, 1, 24, 24000L, 500L)))
    // frame counts above 2^32 exercise the 36-bit FLAC field
    assert(Binary.parseAudioMeta(Binary.flacHeader(8000, 8, 32, 0x5_0000_0000L))
      .contains(Binary.AudioMeta("flac", 8000, 8, 32, 0x5_0000_0000L,
        0x5_0000_0000L * 1000L / 8000L)))
    assert(Binary.parseAudioMeta("not audio at all".getBytes("UTF-8")).isEmpty)
    assert(Binary.parseAudioMeta(Array[Byte]('R', 'I', 'F')).isEmpty)
    // the wav chunk walk must skip a LIST chunk spliced before fmt
    val w = Binary.wavHeader(16000, 1, 16, 1600L)
    val list = "LIST".getBytes("US-ASCII") ++
      Array[Byte](6, 0, 0, 0) ++ "INFOab".getBytes("US-ASCII")
    assert(Binary.parseAudioMeta(w.take(12) ++ list ++ w.drop(12))
      .contains(Binary.AudioMeta("wav", 16000, 1, 16, 1600L, 100L)))
    // truncated wav (RIFF/WAVE but no fmt/data) parses to None, not a crash
    assert(Binary.parseAudioMeta(w.take(14)).isEmpty)
    // malformed chunk size near 2^32 (would be a negative/zero Int step):
    // must walk off the end and return None — not hang or throw
    val evil = "RIFF".getBytes("US-ASCII") ++ Array[Byte](0, 0, 0, 0) ++
      "WAVE".getBytes("US-ASCII") ++ "JUNK".getBytes("US-ASCII") ++
      Array[Byte](0xf8.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte)
    assert(Binary.parseAudioMeta(evil).isEmpty)
    val evil2 = evil.dropRight(4) ++
      Array[Byte](0, 0, 0, 0x80.toByte) // 0x80000000: sign-bit size
    assert(Binary.parseAudioMeta(evil2).isEmpty)
  }

  test("audioMetaCol surfaces parsed header fields as a typed struct column") {
    val df = Seq(0L, 1L, 7L, 300L).toDF("id")
      .withColumn("au", Binary.synthAudioHeaderCol(col("id")))
      .select(col("id"), Binary.audioMetaCol(col("au")).as("m"))
      .select(col("id"), col("m.format"), col("m.sample_rate"),
        col("m.channels"), col("m.bits_per_sample"), col("m.n_frames"),
        col("m.duration_ms"))
      .orderBy("id").collect()
    // id=0: wav, rate 8000, ch 1, 16-bit, frames 1*80, dur 10ms
    assert(df(0).getString(1) == "wav" && df(0).getInt(2) == 8000 &&
      df(0).getInt(3) == 1 && df(0).getInt(4) == 16 &&
      df(0).getLong(5) == 80L && df(0).getLong(6) == 10L)
    // id=1: flac, rate 16000, ch 2, 16-bit, frames 2*160, dur 20ms
    assert(df(1).getString(1) == "flac" && df(1).getInt(2) == 16000 &&
      df(1).getInt(3) == 2 && df(1).getInt(4) == 16 &&
      df(1).getLong(5) == 320L && df(1).getLong(6) == 20L)
    // id=7: flac, rate 24000 (7%5=2), ch 2, 24-bit (7%4=3), frames 8*240
    assert(df(2).getString(1) == "flac" && df(2).getInt(2) == 24000 &&
      df(2).getInt(3) == 2 && df(2).getInt(4) == 24 &&
      df(2).getLong(5) == 1920L && df(2).getLong(6) == 80L)
    // id=300: wav, rate 8000 (300%5=0), ch 1 (300%3=0), 16-bit (300%4=0)
    assert(df(3).getString(1) == "wav" && df(3).getInt(2) == 8000 &&
      df(3).getInt(3) == 1 && df(3).getInt(4) == 16)
  }

  test("imageMetaCol surfaces parsed header fields as a typed struct column") {
    val df = Seq(0L, 1L, 2L, 300L).toDF("id")
      .withColumn("img", Binary.synthHeaderCol(col("id")))
      .select(col("id"), Binary.imageMetaCol(col("img")).as("m"))
      .select(col("id"), col("m.format"), col("m.width"), col("m.height"),
        col("m.bit_depth"))
      .orderBy("id").collect()
    assert(df(0).getString(1) == "png" && df(0).getInt(2) == 1 &&
      df(0).getInt(3) == 1 && df(0).getInt(4) == 8)
    assert(df(1).getString(1) == "jpeg" && df(1).getInt(2) == 2)
    assert(df(2).getString(1) == "gif" && df(2).getInt(4) == 3)
    assert(df(3).getString(1) == "png" && df(3).getInt(2) == 301 &&
      df(3).getInt(4) == 8)
  }

  test("parseVideoMeta round-trips mp4 v0/v1 headers, rejects garbage") {
    import graft.multimodal.Binary
    // mvhd version 0
    val v0 = Binary.parseVideoMeta(Binary.mp4Header(
      timescale = 30000, duration = 90000, nTracks = 2)).get
    assert(v0.format == "mp4" && v0.major_brand == "isom")
    assert(v0.timescale == 30000L && v0.duration_ms == 3000L)
    assert(v0.n_tracks == 2)
    // mvhd version 1 (64-bit fields)
    val v1 = Binary.parseVideoMeta(Binary.mp4Header(
      timescale = 90000, duration = 45000, nTracks = 1,
      brand = "mp42", mvhdV1 = true)).get
    assert(v1.major_brand == "mp42" && v1.timescale == 90000L &&
      v1.duration_ms == 500L && v1.n_tracks == 1)
    // garbage / truncation / malformed sizes never loop or throw
    assert(Binary.parseVideoMeta(Array.empty[Byte]).isEmpty)
    assert(Binary.parseVideoMeta("not a video".getBytes).isEmpty)
    assert(Binary.parseVideoMeta(
      Binary.mp4Header(600, 600, 1).take(20)).isEmpty)
    // crafted box size 0xFFFFFFFF (would be negative as Int) at the top
    val evil = Array[Byte](0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 'f', 't', 'y', 'p') ++ new Array[Byte](16)
    assert(Binary.parseVideoMeta(evil).isEmpty)
    // deterministic per-id fixture covers both layouts
    val a = Binary.parseVideoMeta(Binary.synthVideoHeader(3)).get // v1 path
    assert(a.duration_ms == (3 % 120 + 1) * 500L)
    val b = Binary.parseVideoMeta(Binary.synthVideoHeader(10)).get // v0 path
    assert(b.duration_ms == (10 % 120 + 1) * 500L &&
      b.n_tracks == (10 % 3 + 1))
  }

  test("PNG pixel codec: exact round-trip through all five filters") {
    import graft.multimodal.Binary
    // 7 rows → filter types 0,1,2,3,4,0,1 all execute; odd width makes
    // the left/upper-left neighbors exercise the bpp offset logic
    val w = 5; val h = 7
    val px = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    val png = Binary.pngEncode(w, h, px)
    // it really is a PNG per the metadata parser too
    val meta = Binary.parseImageMeta(png).get
    assert(meta.format == "png" && meta.width == w && meta.height == h)
    val dec = Binary.pngDecode(png).get
    assert(dec.width == w && dec.height == h)
    assert(dec.pixels.toSeq == px.toSeq, "pixel bytes must round-trip exactly")
  }

  test("PNG decoder rejects corrupt/unsupported input, never junk") {
    import graft.multimodal.Binary
    val png = Binary.synthPng(17)
    assert(Binary.pngDecode(png).isDefined)
    // flip one IDAT byte → CRC check fails → None (not wrong pixels)
    val corrupt = png.clone()
    corrupt(png.length - 20) = (corrupt(png.length - 20) ^ 0x55).toByte
    assert(Binary.pngDecode(corrupt).isEmpty)
    // truncation, garbage, empty
    assert(Binary.pngDecode(png.take(30)).isEmpty)
    assert(Binary.pngDecode("not a png at all".getBytes).isEmpty)
    assert(Binary.pngDecode(Array.empty[Byte]).isEmpty)
    // header-only fixture (no IDAT/IEND): metadata parses, pixels don't
    val headerOnly = Binary.pngHeader(8, 8, 8)
    assert(Binary.parseImageMeta(headerOnly).isDefined)
    assert(Binary.pngDecode(headerOnly).isEmpty)
  }

  test("PNG channel stats match the closed-form pixel formula") {
    import graft.multimodal.Binary
    val id = 23L
    val w = (id % 13 + 4).toInt; val h = (id % 11 + 4).toInt
    val stats = Binary.pngChannelStats(Binary.synthPng(id)).get
    (0 until 3).foreach { c =>
      val vals = for { y <- 0 until h; x <- 0 until w }
        yield (x * 7 + y * 13 + c * 101 + id * 31) % 256
      val (ch, n, s, mean, std) = stats(c)
      assert(ch == c && n == w.toLong * h && s == vals.sum)
      assert(math.abs(mean - vals.sum.toDouble / (w * h)) < 1e-12)
      val v = vals.map(v => v.toDouble * v).sum / (w * h) -
        (vals.sum.toDouble / (w * h)) * (vals.sum.toDouble / (w * h))
      assert(math.abs(std - math.sqrt(v)) < 1e-12)
    }
  }
}

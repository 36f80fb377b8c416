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
}

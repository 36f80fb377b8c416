package graft

import graft.features.{FeaturePipeline, Imputers}
import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    ("a", 1.0), ("a", 3.0), ("b", Double.NaN), ("a", 5.0), ("b", 7.0)
  ).toDF("cat", "x")

  private val spec = FeaturePipeline.Spec(
    imputeCols = Seq("x"),
    imputeStrategy = Imputers.Mean,
    indexCols = Seq("cat"),
    numericCols = Seq("x"),
    standardize = true)

  test("fit: mean fill excludes NaN; labels frequency-desc; z-params") {
    val f = FeaturePipeline.fit(train, spec)
    assert(f.fills("x") == 4.0) // mean of 1,3,5,7
    assert(f.labels("cat") == Seq("a", "b")) // a:3 > b:2
    assert(f.means.length == 2 && f.stds.length == 2)
    assert(f.means.head == 4.0) // imputed column mean
  }

  test("transform: assembled, imputed, standardized features") {
    val f = FeaturePipeline.fit(train, spec)
    val rows = f.transform(train).select("cat", "x", "features").collect()
    rows.foreach { r =>
      val feats = r.getSeq[Double](2)
      assert(feats.length == 2)
    }
    // NaN row: x imputed to mean 4.0 → z = 0
    val nanRow = rows.find(r => r.getDouble(1).isNaN).get
    assert(nanRow.getSeq[Double](2).head == 0.0)
    // checksum of z over column = ~0 (z-scores sum to 0)
    val zsum = rows.map(_.getSeq[Double](2).head).sum
    assert(math.abs(zsum) < 1e-12)
  }

  test("handleInvalid=keep: unseen label maps to numLabels") {
    val f = FeaturePipeline.fit(train, spec)
    val test = Seq(("zz", 2.0)).toDF("cat", "x")
    val feats = f.transform(test).select("features").head.getSeq[Double](0)
    // unstandardized index would be 2 (numLabels); with z applied it is
    // (2 - mu_idx)/sd_idx — verify via the unstandardized pipeline
    val raw = FeaturePipeline.fit(train, spec.copy(standardize = false))
    val rawFeats = raw.transform(test).select("features").head.getSeq[Double](0)
    assert(rawFeats(1) == 2.0)
    assert(feats.length == 2)
  }

  test("save/load round-trips exactly (same transform output)") {
    val f = FeaturePipeline.fit(train, spec)
    val path = java.nio.file.Files.createTempDirectory("graft-pipe")
      .resolve("pipe.txt").toString
    f.save(path)
    val g = FeaturePipeline.load(path)
    assert(g.fills == f.fills && g.labels == f.labels)
    assert(g.means == f.means && g.stds == f.stds)
    val a = f.transform(train).select("features").collect().map(_.getSeq[Double](0))
    val b = g.transform(train).select("features").collect().map(_.getSeq[Double](0))
    assert(a.toSeq == b.toSeq)
  }

  test("spark.ml pipeline twin: fit, transform, built-in save/load round-trip") {
    import graft.features.MlPipeline
    import org.apache.spark.ml.functions.vector_to_array
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_returnflag").limit(400)
    val m = MlPipeline.fit(df, Seq("l_quantity", "l_extendedprice"), Seq("l_returnflag"))
    val out = m.transform(df).select(vector_to_array(col("features")).as("f"))
    val rows = out.collect().map(_.getSeq[Double](0))
    assert(rows.nonEmpty && rows.forall(_.length == 3))
    // standardized columns: |mean| ~ 0 over the frame
    val meanQty = rows.map(_.head).sum / rows.length
    assert(math.abs(meanQty) < 1e-9, s"not centered: $meanQty")
    val dir = java.nio.file.Files.createTempDirectory("graft-mlpipe").toString
    MlPipeline.save(m, s"$dir/pipe")
    val m2 = MlPipeline.load(s"$dir/pipe")
    val rows2 = m2.transform(df).select(vector_to_array(col("features")).as("f"))
      .collect().map(_.getSeq[Double](0))
    assert(rows.toSeq == rows2.toSeq)
  }
}

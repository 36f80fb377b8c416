package graft

import graft.features.{FrequencyIndexer, Imputers, Standardizer}
import org.apache.spark.sql.functions._

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("Imputers mean fills nulls and NaNs with mean of valid") {
    val df = Seq(Some(1.0), Some(3.0), None, Some(Double.NaN)).toDF("x")
    val out = Imputers.impute(df, Seq("x"), Imputers.Mean)
    assert(out.agg(sum($"x")).head().getDouble(0) == 8.0) // 1+3+2+2
  }

  test("Imputers exact median") {
    val df = Seq(Some(1.0), Some(2.0), Some(10.0), None).toDF("x")
    val fills = Imputers.fit(df, Seq("x"), Imputers.MedianExact)
    assert(fills("x") == 2.0)
  }

  test("FrequencyIndexer: freq desc, tie by label asc, unseen=numLabels") {
    val train = Seq("b", "b", "a", "c", "c").toDF("cat")
    val m = FrequencyIndexer.fit(train, "cat")
    val idx = m.labels.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(idx == Map("b" -> 0L, "c" -> 1L, "a" -> 2L)) // b,c tie-broken by label
    val test = Seq("a", "zzz").toDF("cat")
    val out = m.transform(test, "cat_idx").orderBy("cat")
      .collect().map(_.getDouble(1)).toSeq
    assert(out == Seq(2.0, 3.0)) // unseen → numLabels ("keep")
  }

  test("Standardizer z-scores; zero-variance maps to 0") {
    val df = Seq((1.0, 5.0), (2.0, 5.0), (3.0, 5.0)).toDF("x", "const")
    val out = Standardizer.standardize(df, Seq("x", "const"))
    val rows = out.orderBy("x").collect()
    assert(rows.map(_.getDouble(1)).forall(_ == 0.0))
    assert(math.abs(rows.head.getDouble(0) + 1.0) < 1e-12) // (1-2)/1
  }

  test("robust scaler: median maps to 0, IQR to unit range, constants to 0") {
    import spark.implicits._
    val df = (1 to 101).map(i => (i.toDouble, 42.0)).toDF("x", "c")
    val m = graft.features.RobustScaler.fit(df, Seq("x", "c"))
    assert(m.stats("x") === ((51.0, 50.0))) // median 51, IQR 76-26
    val out = m.transform(df, "_s").where(col("x") === 51.0).head()
    assert(out.getDouble(out.fieldIndex("x_s")) === 0.0)
    assert(out.getDouble(out.fieldIndex("c_s")) === 0.0) // IQR=0 -> 0
  }

  test("discretizer: equal-freq balanced bins, equal-width known edges") {
    import spark.implicits._
    import graft.features.Discretizer
    val df = (1 to 100).map(_.toDouble).toDF("x")
    // equal-frequency, k=4: interior edges at exact quartiles, 25/bin
    val ef = Discretizer.fitEqualFreq(df, Seq("x"), 4)
    assert(ef.edges("x") == Seq(25.75, 50.5, 75.25))
    val efCounts = ef.transform(df).groupBy("x_bin").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(efCounts == Map(0 -> 25, 1 -> 25, 2 -> 25, 3 -> 25))
    // equal-width, k=4 on [0,100]: edges 25/50/75; value AT an edge
    // falls in the bin below (strict >)
    val wdf = (0 to 100).map(_.toDouble).toDF("x")
    val ew = Discretizer.fitEqualWidth(wdf, Seq("x"), 4)
    assert(ew.edges("x") == Seq(25.0, 50.0, 75.0))
    val bins = ew.transform(wdf).where(col("x").isin(25.0, 26.0, 100.0))
      .collect().map(r => r.getDouble(0) -> r.getInt(1)).toMap
    assert(bins == Map(25.0 -> 0, 26.0 -> 1, 100.0 -> 3))
    // degenerate constant column: no edges, everything in bin 0
    val c = Seq(7.0, 7.0).toDF("x")
    assert(Discretizer.fitEqualWidth(c, Seq("x"), 4).edges("x").isEmpty)
    // duplicate quantile edges collapse (heavy ties)
    val ties = Seq.fill(50)(1.0).map(Tuple1(_)).toDF("x")
    assert(Discretizer.fitEqualFreq(ties, Seq("x"), 4).edges("x") == Seq(1.0))
  }

  test("target encoder: smoothing shrinks to prior, LOO excludes own row") {
    import spark.implicits._
    import graft.features.TargetEncoder
    // a: y = 1,1,0,0 (mean .5); b: y = 1 (singleton); prior = 3/5
    val df = Seq(("a", 1), ("a", 1), ("a", 0), ("a", 0), ("b", 1))
      .toDF("cat", "y")
    val raw = TargetEncoder.encodings(df, "cat", "y", m = 0.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(raw == Map("a" -> 0.5, "b" -> 1.0))
    // m → ∞ limit: everything shrinks toward the prior; at m = 1:
    // a: (2 + .6)/5 = .52, b: (1 + .6)/2 = .8
    val sm = TargetEncoder.encodings(df, "cat", "y", m = 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(sm("a") - 0.52) < 1e-12 && math.abs(sm("b") - 0.8) < 1e-12)
    // LOO: an a-row with y=1 sees (2-1)/3; with y=0 sees 2/3; the
    // singleton b falls back to the prior 0.6
    val loo = TargetEncoder.looTransform(df, "cat", "y").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(math.abs(loo(("a", 1)) - 1.0 / 3) < 1e-12)
    assert(math.abs(loo(("a", 0)) - 2.0 / 3) < 1e-12)
    assert(math.abs(loo(("b", 1)) - 0.6) < 1e-12)
  }
}

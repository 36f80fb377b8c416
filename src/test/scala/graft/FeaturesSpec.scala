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
}

package graft

import graft.core.{Inequality, Rank, Skyline, WeightedQuantile}
import graft.seq.Changepoint
import org.apache.spark.sql.functions._

/** Rank statistics, inequality, weighted quantiles, changepoint, and
  * skyline — the round-7 robust-analytics additions.
  */
class RankStatsSpec extends SparkSpec {
  import spark.implicits._

  test("avgRank assigns fractional average ranks to ties") {
    val df = Seq(10.0, 20.0, 20.0, 30.0, 30.0, 30.0).toDF("x")
    val got = Rank.avgRank(df, "x", "r", "t:avgRank")
      .select("x", "r").as[(Double, Double)].collect().toMap
    // 10 → rank 1; 20,20 → (2+3)/2 = 2.5; 30×3 → (4+5+6)/2 = 5
    assert(got === Map(10.0 -> 1.0, 20.0 -> 2.5, 30.0 -> 5.0))
  }

  test("avgRank leaves null/NaN values unranked") {
    val df = Seq[java.lang.Double](5.0, null, Double.NaN, 7.0).toDF("x")
    val got = Rank.avgRank(df, "x", "r", "t:avgRankNull").collect()
    val ranked = got.filter(r => !r.isNullAt(1))
      .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(ranked === Map(5.0 -> 1.0, 7.0 -> 2.0))
    assert(got.count(_.isNullAt(1)) === 2)
  }

  test("spearman is ±1 for perfect monotone relations, Pearson-of-ranks otherwise") {
    val mono = (1 to 50).map(i => (i.toDouble, math.exp(i / 10.0), -i * 3.0))
      .toDF("a", "b", "c")
    val rows = Rank.spearmanMatrix(mono, Seq("a", "b", "c"), "t:spear")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(math.abs(rows(("a", "b")) - 1.0) < 1e-12)   // monotone increasing
    assert(math.abs(rows(("a", "c")) + 1.0) < 1e-12)   // monotone decreasing
    assert(math.abs(rows(("b", "c")) + 1.0) < 1e-12)
  }

  test("weighted quantiles select by cumulative weight") {
    // values 1..4 with weights 1,1,1,7: total 10; p=.5 needs cum ≥ 5 → 4
    val df = Seq((1.0, 1L), (2.0, 1L), (3.0, 1L), (4.0, 7L)).toDF("v", "w")
    val got = WeightedQuantile.quantiles(df, "v", "w",
      Seq(0.1, 0.3, 0.5, 1.0), "t:wq")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got === Map(0.1 -> 1.0, 0.3 -> 3.0, 0.5 -> 4.0, 1.0 -> 4.0))
  }

  test("weighted quantiles ignore zero and negative weights") {
    val df = Seq((1.0, 0L), (2.0, 5L), (9.0, -3L)).toDF("v", "w")
    val got = WeightedQuantile.quantiles(df, "v", "w", Seq(0.5), "t:wq0")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got === Map(0.5 -> 2.0))
  }

  test("gini is 0 for perfect equality and (n-1)/n-scaled for full concentration") {
    val eq = Seq.fill(8)(("g", 5.0)).zipWithIndex
      .map { case ((g, v), i) => (g, v, i.toLong) }.toDF("g", "x", "k")
    val g0 = Inequality.giniByGroup(eq, Seq("g"), "x", col("k"))
      .head().getAs[Double]("gini")
    assert(math.abs(g0) < 1e-12)
    // one member owns everything: G = (n-1)/n = 0.75 for n=4
    val conc = Seq(("h", 0.0, 1L), ("h", 0.0, 2L), ("h", 0.0, 3L), ("h", 100.0, 4L))
      .toDF("g", "x", "k")
    val g1 = Inequality.giniByGroup(conc, Seq("g"), "x", col("k"))
      .head().getAs[Double]("gini")
    assert(math.abs(g1 - 0.75) < 1e-12)
  }

  test("gini is null for single-member or zero-total groups") {
    val df = Seq(("a", 5.0, 1L), ("b", 0.0, 1L), ("b", 0.0, 2L)).toDF("g", "x", "k")
    val got = Inequality.giniByGroup(df, Seq("g"), "x", col("k"))
      .collect().map(r => r.getString(0) -> r.isNullAt(3)).toMap
    assert(got === Map("a" -> true, "b" -> true))
  }

  test("cusum closed form equals the sequential recursion") {
    val rnd = new scala.util.Random(7)
    val xs = Vector.tabulate(200) { i =>
      rnd.nextGaussian() + (if (i >= 120) 1.5 else 0.0)  // level shift at 120
    }
    val mu = 0.0; val k = 0.5; val h = 4.0
    // driver-side reference recursion
    var sp = 0.0; var sn = 0.0
    val expect = xs.map { x =>
      sp = math.max(0.0, sp + (x - mu - k))
      sn = math.max(0.0, sn + (mu - x - k))
      (sp, sn)
    }
    val df = xs.zipWithIndex.map { case (x, i) => ("u", i.toLong, x) }
      .toDF("key", "t", "x")
    val got = Changepoint.cusum(df, Seq("key"), Seq(col("t")), "x", mu, k, h)
      .orderBy("t").select("cusum_pos", "cusum_neg")
      .as[(Double, Double)].collect()
    expect.zip(got).foreach { case ((ep, en), (gp, gn)) =>
      assert(math.abs(ep - gp) < 1e-9 && math.abs(en - gn) < 1e-9)
    }
    // the shift is detected, and only after it starts
    val alarms = Changepoint.cusum(df, Seq("key"), Seq(col("t")), "x", mu, k, h)
      .where(col("alarm") === 1).select("t").as[Long].collect()
    assert(alarms.nonEmpty && alarms.min >= 120)
  }

  test("skyline equals brute-force dominance on random data") {
    val rnd = new scala.util.Random(11)
    val pts = Vector.tabulate(300)(i =>
      (i.toLong, rnd.nextInt(40).toDouble, rnd.nextInt(40).toDouble))
    val brute = pts.filterNot { case (_, x, y) =>
      pts.exists { case (_, a, b) => a >= x && b >= y && (a > x || b > y) }
    }.map(_._1).toSet
    val df = pts.toDF("id", "x", "y").repartition(5)
    val got = Skyline.skyline(df, Seq("x", "y")).select("id").as[Long]
      .collect().toSet
    assert(got === brute)
  }

  test("skyline drops rows with null or NaN criteria") {
    val df = Seq[(Long, java.lang.Double, java.lang.Double)](
      (1L, 1.0, 1.0), (2L, null, 9.0), (3L, Double.NaN, 9.0), (4L, 2.0, 2.0))
      .toDF("id", "x", "y")
    val got = Skyline.skyline(df, Seq("x", "y")).select("id").as[Long]
      .collect().toSet
    assert(got === Set(4L))
  }
}

package graft

import graft.score.Hbos
import org.apache.spark.sql.functions._

/** Specs for the round-7 statistics queries: HBOS scoring and the
  * Welch / ACF arithmetic they register in SparkEntry.
  */
class StatsQuerySpec extends SparkSpec {
  import spark.implicits._

  test("hbos assigns the planted outlier the highest score") {
    // two dense clusters + one far outlier in both features
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      (i.toLong, 10.0 + rnd.nextDouble(), 50.0 + rnd.nextDouble())
    } :+ (9999L, 500.0, -300.0)
    val df = rows.toDF("id", "a", "b")
    val m = Hbos.fit(df, Seq("a", "b"), bins = 10)
    val top = df.select(col("id"), m.score.as("s"))
      .orderBy(desc("s")).head()
    assert(top.getLong(0) === 9999L)
  }

  test("hbos is uniform-score on a constant column (edges collapse)") {
    val df = (1 to 100).map(i => (i.toLong, 1.0)).toDF("id", "a")
    val m = Hbos.fit(df, Seq("a"), bins = 5)
    // all edges collapse to one value; every row lands in one bin with
    // density 1 → score -log10(1) = 0
    val ss = df.select(m.score.as("s")).distinct().collect()
    assert(ss.length === 1)
    assert(math.abs(ss.head.getDouble(0)) < 1e-12)
  }

  test("hbos score equals sum of per-feature -log10 densities") {
    val df = Seq((1.0, 1.0), (1.0, 1.0), (2.0, 2.0), (4.0, 4.0))
      .toDF("a", "b")
    val m = Hbos.fit(df, Seq("a", "b"), bins = 2)
    // per feature: range [1,4], single edge at 2.5; bin0 {1,1,2} p=0.75,
    // bin1 {4} p=0.25 — score sums the two features' identical terms
    val got = df.select(col("a"), m.score.as("s")).collect()
      .map(r => r.getDouble(0) -> r.getDouble(1))
    got.foreach { case (a, s) =>
      val p = if (a > 2.5) 0.25 else 0.75
      assert(math.abs(s - 2 * -math.log10(p)) < 1e-12)
    }
  }

  test("welch t-stat matches the closed form on a tiny frame") {
    // group A: 1,2,3 (mean 2, var 1); group B: 2,4,6,8 (mean 5, var 20/3)
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0),
      ("B", 2.0), ("B", 4.0), ("B", 6.0), ("B", 8.0)).toDF("g", "v")
    val ag = df.groupBy("g").agg(count(lit(1)).cast("double").as("n"),
      graft.core.Stats.dmean(col("v")).as("m"),
      graft.core.Stats.dvarSamp(col("v")).as("s2"))
    val r = ag.collect().map(x => x.getString(0) ->
      (x.getDouble(1), x.getDouble(2), x.getDouble(3))).toMap
    val (n1, m1, v1) = r("A"); val (n2, m2, v2) = r("B")
    val se = v1 / n1 + v2 / n2
    val t = (m1 - m2) / math.sqrt(se)
    val df_ = se * se /
      (v1 / n1 * (v1 / n1) / (n1 - 1) + v2 / n2 * (v2 / n2) / (n2 - 1))
    assert(math.abs(m1 - 2.0) < 1e-12 && math.abs(m2 - 5.0) < 1e-12)
    assert(math.abs(v1 - 1.0) < 1e-12 && math.abs(v2 - 20.0 / 3) < 1e-12)
    // closed form: se = 1/3 + 5/3 = 2, t = -3/sqrt(2)
    assert(math.abs(t - (-3.0 / math.sqrt(2))) < 1e-12)
    assert(df_ > 3.0 && df_ < n1 + n2 - 2) // Welch df between min and pooled
  }

  test("mann-whitney rank sum matches the hand-computed U on a tiny sample") {
    // A: 1,2,3  B: 4,5 → all A below all B: U1 = 0, R1 = 1+2+3 = 6
    val df = Seq(("A", 1.0), ("A", 2.0), ("A", 3.0), ("B", 4.0), ("B", 5.0))
      .toDF("g", "v")
    val ranked = graft.core.Rank.avgRank(df, "v", "rk", "spec_mw")
    val r1 = ranked.where(col("g") === "A")
      .agg(graft.core.Stats.dsum(col("rk"))).head().getDouble(0)
    assert(r1 === 6.0)
    val u1 = r1 - 3.0 * 4.0 / 2.0
    assert(u1 === 0.0)
  }

  test("average-tie ranks give tied values the midpoint rank") {
    val df = Seq(1.0, 2.0, 2.0, 3.0).toDF("v")
    val got = graft.core.Rank.avgRank(df, "v", "rk", "spec_ties")
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(got(1.0) === 1.0 && got(2.0) === 2.5 && got(3.0) === 4.0)
  }

  test("acf of a perfectly alternating series is -1 at lag 1 (calendar join)") {
    val daily = (0 until 20).map(d => (d.toLong, if (d % 2 == 0) 1.0 else 3.0))
      .toDF("d", "c")
    val mu = daily.agg(graft.core.Stats.dmean(col("c"))).head().getDouble(0)
    val dev = daily.select(col("d"), (col("c") - lit(mu)).as("x"))
    val denom = dev.agg(graft.core.Stats.dsum(col("x") * col("x")))
      .head().getDouble(0)
    val acf1 = dev.toDF("d", "x")
      .join(dev.toDF("d2", "y"), col("d2") === col("d") + lit(1))
      .agg(graft.core.Stats.dsum(col("x") * col("y"))).head().getDouble(0) / denom
    // 19 of 20 terms pair (+1,-1): acf1 = -19/20
    assert(math.abs(acf1 - (-19.0 / 20)) < 1e-12)
  }
}

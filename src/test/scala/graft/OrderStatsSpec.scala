package graft

import graft.core.{OrderStats, Quantiles}
import org.apache.spark.sql.functions._

/** The distributed order-statistic selection must be BITWISE identical to
  * Catalyst `Percentile` (the previous oracle-green implementation) — the
  * driver hash-compares query outputs, so equality here is the guarantee
  * that swapping the plan does not move a single hash.
  */
class OrderStatsSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.0, 0.01, 0.25, 0.5, 0.72, 0.75, 0.9, 0.95, 0.99, 1.0)

  private def assertMatchesPercentile(values: Seq[Double], label: String): Unit = {
    val df = values.toDF("x").repartition(7)
    val expected = df.agg(Quantiles.exact(col("x"), ps)).head().getSeq[Double](0)
    // tiny collectThreshold + small bucket count force the histogram
    // recursion even on test-sized data
    val got = OrderStats.quantiles(df, Seq("x"), ps, buckets = 8, collectThreshold = 3)("x")
    got.zip(expected).zip(ps).foreach { case ((g, e), p) =>
      assert(g == e, s"$label p=$p: got $g expected $e")
    }
  }

  test("matches Percentile bitwise: uniform ints") {
    assertMatchesPercentile((1 to 101).map(_.toDouble), "uniform")
  }

  test("matches Percentile bitwise: heavy ties") {
    assertMatchesPercentile(Seq.fill(40)(2.0) ++ Seq.fill(40)(7.0) ++ Seq(1.0, 9.0, 7.5), "ties")
  }

  test("matches Percentile bitwise: negative + skewed doubles") {
    val vs = (1 to 200).map(i => math.pow(-1, i) * math.exp(i / 23.0) / (i + 0.5))
    assertMatchesPercentile(vs, "skewed")
  }

  test("matches Percentile bitwise: near-identical values (ulp-dense)") {
    val base = 1.0
    val vs = (0 until 50).map(i => base + i * java.lang.Math.ulp(base))
    assertMatchesPercentile(vs, "ulp")
  }

  test("matches Percentile bitwise: infinite tails") {
    val vs = Seq(Double.NegativeInfinity, Double.NegativeInfinity, 1.0, 2.0,
      3.0, 4.0, 5.0, Double.PositiveInfinity)
    assertMatchesPercentile(vs, "infinities")
    // all-infinite column
    val allInf = Seq(Double.NegativeInfinity, Double.PositiveInfinity,
      Double.PositiveInfinity)
    val df = allInf.toDF("x")
    val exp = df.agg(Quantiles.exact(col("x"), Seq(0.0, 0.5, 1.0))).head().getSeq[Double](0)
    val got = OrderStats.quantilesOf(df, "x", Seq(0.0, 0.5, 1.0))
    got.zip(exp).foreach { case (g, e) =>
      assert(g == e || (g.isNaN && e.isNaN), s"got $g expected $e")
    }
  }

  test("single value, constant column, and nulls/NaN excluded") {
    assert(OrderStats.quantilesOf(Seq(5.0).toDF("x"), "x", Seq(0.0, 0.5, 1.0)) == Seq(5.0, 5.0, 5.0))
    assert(OrderStats.quantilesOf(Seq.fill(10)(3.0).toDF("x"), "x", Seq(0.25, 0.9)) == Seq(3.0, 3.0))
    val withJunk = Seq(Some(1.0), None, Some(Double.NaN), Some(2.0), Some(3.0)).toDF("x")
    assert(OrderStats.quantilesOf(withJunk, "x", Seq(0.5)) == Seq(2.0))
    assert(OrderStats.quantilesOf(withJunk.where($"x" > 100), "x", Seq(0.5)).head.isNaN)
  }

  test("multi-column batch shares the stats pass and resolves independently") {
    val df = (1 to 50).map(i => (i.toDouble, (51 - i) * 10.0)).toDF("a", "b")
    val m = OrderStats.quantiles(df, Seq("a", "b"), Seq(0.5), buckets = 4, collectThreshold = 2)
    val ea = df.agg(Quantiles.exact($"a", Seq(0.5))).head().getSeq[Double](0).head
    val eb = df.agg(Quantiles.exact($"b", Seq(0.5))).head().getSeq[Double](0).head
    assert(m("a").head == ea && m("b").head == eb)
  }

  test("randomized differential: matches Percentile across shapes (fixed seed)") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 10).foreach { case_i =>
      val n = 1 + rnd.nextInt(300)
      val distinct = 1 + rnd.nextInt(20) // force heavy ties sometimes
      val scale = math.pow(10.0, rnd.nextInt(7) - 3)
      val vs = Seq.fill(n)((rnd.nextInt(distinct) - distinct / 2) * scale +
        (if (rnd.nextBoolean()) rnd.nextDouble() * 1e-9 else 0.0))
      val qs = Seq.fill(1 + rnd.nextInt(4))(rnd.nextDouble()).sorted
      assertMatchesPercentile2(vs, qs, s"case $case_i (n=$n d=$distinct)")
    }
  }

  private def assertMatchesPercentile2(values: Seq[Double], qs: Seq[Double], label: String): Unit = {
    val df = values.toDF("x").repartition(5)
    val expected = df.agg(Quantiles.exact(col("x"), qs)).head().getSeq[Double](0)
    val got = OrderStats.quantiles(df, Seq("x"), qs, buckets = 8, collectThreshold = 4)("x")
    got.zip(expected).zip(qs).foreach { case ((g, e), p) =>
      assert(g == e, s"$label p=$p: got $g expected $e")
    }
  }

  test("matches Percentile on real table column (lineitem quantities)") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val expected = li.agg(Quantiles.exact(col("l_extendedprice"), ps)).head().getSeq[Double](0)
    val got = OrderStats.quantilesOf(li, "l_extendedprice", ps)
    got.zip(expected).foreach { case (g, e) => assert(g == e, s"got $g expected $e") }
  }
  test("matches Percentile bitwise: subnormals, extremes, mixed magnitudes") {
    val vs = Seq(java.lang.Double.MIN_VALUE, 1.5e-310, -1.5e-310, 0.0,
      1.0e308, -1.0e308, 1e-16, -1e-16, 3.14, -2.71, 1e100, -1e100, 2.0, 2.0)
    assertMatchesPercentile(vs, "extremes")
  }

  test("groupedQuantiles matches per-group Percentile exactly") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val qs = Seq(0.25, 0.5, 0.95)
    val got = OrderStats.groupedQuantiles(li, "l_returnflag", "l_extendedprice", qs,
        buckets = 16, collectThreshold = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val expected = li.groupBy(col("l_returnflag"))
      .agg(Quantiles.exact(col("l_extendedprice"), qs).as("q"))
      .collect().flatMap { r =>
        qs.zip(r.getSeq[Double](1)).map { case (p, v) => (r.getString(0), p) -> v }
      }.toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, v) => assert(v == expected(k), s"$k: got $v expected ${expected(k)}") }
  }

  test("groupedQuantiles excludes null groups and handles empty-value groups") {
    import spark.implicits._
    val df = Seq[(java.lang.String, java.lang.Double)](
      ("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", Double.NaN), (null, 9.0))
      .toDF("g", "v")
    val out = OrderStats.groupedQuantiles(df, "g", "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(out.keySet === Set("a", "b"))
    assert(out("a") == 2.0)
    assert(out("b").isNaN) // all values invalid -> NaN quantile
  }

  test("groupedQuantiles scales past 64 groups (semi-join membership path)") {
    import spark.implicits._
    // 300 groups × 101 values: enough columns that the literal OR-chain
    // predicate would (before the semi-join path) build a 300-disjunct
    // tree — the shape that overflowed the column-conversion stack at
    // 1500 groups in q133
    val rnd = new scala.util.Random(13)
    val rows = for { g <- 0 until 300; _ <- 0 until 101 }
      yield (s"g$g", rnd.nextDouble() * g)
    val df = rows.toDF("g", "v").repartition(8)
    val got = OrderStats.groupedQuantiles(df, "g", "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got.size === 300)
    val byG = rows.groupBy(_._1)
    got.foreach { case (g, v) =>
      val sorted = byG(g).map(_._2).sorted
      assert(v == sorted(50), s"group $g: got $v expected ${sorted(50)}")
    }
  }

  test("spark's mergeable approx_percentile stays within accuracy of the exact engine") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    // the documented approximate scale path: approx_percentile's
    // mergeable sketch (one pass, no selection rounds) vs the exact
    // distributed selection — relative rank error bounded by 1/accuracy
    val df = (1 to 20000).map(i => (i.toDouble * 0.5)).toDF("v")
    val exact = OrderStats.quantilesOf(df, "v", Seq(0.1, 0.5, 0.9))
    val approx = df.agg(expr(
      "approx_percentile(v, array(0.1, 0.5, 0.9), 1000)")).head()
      .getSeq[Double](0)
    exact.zip(approx).zip(Seq(0.1, 0.5, 0.9)).foreach { case ((e, a), p) =>
      // rank error ≤ n/accuracy = 20 ranks → value error ≤ 20·0.5 + slack
      assert(math.abs(e - a) <= 11.0,
        s"p=$p: approx $a too far from exact $e")
    }
  }
}

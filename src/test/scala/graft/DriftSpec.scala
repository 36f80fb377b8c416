package graft

import graft.drift.Drift
import org.apache.spark.sql.functions._

/** Distribution-drift operators: PSI, two-sample KS, chi-square. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("psi is ~0 for identical distributions and large for shifted ones") {
    val base = (1 to 2000).map(i => i.toDouble % 100).toDF("x")
    val same = (1 to 2000).map(i => (i.toDouble + 7) % 100).toDF("x")
    val shifted = (1 to 2000).map(i => i.toDouble % 100 + 80).toDF("x")
    val lo = Drift.psi(base, same, Seq("x")).head().getDouble(1)
    val hi = Drift.psi(base, shifted, Seq("x")).head().getDouble(1)
    assert(math.abs(lo) < 0.01, s"identical-distribution psi should be ~0, got $lo")
    assert(hi > 0.25, s"shifted-distribution psi should flag, got $hi")
  }

  test("psi excludes null and NaN values and fuses multiple columns") {
    val base = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (2.0, 20.0), (3.0, 30.0), (4.0, 40.0), (5.0, 50.0),
      (6.0, 60.0), (7.0, 70.0), (8.0, 80.0), (9.0, 90.0), (10.0, 100.0))
      .toDF("a", "b")
    val cur = Seq[(java.lang.Double, java.lang.Double)](
      (1.0, 10.0), (null, 20.0), (Double.NaN, 30.0), (4.0, 40.0), (5.0, 50.0))
      .toDF("a", "b")
    val out = Drift.psi(base, cur, Seq("a", "b"), bins = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet === Set("a", "b"))
    // column a: current valid values {1,4,5} vs balanced baseline —
    // the nulls must not land in bin 0 (they'd fake a mass shift)
    assert(out("a") >= 0.0 && out("b") >= 0.0)
  }

  test("psi keeps bin resolution on small-magnitude columns (edge rounding escalates)") {
    // inter-quantile gaps ~1e-10: rounding to 6 absolute decimals would
    // merge every edge to 0.0 and flatten the histogram to one bin,
    // reporting psi ~0 for a blatant shift
    val base = (1 to 1000).map(i => i * 1e-9).toDF("x")
    val shifted = (1 to 1000).map(i => (i + 800) * 1e-9).toDF("x")
    val hi = Drift.psi(base, shifted, Seq("x")).head().getDouble(1)
    assert(hi > 0.25, s"small-scale shifted psi should flag, got $hi")
    val same = (1 to 1000).map(i => i * 1e-9).toDF("x")
    val lo = Drift.psi(base, same, Seq("x")).head().getDouble(1)
    assert(math.abs(lo) < 0.01, s"small-scale identical psi should be ~0, got $lo")
  }

  test("psi emits a null-psi row for every requested column, even empty-in-both ones") {
    val base = Seq[(Double, java.lang.Double)]((1.0, null), (2.0, null), (3.0, null))
      .toDF("a", "b")
    val cur = Seq[(Double, java.lang.Double)]((1.0, null), (4.0, null))
      .toDF("a", "b")
    val out = Drift.psi(base, cur, Seq("a", "b"), bins = 2).collect()
    assert(out.length === 2)
    val byName = out.map(r => r.getString(0) -> r).toMap
    assert(!byName("a").isNullAt(1))
    assert(byName("b").isNullAt(1), "all-null column must emit a null psi row")
  }

  test("psi yields null (not a job failure) on an empty current side") {
    val base = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val cur = base.where(lit(false))
    assert(Drift.psi(base, cur, Seq("x"), bins = 2).head().isNullAt(1))
  }

  test("ks matches the hand-computed statistic on a small sample") {
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    // ECDFs diverge most at v=2: |2/4 - 0/4| = 0.5
    val row = Drift.ks(a, b, "v").head()
    assert(row.getDouble(0) === 0.5)
    assert(row.getLong(1) === 4L && row.getLong(2) === 4L)
  }

  test("ks is 0 for identical samples and ~1 for disjoint ones") {
    val a = (1 to 500).map(_.toDouble).toDF("v")
    val d = (1001 to 1500).map(_.toDouble).toDF("v")
    assert(Drift.ks(a, a, "v").head().getDouble(0) === 0.0)
    assert(Drift.ks(a, d, "v").head().getDouble(0) === 1.0)
  }

  test("chi-square is 0 for identical category mixes and positive under drift") {
    val base = (1 to 900).map(i => if (i % 3 == 0) "x" else "y").toDF("c")
    val cur = (1 to 300).map(i => if (i % 3 == 0) "x" else "y").toDF("c")
    val same = Drift.chiSquare(base, cur, "c").head()
    assert(same.getDouble(0) === 0.0)
    assert(same.getLong(1) === 2L)
    val drifted = (1 to 300).map(_ => "x").toDF("c")
    assert(Drift.chiSquare(base, drifted, "c").head().getDouble(0) > 100.0)
  }

  test("chi-square survives a category absent from one side") {
    val base = Seq("x", "x", "y").toDF("c")
    val cur = Seq("x", "z").toDF("c") // z unseen in baseline
    val row = Drift.chiSquare(base, cur, "c").head()
    assert(!row.isNullAt(0) && row.getDouble(0) > 0.0)
    assert(row.getLong(1) === 3L)
  }

  test("chi-square yields null (not a job failure) on an empty current side") {
    val base = Seq("x", "y").toDF("c")
    val cur = base.where(lit(false))
    assert(Drift.chiSquare(base, cur, "c").head().isNullAt(0))
  }

  test("cramers V is 1 for perfect association, ~0 for independence, null for degenerate") {
    // perfect: b is a function of a (and vice versa)
    val perfect = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q"),
      ("z", "r")).toDF("a", "b")
    val v1 = Drift.cramersV(perfect, "a", "b").head().getAs[Double]("cramers_v")
    assert(math.abs(v1 - 1.0) < 1e-9, s"perfect association should give 1, got $v1")
    // independent: every (a, b) cell equally filled
    val indep = (for { a <- Seq("x", "y"); b <- Seq("p", "q"); _ <- 1 to 25 }
      yield (a, b)).toDF("a", "b")
    val v0 = Drift.cramersV(indep, "a", "b").head().getAs[Double]("cramers_v")
    assert(math.abs(v0) < 1e-9, s"independence should give ~0, got $v0")
    // degenerate: one column is constant → V undefined
    val degen = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    assert(Drift.cramersV(degen, "a", "b").head()
      .isNullAt(4))
  }

  test("benford digit extraction is exact at powers of ten and flags uniform data") {
    val powers = Seq(1.0, 10.0, 100.0, 1000.0, 10000.0, 0.1, 0.01).toDF("x")
    val d = Drift.benford(powers, "x").select("digit", "n_obs")
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(d === Map(1 -> 7L), s"all powers of ten have first digit 1: $d")
    // digits 1..9 uniformly: MAD far above the Nigrini conformity bound
    val uniform = (1 to 9).flatMap(dd => Seq.fill(100)(dd * 7.0)).toDF("x")
    val mad = Drift.benford(uniform, "x").head().getAs[Double]("mad")
    assert(mad > 0.015, s"uniform digits are non-conforming, mad=$mad")
    // benford-ish data (log-uniform): small MAD
    val rnd = new scala.util.Random(3)
    val logu = Seq.fill(5000)(math.pow(10.0, rnd.nextDouble() * 4)).toDF("x")
    val madB = Drift.benford(logu, "x").head().getAs[Double]("mad")
    assert(madB < 0.012, s"log-uniform data conforms to Benford, mad=$madB")
  }

  test("benford excludes non-positive, null, and NaN values") {
    val df = Seq[java.lang.Double](-5.0, 0.0, null, Double.NaN, 23.0).toDF("x")
    val rows = Drift.benford(df, "x").collect()
    assert(rows.length === 1 && rows(0).getInt(0) === 2 && rows(0).getLong(1) === 1L)
  }
}

package graft

import graft.score.ReconstructionError
import org.apache.spark.sql.functions._

class ReconSpec extends SparkSpec {
  import spark.implicits._

  test("varNormalizedMae matches hand computation (var floor applied)") {
    val df = Seq((Seq(1.0, 10.0), Seq(0.0, 12.0))).toDF("x", "xhat")
    // vars: 0.5 and 0 (floored to 1e-6): (|1-0|/0.5 + |10-12|/1e-6)/2
    val got = df.select(ReconstructionError.varNormalizedMae(
      col("x"), col("xhat"), Seq(0.5, 0.0))).head.getDouble(0)
    val want = (1.0 / 0.5 + 2.0 / 1e-6) / 2.0
    assert(math.abs(got - want) / want < 1e-15)
  }

  test("zero error for perfect reconstruction") {
    val df = Seq((Seq(3.0, 4.0), Seq(3.0, 4.0))).toDF("x", "xhat")
    val got = df.select(ReconstructionError.varNormalizedMae(
      col("x"), col("xhat"), Seq(1.0, 1.0))).head.getDouble(0)
    assert(got == 0.0)
  }

  test("seqVarNormalizedMae averages per-timestep scores") {
    val df = Seq(Tuple1(Seq(Seq(1.0), Seq(3.0)))).toDF("seq")
    // steps vs xhat=[2.0], var=[1.0]: (|1-2| + |3-2|)/2 timesteps = 1.0
    val got = df.select(ReconstructionError.seqVarNormalizedMae(
      col("seq"), Seq(2.0), Seq(1.0))).head.getDouble(0)
    assert(got == 1.0)
  }

  test("scalar-columns form is bitwise-identical to the array fold") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_quantity", "l_extendedprice", "l_discount")
    val mus = Seq(20.0, 30000.0, 0.05)
    val vars = Seq(100.0, 1e8, 0.001)
    val x = array(df.columns.map(c => col(c).cast("double")): _*)
    val xhat = array(mus.map(lit): _*)
    val both = df.select(
      ReconstructionError.varNormalizedMae(x, xhat, vars).as("a"),
      ReconstructionError.varNormalizedMaeCols(
        df.columns.map(col).toSeq, mus, vars).as("b")).collect()
    both.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("monotone in reconstruction distance") {
    val df = Seq(
      (1L, Seq(1.0, 1.0)), (2L, Seq(5.0, 5.0))
    ).toDF("id", "x").withColumn("xhat", typedLit(Seq(0.0, 0.0)))
    val scored = df.select(col("id"), ReconstructionError.varNormalizedMae(
      col("x"), col("xhat"), Seq(1.0, 1.0)).as("e"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(2L) > scored(1L))
  }

  test("VAE loss: closed forms and reparameterization identities") {
    import graft.score.VaeLoss
    val df = Seq((1L, Seq(1.0, 3.0), Seq(0.0, 1.0), Seq(0.5, -0.5), Seq(0.0, 0.0)))
      .toDF("id", "x", "xhat", "mu", "logvar")
    val r = df.select(
      VaeLoss.mse($"x", $"xhat"),
      VaeLoss.klDivergence($"mu", $"logvar"),
      VaeLoss.loss($"x", $"xhat", $"mu", $"logvar")).head()
    // mse = ((1-0)^2 + (3-1)^2)/2 = 2.5
    assert(r.getDouble(0) == 2.5)
    // kl = -0.5 * mean(1 + 0 - mu^2 - e^0) = -0.5 * mean(-0.25, -0.25) = 0.125
    assert(math.abs(r.getDouble(1) - 0.125) < 1e-12)
    assert(r.getDouble(2) == r.getDouble(0) + r.getDouble(1))
    // kl(mu=0, logvar=0) = 0; z(eps=0) = mu; z(logvar=0, eps=e) = mu + e
    val z = Seq((1L, Seq(0.7, -0.2), Seq(0.0, 0.0), Seq(1.0, 2.0)))
      .toDF("id", "mu", "logvar", "eps")
      .select(VaeLoss.klDivergence($"mu", $"logvar"),
        VaeLoss.reparameterize($"mu", $"logvar",
          org.apache.spark.sql.functions.transform($"mu", _ => lit(0.0))),
        VaeLoss.reparameterize($"mu", $"logvar", $"eps")).head()
    // terms: 1 + 0 − μ² − e⁰ = −μ² → kl = −0.5·mean(−0.49, −0.04)
    assert(math.abs(z.getDouble(0) - (-0.5 * (-0.49 + -0.04) / 2)) < 1e-12)
    assert(z.getSeq[Double](1) == Seq(0.7, -0.2))
    assert(z.getSeq[Double](2) == Seq(1.7, 1.8))
  }
}

package graft

import graft.plans.GraftOptimizations
import org.apache.spark.sql.functions._

class PlansSpec extends SparkSpec {

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  test("approx-quantile rule: off by default, flag-gated rewrite") {
    GraftOptimizations.enable(spark)
    val q = li.agg(percentile(col("l_extendedprice"), lit(0.95)))

    spark.conf.set("spark.graft.approxQuantiles", "false")
    val exactPlan = q.queryExecution.optimizedPlan.toString
    assert(exactPlan.contains("percentile") &&
      !exactPlan.contains("percentile_approx"), exactPlan)
    val exact = q.head.getDouble(0)

    spark.conf.set("spark.graft.approxQuantiles", "true")
    try {
      val rewritten = li.agg(percentile(col("l_extendedprice"), lit(0.95)))
      val approxPlan = rewritten.queryExecution.optimizedPlan.toString
      assert(approxPlan.contains("percentile_approx"), approxPlan)
      val approx = rewritten.head.getDouble(0)
      assert(math.abs(approx - exact) / exact < 0.01,
        s"approx $approx too far from exact $exact")
    } finally spark.conf.set("spark.graft.approxQuantiles", "false")
  }

  test("rewrite preserves array-percentage quantile shape") {
    GraftOptimizations.enable(spark)
    spark.conf.set("spark.graft.approxQuantiles", "true")
    try {
      val r = li.agg(graft.core.Quantiles.exact(col("l_quantity"),
        Seq(0.25, 0.75))).head.getSeq[Double](0)
      assert(r.length == 2 && r(0) <= r(1))
    } finally spark.conf.set("spark.graft.approxQuantiles", "false")
  }
}

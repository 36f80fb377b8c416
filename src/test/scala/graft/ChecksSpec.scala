package graft

import graft.core.Checks
import graft.core.Checks._
import graft.eval.Metrics
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  test("checks: pass/fail semantics on a crafted frame") {
    val df = Seq(
      (1L, Some(1.0), 0.02), (2L, None, 0.03), (3L, Some(3.0), 0.9),
      (3L, Some(Double.NaN), 0.01)
    ).toDF("id", "x", "d")
    val out = Checks.run(df, Seq(
      MaxNullFraction("x", 0.6),   // 2/4 null-ish → pass
      MaxNullFraction("x", 0.4),   // 0.5 > 0.4 → fail
      InRange("d", 0.0, 0.1),      // one value 0.9 → fail (observed 1)
      Unique("id"),                // id 3 twice → fail
      NonEmpty,
      Finite("x")                  // NaN → fail (observed 1)
    )).collect().map(r => (r.getString(0), r.getDouble(1), r.getBoolean(3)))
    val byName = out.groupBy(_._1).view.mapValues(_.toSeq).toMap
    val nf = byName("null_fraction(x)").sortBy(_._2)
    assert(nf.map(_._2) == Seq(0.5, 0.5) && nf.map(_._3).toSet == Set(true, false))
    assert(byName("in_range(d)") == Seq(("in_range(d)", 1.0, false)))
    assert(byName("unique(id)") == Seq(("unique(id)", 1.0, false)))
    assert(byName("non_empty").head._3)
    assert(byName("finite(x)") == Seq(("finite(x)", 1.0, false)))
  }

  test("referentialOrphans counts missing foreign keys") {
    val fact = Seq(1L, 2L, 3L, 99L).toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("pk")
    assert(Checks.referentialOrphans(fact, "fk", dim, "pk") == 1L)
  }

  test("binned ROC AUC approximates the exact AUC") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .withColumn("label", when(col("l_returnflag") === "R", 1).otherwise(0))
    val exact = Metrics.aucDF(df, "label", "l_extendedprice")
      .head.getDouble(0)
    val binned = Metrics.binnedRocAuc(df, "label", "l_extendedprice", bins = 50)
      .head.getDouble(0)
    assert(math.abs(exact - binned) < 0.05, s"exact=$exact binned=$binned")
  }
}

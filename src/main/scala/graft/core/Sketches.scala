package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Self-verifying mergeable-sketch operators.
  *
  * At 100 TB the exact multi-pass statistics (`OrderStats` selection,
  * `count(DISTINCT …)`) give way to single-pass mergeable sketches
  * (Greenwald–Khanna quantile summaries, HyperLogLog++). Approximate
  * results cannot be hash-compared across engines, so each operator
  * here audits the sketch IN-QUERY against its worst-case guarantee and
  * outputs (exact statistic, bound-check boolean): the exact side is
  * cross-engine-checkable, and the oracle asserts the boolean as
  * literal TRUE — a sketch that ever violates its guarantee fails the
  * correctness gate, not just a unit test.
  *
  * Reference tie-in: the reference profiles with exact pandas/numpy
  * stats (`lib/utils.py` describe/quantile paths); these sketches are
  * the scale substitutes a 100 TB deployment swaps in, shipped WITH
  * their acceptance audit.
  */
object Sketches {

  /** Greenwald–Khanna quantile sketch audit (Spark's
    * `percentile_approx`, worst-case rank error n/accuracy per summary).
    * With duplicated values the estimate's rank is an interval
    * [count(< est) + 1, count(≤ est)]; the audit passes iff it
    * intersects [p·n − slack, p·n + slack]. `slack` is
    * 3 · n/accuracy + 1: pairwise merging of per-partition summaries
    * can accumulate epsilon beyond a single summary's bound (GK merge
    * is ≤ ε_a + ε_b worst-case before re-compression) and rank
    * conventions differ by one — 3× keeps the audit merge-order-robust
    * while still rejecting a broken sketch (0.5% → 1.5% rank error at
    * the default accuracy).
    *
    * Three jobs, all single-pass mergeable: the sketch, one fused
    * rank-count aggregate over the estimates, and the exact-quantile
    * selection (for the cross-engine value column).
    */
  def quantileAudit(df: DataFrame, colName: String, ps: Seq[Double],
                    accuracy: Int = 200): DataFrame = {
    require(ps.nonEmpty, "quantileAudit needs at least one percentile")
    val c = col(colName).cast(DoubleType)
    val r0 = df.agg(
      percentile_approx(c, array(ps.map(lit): _*), lit(accuracy)).as("est"),
      count(c).as("n")).head()
    val n = r0.getLong(1)
    // percentile_approx returns null over an empty/all-null column;
    // fail diagnosably instead of NPE-ing on the estimate array
    require(n > 0 && !r0.isNullAt(0),
      s"quantileAudit($colName): no non-null values to sketch")
    val ests = r0.getSeq[Double](0)
    val rankAggs = ests.zipWithIndex.flatMap { case (e, i) =>
      Seq(count(when(c < e, 1)).as(s"lt_$i"),
        count(when(c <= e, 1)).as(s"le_$i"))
    }
    val r1 = df.agg(rankAggs.head, rankAggs.tail: _*).head()
    val exact = Quantiles.exactQuantiles(df, colName, ps)
    val slack = 3.0 * n.toDouble / accuracy + 1.0
    val spark = df.sparkSession
    import spark.implicits._
    ps.indices.map { i =>
      val target = ps(i) * n
      val lo = r1.getLong(2 * i) + 1.0
      val hi = r1.getLong(2 * i + 1).toDouble
      (f"p${ps(i)}%.2f", math.round(exact(i) * 1e6) / 1e6,
        hi >= target - slack && lo <= target + slack)
    }.toDF("quantile", "exact_value", "within_bound")
      .orderBy("quantile")
  }

  /** HyperLogLog++ cardinality audit (Spark's `approx_count_distinct`):
    * per group, the exact distinct count plus a check that the HLL
    * estimate lands within 3·rsd relative error (≈ 3σ of the estimator;
    * HLL++ is deterministic for fixed data, so the boolean is stable).
    * The exact side shuffles (group, key) once — the audit's cost, paid
    * only when auditing; production reads drop the exact column and
    * keep the one-pass sketch.
    */
  def distinctAudit(df: DataFrame, groupCol: String, keyCol: String,
                    rsd: Double = 0.05): DataFrame =
    df.groupBy(groupCol).agg(
        approx_count_distinct(col(keyCol), rsd).as("approx"),
        countDistinct(col(keyCol)).as("exact"))
      .select(col(groupCol), col("exact"),
        (abs(col("approx") - col("exact")).cast(DoubleType) <=
          lit(3.0 * rsd) * col("exact").cast(DoubleType)).as("within_bound"))
      .orderBy(groupCol)
}

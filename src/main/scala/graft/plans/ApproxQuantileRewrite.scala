package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.expressions.aggregate.{ApproximatePercentile, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Catalyst optimizer rule: rewrite exact `percentile` aggregates to
  * `approx_percentile` sketches when the session opts in via
  * `spark.graft.approxQuantiles=true`.
  *
  * Why a Rule (SURVEY.md §4 said "none required" — this is the one
  * genuine exception found in practice): every threshold in the engine
  * is a quantile (p90/p95 anomaly cutoffs, IQR fences, clip bounds),
  * and at 100 TB the exact sort-based `percentile` is the dominant cost
  * of several scoring flows (q07/q39 profiles). Callers shouldn't have
  * to edit every operator to trade exactness for scale — flipping one
  * conf turns the whole plan's quantiles into single-pass mergeable GK
  * sketches (error ≤ 1/accuracy), and the DuckDB-oracle path simply
  * leaves the flag off. The rewrite is conservative: only frequency-1,
  * non-reverse percentiles are touched.
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.plans.GraftExtensions` at session
  *    build (cluster deployment);
  *  - [[GraftOptimizations.enable]] post-hoc on a live session
  *    (injects via `experimental.extraOptimizations`).
  */
case class ApproxQuantileRewrite(spark: SparkSession) extends Rule[LogicalPlan] {

  val Flag = "spark.graft.approxQuantiles"
  val AccuracyFlag = "spark.graft.approxQuantiles.accuracy"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val on = spark.conf.getOption(Flag).exists(_.toBoolean)
    if (!on) plan
    else {
      val accuracy = spark.conf.getOption(AccuracyFlag).map(_.toInt)
        .getOrElse(ApproximatePercentile.DEFAULT_PERCENTILE_ACCURACY.toInt)
      plan transformAllExpressions {
        // Percentile always evaluates to DOUBLE (array<double> for a
        // list of percentages); ApproximatePercentile returns the
        // child's type. Only a DOUBLE child is type-preserving — a
        // rewrite on e.g. an int child would change the analyzed
        // schema post-analysis (and nearest-rank would truncate 2.5
        // to 2). A Cast wrapper is not an option: the node sits inside
        // an AggregateExpression, which requires an AggregateFunction.
        case p: Percentile
            if p.frequencyExpression == Literal(1L) && !p.reverse &&
              p.child.dataType == org.apache.spark.sql.types.DoubleType =>
          new ApproximatePercentile(p.child, p.percentageExpression,
            Literal(accuracy))
      }
    }
  }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectOptimizerRule(ApproxQuantileRewrite)
}

object GraftOptimizations {
  /** Post-hoc injection on a live session (idempotent). */
  def enable(spark: SparkSession): Unit = {
    val rule = ApproxQuantileRewrite(spark)
    val existing = spark.experimental.extraOptimizations
    if (!existing.exists(_.isInstanceOf[ApproxQuantileRewrite]))
      spark.experimental.extraOptimizations = existing :+ rule
  }
}

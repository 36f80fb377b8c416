package graft.features

import graft.core.Stats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Mean / median imputation — parity with spark.ml `Imputer` as fitted by
  * the reference (mean: `lib/utils.py:209-213`; median with
  * relativeError 0.001: `app/IsolationForest_AE.py:115-121`).
  *
  * Fit = ONE aggregate job over all columns (the fill values), apply =
  * `coalesce(col, lit(fill))` — codegen'd, no shuffle, no UDF. Fill
  * values are tiny driver state, broadcast implicitly as literals; this
  * scales to any data size because the fit is a mergeable aggregate.
  */
object Imputers {
  sealed trait Strategy
  case object Mean extends Strategy
  /** Exact median via distributed order-statistic selection
    * (`graft.core.OrderStats`) — oracle-parity AND scale-safe: no
    * per-partition value buffer, unlike Catalyst `percentile`.
    */
  case object MedianExact extends Strategy
  /** Approximate median (GK sketch) — the 100 TB path; matches the
    * reference's relativeError=0.001 Imputer.
    */
  case object MedianApprox extends Strategy

  /** Compute fill values for `cols` in one pass. NaNs are excluded like
    * nulls (spark.ml Imputer semantics).
    */
  def fit(df: DataFrame, cols: Seq[String], strategy: Strategy): Map[String, Double] = strategy match {
    case MedianExact =>
      // distributed selection: bounded memory, no Percentile buffer
      graft.core.OrderStats.quantiles(df, cols, Seq(0.5)).map { case (c, qs) => c -> qs.head }
    case _ =>
      val aggs = cols.map { name =>
        val d = col(name).cast(DoubleType)
        val clean = when(!isnan(d), d) // null stays null, NaN → null
        (strategy match {
          case Mean => Stats.dmean(clean)
          case _ => percentile_approx(clean, lit(0.5), lit(1000))
        }).as(name)
      }
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      cols.zipWithIndex.map { case (c, i) => c -> row.getDouble(i) }.toMap
  }

  def transform(df: DataFrame, fills: Map[String, Double]): DataFrame =
    fills.foldLeft(df) { case (acc, (c, v)) =>
      val d = col(c).cast(DoubleType)
      acc.withColumn(c, coalesce(when(!isnan(d), d), lit(v)))
    }

  def impute(df: DataFrame, cols: Seq[String], strategy: Strategy): DataFrame =
    transform(df, fit(df, cols, strategy))
}

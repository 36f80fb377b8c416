package graft.features

import graft.core.OrderStats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Median/IQR scaling — spark.ml `RobustScaler` (withCentering=true,
  * withScaling=true, default quantile range [0.25, 0.75]) semantics:
  * (x − median) / (Q3 − Q1). The outlier-insensitive twin of
  * [[Standardizer]]: the reference winsorizes and thresholds on
  * quantiles for exactly this robustness reason
  * (`app/LSTM_AE_enhanced.py:57-69`, `app/LSTM_AE.py:513-517`).
  *
  * Fit runs ONE fused distributed order-statistic selection for all
  * columns × {Q1, median, Q3} ([[OrderStats]] — mergeable aggregates,
  * bounded memory everywhere, no single-reducer `percentile`);
  * transform is codegen'd column arithmetic with the fitted values as
  * plan literals — embarrassingly parallel, no shuffle. IQR=0 columns
  * map to 0 (the MLlib convention for degenerate scale).
  */
object RobustScaler {
  final case class Model(stats: Map[String, (Double, Double)]) {
    def transform(df: DataFrame, suffix: String = ""): DataFrame =
      stats.foldLeft(df) { case (acc, (c, (med, iqr))) =>
        val z =
          if (iqr == 0.0 || iqr.isNaN) lit(0.0)
          else (col(c).cast(DoubleType) - lit(med)) / lit(iqr)
        acc.withColumn(c + suffix, z)
      }
  }

  def fit(df: DataFrame, cols: Seq[String]): Model = {
    val qs = OrderStats.quantiles(df, cols, Seq(0.25, 0.5, 0.75))
    Model(cols.map { c =>
      val Seq(q1, med, q3) = qs(c)
      c -> (med, q3 - q1)
    }.toMap)
  }

  def scale(df: DataFrame, cols: Seq[String]): DataFrame =
    fit(df, cols).transform(df)
}

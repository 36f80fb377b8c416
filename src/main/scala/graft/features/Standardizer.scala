package graft.features

import graft.core.Stats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Z-score standardization — parity with spark.ml `StandardScaler`
  * (withMean=true, withStd=true) as fitted by the reference
  * (`lib/utils.py:233-238`, `app/IsolationForest_AE.py:132-135`).
  *
  * Fit is one aggregate job (exact decimal μ and sample σ per column,
  * see [[graft.core.Stats]]); transform is pure column arithmetic
  * `(x−μ)/σ` — whole-stage-codegen'd, no UDF, no shuffle. μ/σ live as
  * literals in the plan, so the transform is embarrassingly parallel at
  * any scale. σ=0 columns map to 0 (MLlib convention) rather than NaN.
  */
object Standardizer {
  final case class Model(stats: Map[String, (Double, Double)]) {
    def transform(df: DataFrame, suffix: String = ""): DataFrame =
      stats.foldLeft(df) { case (acc, (c, (mu, sigma))) =>
        val z =
          if (sigma == 0.0 || sigma.isNaN) lit(0.0)
          else (col(c).cast(DoubleType) - lit(mu)) / lit(sigma)
        acc.withColumn(c + suffix, z)
      }
  }

  def fit(df: DataFrame, cols: Seq[String]): Model = {
    val aggs = cols.flatMap { name =>
      val d = col(name).cast(DoubleType)
      Seq(Stats.dmean(d).as(s"${name}__mu"),
          Stats.dstddevSamp(d).as(s"${name}__sigma"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    Model(cols.zipWithIndex.map { case (c, i) =>
      c -> (row.getDouble(2 * i), row.getDouble(2 * i + 1))
    }.toMap)
  }

  def standardize(df: DataFrame, cols: Seq[String]): DataFrame =
    fit(df, cols).transform(df)
}

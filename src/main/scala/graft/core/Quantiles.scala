package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Quantile / threshold operators.
  *
  * The reference derives every anomaly threshold from a quantile:
  * p95 (`app/AE_model.py:197`), p90 (`app/IsolationForest_AE.py:322`),
  * IQR fence Q3+1.5·IQR (`app/LSTM_AE.py:513-517`), p1/p99 winsorizing
  * clip (`app/LSTM_AE_enhanced.py:57-69`).
  *
  * Two paths:
  *  - `exact*` uses SQL `percentile` (sort-based, linear interpolation —
  *    matches numpy/DuckDB `quantile_cont`). Cost: full sort of the
  *    column per distinct agg — fine for correctness checks.
  *  - `approx*` uses `percentile_approx` (Greenwald–Khanna sketch,
  *    mergeable, single pass, no sort) — the 100 TB path. relativeError
  *    1e-4 keeps thresholds within noise of exact at a fraction of cost.
  */
object Quantiles {

  def exact(c: Column, ps: Seq[Double]): Column =
    percentile(c, array(ps.map(lit): _*))

  def exactQuantiles(df: DataFrame, colName: String, ps: Seq[Double]): Seq[Double] = {
    val row = df.agg(exact(col(colName), ps)).head()
    row.getSeq[Double](0)
  }

  def approx(c: Column, ps: Seq[Double], accuracy: Int = 10000): Column =
    percentile_approx(c, array(ps.map(lit): _*), lit(accuracy))

  /** Q3 + 1.5·IQR upper fence (`app/LSTM_AE.py:513-517`). */
  def iqrUpperFence(df: DataFrame, colName: String): Double = {
    val Seq(q1, q3) = exactQuantiles(df, colName, Seq(0.25, 0.75))
    q3 + 1.5 * (q3 - q1)
  }

  /** Winsorize: clip to [pLo, pHi] quantiles (`app/LSTM_AE_enhanced.py:57-69`).
    * Quantiles are computed in one agg job; the clip itself is a
    * codegen'd `least/greatest` — no UDF.
    */
  def clipToQuantiles(df: DataFrame, cols: Seq[String],
                      pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    val bounds = df.agg(
      exact(col(cols.head), Seq(pLo, pHi)).as(cols.head),
      cols.tail.map(c => exact(col(c), Seq(pLo, pHi)).as(c)): _*).head()
    cols.zipWithIndex.foldLeft(df) { case (acc, (c, i)) =>
      val b = bounds.getSeq[Double](i)
      acc.withColumn(c, least(greatest(col(c).cast("double"), lit(b.head)), lit(b.last)))
    }
  }
}

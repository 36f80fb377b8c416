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
  * Three paths:
  *  - `exactQuantiles` — exact linear-interpolated quantiles
  *    (numpy/DuckDB `quantile_cont` semantics) via
  *    [[OrderStats distributed order-statistic selection]]: bounded
  *    memory on every node, mergeable aggregates only — the default and
  *    the 100 TB path for exact thresholds.
  *  - `exact` — Catalyst `percentile` as a Column, for embedding in a
  *    combined single-pass agg. Buffers all values per partition and
  *    merges on one reducer: correctness baseline / small-frame use
  *    only, never on a full fact table.
  *  - `approx` — `percentile_approx` (Greenwald–Khanna sketch,
  *    mergeable, single pass) — when a rank-error tolerance is
  *    acceptable and a single combined pass matters more than exactness.
  */
object Quantiles {

  /** Catalyst exact percentile as a Column — single-reducer merge; keep
    * off large frames (use [[exactQuantiles]] there).
    */
  def exact(c: Column, ps: Seq[Double]): Column =
    percentile(c, array(ps.map(lit): _*))

  /** Exact interpolated quantiles with bounded memory at any scale. */
  def exactQuantiles(df: DataFrame, colName: String, ps: Seq[Double]): Seq[Double] =
    OrderStats.quantilesOf(df, colName, ps)

  def approx(c: Column, ps: Seq[Double], accuracy: Int = 10000): Column =
    percentile_approx(c, array(ps.map(lit): _*), lit(accuracy))

  /** Q3 + 1.5·IQR upper fence (`app/LSTM_AE.py:513-517`). */
  def iqrUpperFence(df: DataFrame, colName: String): Double = {
    val Seq(q1, q3) = exactQuantiles(df, colName, Seq(0.25, 0.75))
    q3 + 1.5 * (q3 - q1)
  }

  /** Winsorize: clip to [pLo, pHi] quantiles (`app/LSTM_AE_enhanced.py:57-69`).
    * Bounds come from the distributed selection (one shared stats pass
    * for all columns, then per-column pruning passes); the clip itself
    * is a codegen'd `least/greatest` — no UDF, no shuffle.
    */
  def clipToQuantiles(df: DataFrame, cols: Seq[String],
                      pLo: Double = 0.01, pHi: Double = 0.99): DataFrame = {
    val bounds = OrderStats.quantiles(df, cols, Seq(pLo, pHi))
    cols.foldLeft(df) { case (acc, c) =>
      val Seq(lo, hi) = bounds(c)
      acc.withColumn(c, least(greatest(col(c).cast("double"), lit(lo)), lit(hi)))
    }
  }
}

package graft.features

import graft.core.OrderStats
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Feature discretization (binning) — the spark.ml `QuantileDiscretizer`
  * / `Bucketizer` capability, re-fit on this engine's exact distributed
  * machinery. The reference quantile-buckets continuous scores for its
  * binned evaluation curves (`lib/utils.py:117-151` feeds thresholds the
  * same way); as a *feature transform*, binning is the standard
  * categorical-ization step before frequency encoding or per-bin stats.
  *
  * Two fit strategies:
  *  - equal-frequency: interior edges are the exact k-quantiles
  *    ([[OrderStats]] — one fused distributed order-statistic selection
  *    per fit, mergeable aggregates only, no single-reducer
  *    `Percentile` buffer anywhere);
  *  - equal-width: edges at min + i·(max−min)/k from ONE min/max
  *    aggregate pass.
  *
  * Duplicate edges (heavy ties in the data) collapse, so adjacent empty
  * bins merge — the q90 calibration convention, which keeps bin LABELS
  * stable across engines. Transform is a codegen'd comparison-sum
  * (`bin = Σ_e [x > e]`, the PSI binIndex shape): zero shuffle, plan
  * literals, values equal to an edge fall in the bin below.
  */
object Discretizer {

  final case class Model(edges: Map[String, Seq[Double]]) {
    /** Bin index for a value column: number of edges strictly below it.
      * Null/NaN-safe: null maps to null, NaN (> every edge) to the top
      * bin.
      */
    def binExpr(c: Column, colName: String): Column =
      edges(colName).foldLeft(lit(0)) { (acc, e) =>
        acc + when(c.cast(DoubleType) > lit(e), 1).otherwise(0)
      }

    def transform(df: DataFrame, suffix: String = "_bin"): DataFrame =
      edges.keys.toSeq.sorted.foldLeft(df) { (acc, c) =>
        acc.withColumn(c + suffix, binExpr(col(c), c))
      }
  }

  /** Equal-frequency fit: interior edges at quantiles i/k, i ∈ 1..k−1,
    * computed exactly for ALL columns in one fused selection.
    */
  def fitEqualFreq(df: DataFrame, cols: Seq[String], k: Int): Model = {
    require(k >= 2, s"fitEqualFreq needs k >= 2 bins: $k")
    val ps = (1 until k).map(_.toDouble / k)
    val qs = OrderStats.quantiles(df, cols, ps)
    Model(cols.map(c => c -> qs(c).distinct).toMap)
  }

  /** Equal-width fit: edges at min + i·(max−min)/k from one aggregate
    * pass over all columns. Degenerate (min = max) columns get no edges
    * — every value lands in bin 0.
    */
  def fitEqualWidth(df: DataFrame, cols: Seq[String], k: Int): Model = {
    require(k >= 2, s"fitEqualWidth needs k >= 2 bins: $k")
    val aggs = cols.flatMap(c => Seq(
      min(col(c).cast(DoubleType)).as(s"mn_$c"),
      max(col(c).cast(DoubleType)).as(s"mx_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    Model(cols.map { c =>
      val mn = row.getAs[Double](s"mn_$c")
      val mx = row.getAs[Double](s"mx_$c")
      val es =
        if (!(mx > mn)) Seq.empty[Double]
        // left-assoc (mx-mn)/k*i — the same IEEE op sequence the SQL
        // oracle's (mx - mn) / k * i computes, so edges match bitwise
        else (1 until k).map(i => mn + (mx - mn) / k * i).distinct
      c -> es
    }.toMap)
  }
}

package graft.score

import graft.core.Stats
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Mahalanobis-distance multivariate anomaly scoring — the classical
  * covariance-aware baseline the reconstruction-error family
  * ([[ZScoreAnomaly]], the AE scorers) is usually benchmarked against:
  * d²(x) = (x − μ)ᵀ Σ⁻¹ (x − μ), flagged against a χ²_k quantile.
  *
  * Fit is ONE exact-decimal aggregate over complete-case rows (means,
  * variances, covariances — 2k + k(k−1)/2 mergeable moments, map-side
  * combined); the k×k inverse is driver-side (k is feature-count-
  * sized, never data-sized) and enters the scoring expression as plain
  * literals, so the transform is codegen'd column arithmetic with no
  * join, broadcast, or UDF — the same shape at any data scale.
  *
  * k = 2 inverts by the adjugate closed form — and the scoring
  * polynomial is built in a FIXED operand order — so an external
  * oracle recomputing the same exact-sum moments reproduces scores
  * bitwise. k > 2 inverts by Gauss–Jordan with partial pivoting
  * (deterministic, driver-side).
  *
  * Reference context: the reference scores anomalies per-feature
  * (z-score / reconstruction error, `app/LSTM_AE.py:547-580`);
  * Mahalanobis adds the cross-feature covariance those scores ignore.
  */
object Mahalanobis {

  final case class Model(cols: Seq[String], means: Array[Double],
                         inv: Array[Array[Double]]) {
    /** d² as a column expression over `cols`, quadratic form in fixed
      * i-major order: Σ_i Σ_j inv(i)(j)·dx_i·dx_j with the j-sum
      * folded left then the i-sum folded left.
      */
    def score: Column = {
      val dx = cols.zip(means).map { case (c, m) =>
        col(c).cast(DoubleType) - lit(m)
      }
      val terms = for { i <- cols.indices; j <- cols.indices }
        yield lit(inv(i)(j)) * dx(i) * dx(j)
      terms.reduceLeft(_ + _)
    }
  }

  /** Complete-case filter for the fit columns. */
  def completeCase(df: DataFrame, cols: Seq[String]): DataFrame =
    df.where(cols.map { c =>
      val d = col(c).cast(DoubleType); d.isNotNull && !isnan(d)
    }.reduce(_ && _))

  def fit(df: DataFrame, cols: Seq[String]): Model = {
    require(cols.length >= 2, s"mahalanobis needs >= 2 columns: $cols")
    val k = cols.length
    val cc = completeCase(df, cols)
    val meanAggs = cols.map(c => Stats.dmean(col(c)).as(s"m_$c"))
    val varAggs = cols.map(c => Stats.dvarSamp(col(c)).as(s"v_$c"))
    val covAggs = for { i <- 0 until k; j <- (i + 1) until k }
      yield Stats.dcovSamp(col(cols(i)), col(cols(j))).as(s"c_${i}_$j")
    val row = cc.agg((meanAggs ++ varAggs ++ covAggs).head,
      (meanAggs ++ varAggs ++ covAggs).tail: _*).head()
    val means = Array.tabulate(k)(i => row.getDouble(i))
    val cov = Array.ofDim[Double](k, k)
    for (i <- 0 until k) cov(i)(i) = row.getDouble(k + i)
    var c = 2 * k
    for { i <- 0 until k; j <- (i + 1) until k } {
      cov(i)(j) = row.getDouble(c); cov(j)(i) = row.getDouble(c); c += 1
    }
    Model(cols, means, invert(cov))
  }

  private[graft] def invert(m: Array[Array[Double]]): Array[Array[Double]] = {
    val k = m.length
    if (k == 2) {
      // adjugate closed form, fixed operand order (oracle-replayable)
      val det = m(0)(0) * m(1)(1) - m(0)(1) * m(0)(1)
      require(det != 0.0, "singular covariance matrix")
      Array(Array(m(1)(1) / det, -m(0)(1) / det),
        Array(-m(0)(1) / det, m(0)(0) / det))
    } else {
      // Gauss–Jordan with partial pivoting on [m | I]
      val a = Array.tabulate(k, 2 * k) { (i, j) =>
        if (j < k) m(i)(j) else if (j - k == i) 1.0 else 0.0
      }
      for (p <- 0 until k) {
        val piv = (p until k).maxBy(i => math.abs(a(i)(p)))
        require(a(piv)(p) != 0.0, "singular covariance matrix")
        val t = a(p); a(p) = a(piv); a(piv) = t
        val pv = a(p)(p)
        for (j <- 0 until 2 * k) a(p)(j) /= pv
        for (i <- 0 until k if i != p) {
          val f = a(i)(p)
          if (f != 0.0) for (j <- 0 until 2 * k) a(i)(j) -= f * a(p)(j)
        }
      }
      Array.tabulate(k, k)((i, j) => a(i)(j + k))
    }
  }
}

package graft.score

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Linear autoencoder (PCA) anomaly scorer — the engine's native stand-in
  * for the reference's Dense Autoencoder flow (`app/AE_model.py`: fit on
  * normal rows, score = reconstruction error, threshold at a quantile).
  *
  * A dense AE with linear activations and MSE loss learns the PCA
  * subspace, so the principled Spark-native counterpart is: fit top-k
  * principal components on the driver over a deterministic sample
  * (the reference also fits on collected data), broadcast the (k×d)
  * basis, and score reconstruction error distributed in one map stage.
  * Nonlinear LSTM/VAE variants stay driver-fit in the reference too and
  * are out of engine scope (SURVEY.md §7); the *capability* — sequence
  * scoring with a pluggable scorer — is covered by graft.seq + this.
  *
  * Eigenvectors come from power iteration with deflation: plain
  * deterministic arithmetic (fixed iterations, hash-seeded start vector),
  * no native BLAS dependency, fine for d ≤ a few hundred.
  *
  * Reconstruction error for an orthonormal basis W:
  *   err(x) = ‖x−μ‖² − ‖Wᵀ(x−μ)‖²   (exact, no d×d matmul per row).
  */
object LinearAE {

  final class Model(val mean: Array[Double], val components: Array[Array[Double]])
      extends ArrayScorer {
    private val d = mean.length

    def score(x: Array[Double]): Double = reconstructionError(x)

    def reconstructionError(x: Array[Double]): Double = {
      val cvec = new Array[Double](d)
      var i = 0
      var total = 0.0
      while (i < d) {
        cvec(i) = x(i) - mean(i)
        total += cvec(i) * cvec(i)
        i += 1
      }
      var k = 0
      var proj = 0.0
      while (k < components.length) {
        val w = components(k)
        var dotv = 0.0
        var j = 0
        while (j < d) { dotv += w(j) * cvec(j); j += 1 }
        proj += dotv * dotv
        k += 1
      }
      math.max(total - proj, 0.0)
    }

    /** Distributed scoring: broadcast the basis, one map stage reading
      * straight out of ArrayData — no boxing ([[ArrayScoreExpr]]).
      */
    def transform(df: DataFrame, featuresCol: String,
                  outCol: String = "recon_error"): DataFrame =
      ArrayScoreExpr.withScore(df, this, featuresCol, outCol)
  }

  /** Deterministic pseudo-random unit start vector for power iteration. */
  private def startVector(d: Int, k: Int): Array[Double] = {
    val v = Array.tabulate(d) { j =>
      (((2654435761L * (k * d + j + 1) + 40503L) % 1000000007L).toDouble /
        1000000007.0) - 0.5
    }
    normalize(v)
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    if (n == 0) v else v.map(_ / n)
  }

  /** Top-k eigenvectors of the sample covariance via power iteration with
    * deflation (fixed 200 iterations each).
    */
  private def topEigen(cov: Array[Array[Double]], k: Int): Array[Array[Double]] = {
    val d = cov.length
    val comps = Array.ofDim[Array[Double]](k)
    val work = cov.map(_.clone())
    for (c <- 0 until k) {
      var v = startVector(d, c)
      var it = 0
      while (it < 200) {
        val nv = new Array[Double](d)
        var i = 0
        while (i < d) {
          var s = 0.0
          var j = 0
          while (j < d) { s += work(i)(j) * v(j); j += 1 }
          nv(i) = s
          i += 1
        }
        // Gram-Schmidt against accepted components: keeps the basis
        // exactly orthonormal even when eigenvalues are near-degenerate
        // (deflation alone converges slowly on flat spectra)
        var p = 0
        while (p < c) {
          val w = comps(p)
          var dp = 0.0
          var j = 0
          while (j < d) { dp += w(j) * nv(j); j += 1 }
          j = 0
          while (j < d) { nv(j) -= dp * w(j); j += 1 }
          p += 1
        }
        v = normalize(nv)
        it += 1
      }
      comps(c) = v
      // deflate: work -= λ v vᵀ
      val lv = new Array[Double](d)
      var i = 0
      while (i < d) {
        var s = 0.0
        var j = 0
        while (j < d) { s += work(i)(j) * v(j); j += 1 }
        lv(i) = s
        i += 1
      }
      val lambda = (0 until d).map(j => lv(j) * v(j)).sum
      i = 0
      while (i < d) {
        var j = 0
        while (j < d) { work(i)(j) -= lambda * v(i) * v(j); j += 1 }
        i += 1
      }
    }
    comps
  }

  /** Fit on the first `sampleSize` rows by `idCol` (deterministic). */
  def fit(df: DataFrame, idCol: String, featuresCol: String, k: Int,
          sampleSize: Int = 4096): Model = {
    val pool = FitPool.collect(df, idCol, featuresCol, sampleSize)
    require(pool.nonEmpty, "empty fit pool")
    val d = pool(0).length
    val n = pool.length
    val mean = new Array[Double](d)
    pool.foreach { row => var j = 0; while (j < d) { mean(j) += row(j); j += 1 } }
    var j = 0
    while (j < d) { mean(j) /= n; j += 1 }
    val cov = Array.ofDim[Double](d, d)
    pool.foreach { row =>
      var a = 0
      while (a < d) {
        val ca = row(a) - mean(a)
        var b = 0
        while (b < d) { cov(a)(b) += ca * (row(b) - mean(b)); b += 1 }
        a += 1
      }
    }
    var a = 0
    while (a < d) {
      var b = 0
      while (b < d) { cov(a)(b) /= n; b += 1 }
      a += 1
    }
    new Model(mean, topEigen(cov, math.min(k, d)))
  }
}

package graft.score

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native nonlinear MLP autoencoder — Dense-AE parity with the
  * reference's Keras models (`app/AE_model.py:114-191`: Dense layers,
  * MSE loss, trained on driver-collected standardized features). Same
  * engine contract as [[IsolationForest]]/[[LinearAE]]: FIT on the
  * driver over a small deterministic pool (the reference also trains on
  * collected data — distributed training is not part of its capability
  * surface), then SCORE distributed: weights are a few KB, broadcast
  * once, applied as one map stage. No `collect()` of the scored table.
  *
  * Architecture: z = (x−μ)/σ → h = tanh(W₁z + b₁) → ẑ = W₂h + b₂;
  * score(x) = MSE(z, ẑ) over features — reconstruction error in
  * standardized space, exactly the reference's anomaly score shape
  * (`lib/utils.py:39-63` with unit variances after standardization).
  *
  * Determinism: hash-seeded Xavier init (no RNG object state), LCG
  * batch shuffling, sequential Adam updates in fixed order — pure JVM
  * double arithmetic, so same data + params ⇒ bitwise-same weights on
  * any machine. Tests assert ranking/threshold properties, plus exact
  * reproducibility across fits.
  */
object MlpAE {

  final class Model(
      val mean: Array[Double], val std: Array[Double],
      val w1: Array[Array[Double]], val b1: Array[Double], // hidden × d
      val w2: Array[Array[Double]], val b2: Array[Double]) // d × hidden
      extends ArrayScorer {

    private val d = mean.length
    private val h = b1.length

    /** MSE(z, ẑ) in standardized space. */
    def score(x: Array[Double]): Double = {
      val z = new Array[Double](d)
      var j = 0
      while (j < d) { z(j) = (x(j) - mean(j)) / std(j); j += 1 }
      val hid = new Array[Double](h)
      var i = 0
      while (i < h) {
        var s = b1(i)
        var k = 0
        while (k < d) { s += w1(i)(k) * z(k); k += 1 }
        hid(i) = math.tanh(s)
        i += 1
      }
      var err = 0.0
      j = 0
      while (j < d) {
        var s = b2(j)
        var k = 0
        while (k < h) { s += w2(j)(k) * hid(k); k += 1 }
        val e = s - z(j)
        err += e * e
        j += 1
      }
      err / d
    }

    /** Distributed scoring: broadcast weights, one map stage, no boxing. */
    def transform(df: DataFrame, featuresCol: String,
                  outCol: String = "recon_error"): DataFrame =
      ArrayScoreExpr.withScore(df, this, featuresCol, outCol)
  }

  /** Deterministic pseudo-random uniform in [−½, ½) (same hash family
    * as [[LinearAE]] / `graft.sim.Ann` — no RNG object state). The
    * double-mod guard keeps the remainder non-negative when the Long
    * product wraps (large seeds) — Scala `%` is a signed remainder.
    */
  private def hashUnit(tag: Long, idx: Long): Double = {
    val P = 1000000007L
    val h = (2654435761L * (tag * 1000003L + idx) + 40503L) % P
    (((h + P) % P).toDouble / P.toDouble) - 0.5
  }

  /** Fit on the first `sampleSize` rows by `idCol` (deterministic pool,
    * like the reference's bounded training collect). Adam, mini-batches
    * in LCG-shuffled order, fixed epochs.
    */
  def fit(df: DataFrame, idCol: String, featuresCol: String,
          hidden: Int, epochs: Int = 200, batchSize: Int = 64,
          lr: Double = 0.01, sampleSize: Int = 4096, seed: Long = 42L): Model = {
    val pool = FitPool.collect(df, idCol, featuresCol, sampleSize)
    require(pool.nonEmpty, "empty fit pool")
    val d = pool(0).length
    val n = pool.length
    val hDim = math.min(hidden, d)

    // standardization params over the pool (population σ; σ=0 → 1)
    val mean = new Array[Double](d)
    pool.foreach { r => var j = 0; while (j < d) { mean(j) += r(j); j += 1 } }
    var j = 0
    while (j < d) { mean(j) /= n; j += 1 }
    val std = new Array[Double](d)
    pool.foreach { r =>
      var k = 0
      while (k < d) { val c = r(k) - mean(k); std(k) += c * c; k += 1 }
    }
    j = 0
    while (j < d) {
      std(j) = math.sqrt(std(j) / n)
      if (std(j) == 0.0 || std(j).isNaN) std(j) = 1.0
      j += 1
    }
    val z = pool.map { r =>
      val zr = new Array[Double](d)
      var k = 0
      while (k < d) { zr(k) = (r(k) - mean(k)) / std(k); k += 1 }
      zr
    }

    // Xavier-uniform init from the hash family
    val lim1 = math.sqrt(6.0 / (d + hDim))
    val w1 = Array.tabulate(hDim, d)((i, k) => 2.0 * lim1 * hashUnit(seed * 2 + 1, i.toLong * d + k))
    val b1 = new Array[Double](hDim)
    val lim2 = math.sqrt(6.0 / (d + hDim))
    val w2 = Array.tabulate(d, hDim)((i, k) => 2.0 * lim2 * hashUnit(seed * 2 + 2, i.toLong * hDim + k))
    val b2 = new Array[Double](d)

    // Adam state
    val (beta1, beta2, eps) = (0.9, 0.999, 1e-8)
    val mw1 = Array.ofDim[Double](hDim, d); val vw1 = Array.ofDim[Double](hDim, d)
    val mb1 = new Array[Double](hDim); val vb1 = new Array[Double](hDim)
    val mw2 = Array.ofDim[Double](d, hDim); val vw2 = Array.ofDim[Double](d, hDim)
    val mb2 = new Array[Double](d); val vb2 = new Array[Double](d)
    var step = 0

    val order = Array.tabulate(n)(identity)
    var lcg = seed
    def nextLcg(bound: Int): Int = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      (((lcg >>> 33) % bound) + bound).toInt % bound
    }

    val gw1 = Array.ofDim[Double](hDim, d); val gb1 = new Array[Double](hDim)
    val gw2 = Array.ofDim[Double](d, hDim); val gb2 = new Array[Double](d)
    val hid = new Array[Double](hDim); val pre = new Array[Double](hDim)
    val out = new Array[Double](d); val dOut = new Array[Double](d)
    val dHid = new Array[Double](hDim)

    var epoch = 0
    while (epoch < epochs) {
      // Fisher–Yates with the LCG — deterministic batch order
      var i = n - 1
      while (i > 0) {
        val r = nextLcg(i + 1)
        val t = order(i); order(i) = order(r); order(r) = t
        i -= 1
      }
      var start = 0
      while (start < n) {
        val end = math.min(start + batchSize, n)
        val bs = end - start
        // zero grads
        var a = 0
        while (a < hDim) { java.util.Arrays.fill(gw1(a), 0.0); a += 1 }
        java.util.Arrays.fill(gb1, 0.0)
        a = 0
        while (a < d) { java.util.Arrays.fill(gw2(a), 0.0); a += 1 }
        java.util.Arrays.fill(gb2, 0.0)

        var bi = start
        while (bi < end) {
          val x = z(order(bi))
          // forward
          var ii = 0
          while (ii < hDim) {
            var s = b1(ii)
            var k = 0
            while (k < d) { s += w1(ii)(k) * x(k); k += 1 }
            pre(ii) = s
            hid(ii) = math.tanh(s)
            ii += 1
          }
          var jj = 0
          while (jj < d) {
            var s = b2(jj)
            var k = 0
            while (k < hDim) { s += w2(jj)(k) * hid(k); k += 1 }
            out(jj) = s
            dOut(jj) = 2.0 * (s - x(jj)) / d // d MSE / d out
            jj += 1
          }
          // backward
          var kk = 0
          while (kk < hDim) {
            var s = 0.0
            var jx = 0
            while (jx < d) { s += w2(jx)(kk) * dOut(jx); jx += 1 }
            dHid(kk) = s * (1.0 - hid(kk) * hid(kk))
            kk += 1
          }
          jj = 0
          while (jj < d) {
            val g = dOut(jj)
            var k = 0
            while (k < hDim) { gw2(jj)(k) += g * hid(k); k += 1 }
            gb2(jj) += g
            jj += 1
          }
          kk = 0
          while (kk < hDim) {
            val g = dHid(kk)
            var k = 0
            while (k < d) { gw1(kk)(k) += g * x(k); k += 1 }
            gb1(kk) += g
            kk += 1
          }
          bi += 1
        }

        // Adam update (grads averaged over the batch)
        step += 1
        val bc1 = 1.0 - math.pow(beta1, step)
        val bc2 = 1.0 - math.pow(beta2, step)
        def upd(w: Array[Double], g: Array[Double], m: Array[Double], v: Array[Double]): Unit = {
          var k = 0
          while (k < w.length) {
            val gk = g(k) / bs
            m(k) = beta1 * m(k) + (1 - beta1) * gk
            v(k) = beta2 * v(k) + (1 - beta2) * gk * gk
            w(k) -= lr * (m(k) / bc1) / (math.sqrt(v(k) / bc2) + eps)
            k += 1
          }
        }
        a = 0
        while (a < hDim) { upd(w1(a), gw1(a), mw1(a), vw1(a)); a += 1 }
        upd(b1, gb1, mb1, vb1)
        a = 0
        while (a < d) { upd(w2(a), gw2(a), mw2(a), vw2(a)); a += 1 }
        upd(b2, gb2, mb2, vb2)
        start = end
      }
      epoch += 1
    }
    new Model(mean, std, w1, b1, w2, b2)
  }
}

package graft.score

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Native nonlinear MLP autoencoder — Dense-AE parity with the
  * reference's Keras models (`app/AE_model.py:114-191`: a deep Dense
  * relu stack, e.g. 512→256→128→48→128→256→512 with a linear output,
  * MSE loss, trained on driver-collected standardized features). Same
  * engine contract as [[IsolationForest]]/[[LinearAE]]: FIT on the
  * driver over a small deterministic pool (the reference also trains on
  * collected data — distributed training is not part of its capability
  * surface), then SCORE distributed: weights are a few KB–MB, broadcast
  * once, applied as one map stage. No `collect()` of the scored table.
  *
  * Architecture: z = (x−μ)/σ → a₁ = act(W₁z + b₁) → … →
  * ẑ = W_L a_{L−1} + b_L (linear output); score(x) = MSE(z, ẑ) —
  * reconstruction error in standardized space, exactly the reference's
  * anomaly score shape (`lib/utils.py:39-63` with unit variances after
  * standardization). `act` is tanh or relu ([[Act]]); the reference's
  * GaussianNoise/L2/BatchNorm are training-time regularizers for much
  * larger nets and are intentionally not replicated (documented
  * capability-shape scope: nonlinear depth + relu IS the scored
  * surface; the regularizers change fitted weights, not the operator).
  *
  * Determinism: hash-seeded Xavier init (no RNG object state), LCG
  * batch shuffling, sequential Adam updates in fixed order — pure JVM
  * double arithmetic, so same data + params ⇒ bitwise-same weights on
  * any machine. Tests assert ranking/threshold properties, plus exact
  * reproducibility across fits. The single-hidden-layer [[fit]] is the
  * `fitStack(Seq(h))` special case (identical init tags and update
  * order, so pre-existing fits reproduce bitwise).
  */
object MlpAE {

  /** Hidden-layer activation. Output layer is always linear. */
  sealed abstract class Act(val name: String) extends Serializable {
    def f(x: Double): Double
    /** Derivative expressed in terms of the PRE-activation input. */
    def df(pre: Double, post: Double): Double
  }
  case object Tanh extends Act("tanh") {
    def f(x: Double): Double = math.tanh(x)
    def df(pre: Double, post: Double): Double = 1.0 - post * post
  }
  case object Relu extends Act("relu") {
    def f(x: Double): Double = if (x > 0) x else 0.0
    def df(pre: Double, post: Double): Double = if (pre > 0) 1.0 else 0.0
  }
  def actByName(s: String): Act = s match {
    case "tanh" => Tanh
    case "relu" => Relu
    case other => sys.error(s"unknown activation: $other")
  }

  /** A fitted stack. `weights(l)` is (dims(l+1) × dims(l)) with
    * `biases(l)` its dims(l+1) bias; dims(0) = dims(L) = #features.
    * Hidden layers apply `act`; the final layer is linear.
    */
  final class Model(
      val mean: Array[Double], val std: Array[Double],
      val weights: Array[Array[Array[Double]]],
      val biases: Array[Array[Double]],
      val act: Act) extends ArrayScorer {

    private val d = mean.length
    private val nLayers = weights.length
    require(nLayers >= 1 && biases.length == nLayers,
      s"malformed stack: ${weights.length} weight / ${biases.length} bias layers")
    require(biases(nLayers - 1).length == d,
      s"output layer must be $d-wide, got ${biases(nLayers - 1).length}")

    /** MSE(z, ẑ) in standardized space. */
    def score(x: Array[Double]): Double = {
      var a = new Array[Double](d)
      var j = 0
      while (j < d) { a(j) = (x(j) - mean(j)) / std(j); j += 1 }
      val z = a
      var l = 0
      while (l < nLayers) {
        val w = weights(l); val b = biases(l)
        val out = new Array[Double](b.length)
        val in = a
        var i = 0
        while (i < b.length) {
          var s = b(i)
          val row = w(i)
          var k = 0
          while (k < in.length) { s += row(k) * in(k); k += 1 }
          out(i) = if (l < nLayers - 1) act.f(s) else s
          i += 1
        }
        a = out
        l += 1
      }
      var err = 0.0
      j = 0
      while (j < d) { val e = a(j) - z(j); err += e * e; j += 1 }
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

  /** Single-hidden-layer fit — the historical surface; same init tags
    * and update order as `fitStack(Seq(h))`, so results reproduce
    * bitwise. `hidden` is clamped to the feature dim (the original
    * bottleneck contract of this overload).
    */
  def fit(df: DataFrame, idCol: String, featuresCol: String,
          hidden: Int, epochs: Int = 200, batchSize: Int = 64,
          lr: Double = 0.01, sampleSize: Int = 4096, seed: Long = 42L): Model = {
    val pool = FitPool.collect(df, idCol, featuresCol, sampleSize)
    require(pool.nonEmpty, "empty fit pool")
    fitCore(pool, Seq(math.min(hidden, pool(0).length)), Tanh,
      epochs, batchSize, lr, seed)
  }

  /** Fit a configurable encoder–decoder stack on the first `sampleSize`
    * rows by `idCol` (deterministic pool, like the reference's bounded
    * training collect). `hidden` lists the hidden-layer widths in
    * order — e.g. `Seq(512, 256, 128, 48, 128, 256, 512)` is the
    * reference's enhanced Dense AE (`app/AE_model.py:114-191`); the
    * d-wide linear output layer is appended automatically. Widths may
    * exceed the feature dim (the reference's stack is overcomplete).
    * Adam, mini-batches in LCG-shuffled order, fixed epochs.
    */
  def fitStack(df: DataFrame, idCol: String, featuresCol: String,
               hidden: Seq[Int], activation: String = "tanh",
               epochs: Int = 200, batchSize: Int = 64,
               lr: Double = 0.01, sampleSize: Int = 4096,
               seed: Long = 42L): Model = {
    val pool = FitPool.collect(df, idCol, featuresCol, sampleSize)
    require(pool.nonEmpty, "empty fit pool")
    fitCore(pool, hidden, actByName(activation), epochs, batchSize, lr, seed)
  }

  private def fitCore(pool: Array[Array[Double]], hidden: Seq[Int], act: Act,
                      epochs: Int, batchSize: Int, lr: Double,
                      seed: Long): Model = {
    require(hidden.nonEmpty && hidden.forall(_ >= 1),
      s"MlpAE needs at least one positive hidden width: $hidden")
    val d = pool(0).length
    val n = pool.length

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

    // layer dims: d → hidden… → d; Xavier-uniform init from the hash
    // family, one tag per layer (tags seed*2+1, seed*2+2 for a single
    // hidden layer — byte-identical to the historical two-layer init)
    val dims = (d +: hidden :+ d).toArray
    val nLayers = dims.length - 1
    val weights = Array.tabulate(nLayers) { l =>
      val (in, out) = (dims(l), dims(l + 1))
      val lim = math.sqrt(6.0 / (in + out))
      Array.tabulate(out, in)((i, k) =>
        2.0 * lim * hashUnit(seed * 2 + l + 1, i.toLong * in + k))
    }
    val biases = Array.tabulate(nLayers)(l => new Array[Double](dims(l + 1)))

    // Adam state + gradient accumulators, one block per layer
    val (beta1, beta2, eps) = (0.9, 0.999, 1e-8)
    val mw = Array.tabulate(nLayers)(l => Array.ofDim[Double](dims(l + 1), dims(l)))
    val vw = Array.tabulate(nLayers)(l => Array.ofDim[Double](dims(l + 1), dims(l)))
    val mb = Array.tabulate(nLayers)(l => new Array[Double](dims(l + 1)))
    val vb = Array.tabulate(nLayers)(l => new Array[Double](dims(l + 1)))
    val gw = Array.tabulate(nLayers)(l => Array.ofDim[Double](dims(l + 1), dims(l)))
    val gb = Array.tabulate(nLayers)(l => new Array[Double](dims(l + 1)))
    var step = 0

    val order = Array.tabulate(n)(identity)
    var lcg = seed
    def nextLcg(bound: Int): Int = {
      lcg = lcg * 6364136223846793005L + 1442695040888963407L
      (((lcg >>> 33) % bound) + bound).toInt % bound
    }

    // per-sample forward/backward buffers: acts(0) is the input z-row;
    // acts(l+1) / pres(l) are layer l's post/pre-activation
    val pres = Array.tabulate(nLayers)(l => new Array[Double](dims(l + 1)))
    val acts = new Array[Array[Double]](nLayers + 1)
    var li = 1
    while (li <= nLayers) { acts(li) = new Array[Double](dims(li)); li += 1 }
    val deltas = Array.tabulate(nLayers)(l => new Array[Double](dims(l + 1)))

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
        var l = 0
        while (l < nLayers) {
          var a = 0
          while (a < gw(l).length) { java.util.Arrays.fill(gw(l)(a), 0.0); a += 1 }
          java.util.Arrays.fill(gb(l), 0.0)
          l += 1
        }

        var bi = start
        while (bi < end) {
          val x = z(order(bi))
          acts(0) = x
          // forward
          l = 0
          while (l < nLayers) {
            val in = acts(l); val w = weights(l); val b = biases(l)
            val pre = pres(l); val out = acts(l + 1)
            var ii = 0
            while (ii < b.length) {
              var s = b(ii)
              val row = w(ii)
              var k = 0
              while (k < in.length) { s += row(k) * in(k); k += 1 }
              pre(ii) = s
              out(ii) = if (l < nLayers - 1) act.f(s) else s
              ii += 1
            }
            l += 1
          }
          // output delta: d MSE / d out
          val dOut = deltas(nLayers - 1)
          var jj = 0
          while (jj < d) { dOut(jj) = 2.0 * (acts(nLayers)(jj) - x(jj)) / d; jj += 1 }
          // backward through hidden layers
          l = nLayers - 1
          while (l > 0) {
            val dl = deltas(l); val w = weights(l); val dPrev = deltas(l - 1)
            var kk = 0
            while (kk < dPrev.length) {
              var s = 0.0
              var jx = 0
              while (jx < dl.length) { s += w(jx)(kk) * dl(jx); jx += 1 }
              dPrev(kk) = s * act.df(pres(l - 1)(kk), acts(l)(kk))
              kk += 1
            }
            l -= 1
          }
          // accumulate gradients
          l = 0
          while (l < nLayers) {
            val dl = deltas(l); val in = acts(l)
            val gwl = gw(l); val gbl = gb(l)
            var ii = 0
            while (ii < dl.length) {
              val g = dl(ii)
              val row = gwl(ii)
              var k = 0
              while (k < in.length) { row(k) += g * in(k); k += 1 }
              gbl(ii) += g
              ii += 1
            }
            l += 1
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
        l = 0
        while (l < nLayers) {
          var a = 0
          while (a < weights(l).length) { upd(weights(l)(a), gw(l)(a), mw(l)(a), vw(l)(a)); a += 1 }
          upd(biases(l), gb(l), mb(l), vb(l))
          l += 1
        }
        start = end
      }
      epoch += 1
    }
    new Model(mean, std, weights, biases, act)
  }
}

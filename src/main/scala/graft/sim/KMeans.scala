package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic k-means for IVF coarse quantization.
  *
  * Fit runs on a driver pool (first `poolSize` rows by id — same
  * deterministic-pool contract as the anomaly models): hash-seeded
  * initial centers, fixed `iters` Lloyd iterations, ties to the lower
  * center index. The fitted centers are a k×d array — broadcast-sized
  * state; cluster assignment is a distributed map stage via the
  * codegen'd dot kernel (argmin over k distances).
  *
  * At 100 TB one would fit on a sample exactly like this (k-means
  * quality saturates quickly with sample size) and assign in one pass —
  * the same fit-small/score-everywhere shape as the model scorers.
  */
object KMeans {

  final class Model(val centers: Array[Array[Double]]) extends Serializable {
    def k: Int = centers.length

    def assign(x: Array[Double]): Int = {
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < centers.length) {
        val ctr = centers(c)
        var d = 0.0
        var j = 0
        while (j < ctr.length) {
          val diff = x(j) - ctr(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      best
    }

    /** Distributed assignment: broadcast centers, one map stage. */
    def transform(df: DataFrame, featuresCol: String,
                  outCol: String = "cluster"): DataFrame = {
      val bc = df.sparkSession.sparkContext.broadcast(this)
      val u = udf { xs: Seq[Double] => bc.value.assign(xs.toArray) }
      df.withColumn(outCol, u(col(featuresCol)))
    }
  }

  /** Hash-derived deterministic initial center: pool row at a
    * pseudo-random index per center.
    */
  def fit(df: DataFrame, idCol: String, featuresCol: String, k: Int,
          iters: Int = 10, poolSize: Int = 4096): Model = {
    val pool = df.select(col(idCol), col(featuresCol))
      .orderBy(col(idCol)).limit(poolSize)
      .collect()
      .map(_.getSeq[Double](1).toArray)
    fitPool(pool, k, iters)
  }

  /** Lloyd on an already-collected driver pool (shared by the IVF fit
    * above and [[Pq]]'s per-sub-space codebook fits).
    */
  def fitPool(pool: Array[Array[Double]], k: Int, iters: Int): Model = {
    require(pool.length >= k, s"pool ${pool.length} smaller than k=$k")
    val d = pool(0).length
    var centers = Array.tabulate(k) { c =>
      pool(((2654435761L * (c + 1) + 40503L) % 1000000007L % pool.length).toInt)
        .clone()
    }
    val m = new Model(centers)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k, d)(0.0)
      val counts = new Array[Long](k)
      val model = new Model(centers)
      pool.foreach { x =>
        val c = model.assign(x)
        counts(c) += 1
        var j = 0
        while (j < d) { sums(c)(j) += x(j); j += 1 }
      }
      centers = Array.tabulate(k) { c =>
        if (counts(c) == 0) centers(c) // empty cluster keeps its center
        else {
          val ctr = new Array[Double](d)
          var j = 0
          while (j < d) { ctr(j) = sums(c)(j) / counts(c); j += 1 }
          ctr
        }
      }
      it += 1
    }
    new Model(centers)
  }
}

package graft.aug

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Deterministic Poisson bootstrap — percentile confidence intervals
  * for an aggregate WITHOUT resampling shuffles.
  *
  * The classical bootstrap resamples n rows with replacement R times —
  * at 100 TB that is R full shuffles. The Poisson bootstrap replaces
  * each replicate's multinomial row counts with independent
  * Poisson(1) weights (their total is n only in expectation — the
  * standard, asymptotically equivalent approximation): each row just
  * needs a deterministic weight per replicate, and every replicate
  * mean is a weighted aggregate in the SAME single pass — one
  * broadcast-replicate scan, one map-side-combined groupBy over R
  * groups. No shuffle of data rows at all.
  *
  * Weights are hash-derived, not RNG: replicate r draws its uniform
  * from [[Sampling.keyBucket]] of (key·64 + r) — integer arithmetic
  * identical in any engine, reproducible across retries/partitionings
  * — and maps it through the exact integer thresholds of the
  * Poisson(1) inverse CDF (shared literals, no floating-point
  * boundary). Requires R ≤ 64 and |key| < 2⁵⁵ so key·64 + r is
  * injective and the hash product stays in 64-bit range.
  *
  * The percentile CI then reads order statistics of the R replicate
  * means — an R-row frame, metadata-sized.
  */
object Bootstrap {

  /** Exact integer thresholds of the Poisson(1) CDF on the hash's
    * [0, M) bucket scale: weight k ⇔ bucket ∈ [T(k−1), T(k)). Both
    * the Column and SQL twins share these literals.
    */
  private[aug] val thresholds: Seq[Long] = {
    val M = 1000000L
    val einv = math.exp(-1.0)
    var term = einv; var cum = einv
    val b = Seq.newBuilder[Long]
    b += math.floor(cum * M).toLong
    for (k <- 1 to 9) {
      term = term / k
      cum += term
      b += math.floor(cum * M).toLong
    }
    b.result()  // bucket ≥ T(9) (prob < 1e-6) → weight 10
  }

  private def poissonWeight(bucket: Column): Column =
    thresholds.zipWithIndex.foldRight(lit(thresholds.length): Column) {
      case ((t, k), rest) => when(bucket < t, k).otherwise(rest)
    }

  /** One row: (estimate, ci_lo, ci_hi, n_replicates). `estimate` is
    * the plain full-data mean; the CI bounds are the ⌈α·R⌉-th and
    * ⌈(1−α)·R⌉-th order statistics of the replicate means.
    */
  def meanCi(df: DataFrame, keyCol: String, valueCol: String,
             replicates: Int, alpha: Double, seed: Long): DataFrame = {
    require(replicates >= 2 && replicates <= 64,
      s"replicates must be in [2, 64]: $replicates")
    val spark = df.sparkSession
    val x = col(valueCol).cast(DoubleType)
    // repartition BEFORE the replicate expansion: the broadcast
    // crossJoin preserves the input's partitioning, so a one-row-group
    // scan would put all n·replicates weighted rows on a single core
    // (r16 honest bench: 3.5 s isolated at sf0.1×40 reps)
    val base = df.where(x.isNotNull && !isnan(x))
      .select(col(keyCol).cast("long").as("__k"), x.as("__x"))
      .repartition(spark.sparkContext.defaultParallelism)
    val reps = spark.range(replicates).select(col("id").as("__r"))
    val bucket = Sampling.keyBucket(col("__k") * 64 + col("__r"), seed)
    val means = base.crossJoin(broadcast(reps))
      .select(col("__r"), col("__x"), poissonWeight(bucket).as("__w"))
      .groupBy("__r")
      .agg((graft.core.Stats.dsum(col("__w") * col("__x")) /
        sum(col("__w")).cast(DoubleType)).as("__mean"))
    val loRank = math.ceil(alpha * replicates).toLong.max(1L)
    val hiRank = math.ceil((1.0 - alpha) * replicates).toLong
    val w = Window.orderBy(col("__mean").asc, col("__r").asc)
    val ranked = means.withColumn("__rk", row_number().over(w))
    val bounds = ranked.agg(
      min(when(col("__rk") === loRank, col("__mean"))).as("ci_lo"),
      min(when(col("__rk") === hiRank, col("__mean"))).as("ci_hi"))
    val est = base.agg(graft.core.Stats.dmean(col("__x")).as("estimate"),
      count(lit(1)).as("n"))
    est.crossJoin(bounds)
      .select(col("estimate"), col("ci_lo"), col("ci_hi"), col("n"),
        lit(replicates).cast("long").as("n_replicates"))
  }

  /** DuckDB twins sharing [[thresholds]]' integer literals. */
  object Sql {
    def poissonWeight(bucketSql: String): String = {
      val whens = thresholds.zipWithIndex
        .map { case (t, k) => s"WHEN $bucketSql < $t THEN $k" }
        .mkString(" ")
      s"(CASE $whens ELSE ${thresholds.length} END)"
    }
  }
}

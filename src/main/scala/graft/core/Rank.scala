package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distributed fractional (average-tie) ranking and Spearman rank
  * correlation.
  *
  * The naive rank is a window over a GLOBAL order — a single-partition
  * bottleneck that dies at scale. Here ranks are derived per DISTINCT
  * value instead: aggregate tie counts per value (map-side combined),
  * run the two-phase [[PrefixScan]] over the value order for the
  * cumulative count below each value, and compute the classic
  * average-tie rank
  *
  *   rank(v) = (#rows < v) + (ties(v) + 1) / 2
  *
  * The rank map then joins back to the rows on the value — a plain
  * shuffled equi-join, parallel in the number of distinct values, with
  * no global window anywhere. Spearman's ρ is Pearson on these ranks
  * via the exact decimal moments of [[Stats]] (bitwise deterministic
  * across partitionings).
  *
  * Rows where the value is null/NaN are EXCLUDED from ranking (the
  * pandas `rank(method="average")` / `scipy.stats.spearmanr`
  * `nan_policy="omit"` convention); Spearman uses pairwise-complete
  * rows, ranked within the pair's complete subset.
  *
  * Capability parity: the reference computes feature association for
  * drift/selection via numpy/pandas correlation (`app/lib/utils.py`
  * stats helpers); Spearman is its rank-robust twin for monotone but
  * non-linear dependence.
  */
object Rank {

  /** (row frame with `rankCol` appended, n valid rows). One rank per
    * input row; null/NaN values get a null rank.
    */
  def avgRank(df: DataFrame, valueCol: String, rankCol: String,
              cacheKey: String): DataFrame = {
    val v = col(valueCol).cast(DoubleType)
    val valid = df.where(v.isNotNull && !isnan(v))
    val ties = valid.groupBy(v.as("__rk_value"))
      .agg(count(lit(1)).as("__rk_ties"))
    val (scanned, _) = PrefixScan.exclusive(
      ties, "__rk_value", Seq("__rk_ties"), cacheKey)
    val ranks = scanned.select(col("__rk_value"),
      (col("cum___rk_ties_below").cast(DoubleType) +
        (col("__rk_ties").cast(DoubleType) + lit(1.0)) / lit(2.0))
        .as(rankCol))
    df.join(ranks, v <=> col("__rk_value"), "left").drop("__rk_value")
  }

  /** Spearman rank correlation of each unordered column pair, long
    * form (col_x, col_y, rho). Each pair is ranked within its own
    * pairwise-complete subset (both values valid), then Pearson via
    * exact decimal moments. One rank scan per (pair, side); the tie
    * tables are tiny relative to the data and every step is
    * shuffle-parallel.
    */
  def spearmanMatrix(df: DataFrame, cols: Seq[String],
                     cacheKey: String): DataFrame = {
    require(cols.length >= 2, s"spearmanMatrix needs >= 2 columns: $cols")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.length }
      yield (cols(i), cols(j))
    val frames = pairs.map { case (a, b) =>
      val x = col(a).cast(DoubleType); val y = col(b).cast(DoubleType)
      val complete = df
        .where(x.isNotNull && !isnan(x) && y.isNotNull && !isnan(y))
        .select(x.as(a), y.as(b))
      // one shared cache key: all tie-table scans live in ONE Caches
      // working set (the 4-key LRU would evict per-pair keys mid-action)
      val rx = avgRank(complete, a, "__rx", cacheKey)
      val both = avgRank(rx, b, "__ry", cacheKey)
      val n = Stats.nValid(col("__rx")).cast(DoubleType)
      val num = n * Stats.dsum(col("__rx") * col("__ry")) -
        Stats.dsum(col("__rx")) * Stats.dsum(col("__ry"))
      val vx = n * Stats.dsum(col("__rx") * col("__rx")) -
        Stats.dsum(col("__rx")) * Stats.dsum(col("__rx"))
      val vy = n * Stats.dsum(col("__ry") * col("__ry")) -
        Stats.dsum(col("__ry")) * Stats.dsum(col("__ry"))
      both.agg(
        when(vx > 0.0 && vy > 0.0, num / (sqrt(vx) * sqrt(vy))).as("rho"))
        .select(lit(a).as("col_x"), lit(b).as("col_y"), col("rho"))
    }
    frames.reduce(_ union _)
  }
}

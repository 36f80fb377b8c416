package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Deterministic aggregate helpers.
  *
  * Double summation in a distributed engine is partition-order-dependent:
  * the same query can produce last-bit-different sums run to run. All
  * additive aggregates here accumulate in DECIMAL(38,10) — exact and
  * associative, so results are bitwise reproducible regardless of
  * partitioning — and only cast to DOUBLE at the end. This is what makes
  * the DuckDB-oracle hash compare stable, and it is equally valid on a
  * 1000-executor cluster (decimal sum is a single extra wide column in the
  * partial-aggregate buffer; map-side combine still applies).
  *
  * Variance/stddev use the sum-of-squares identity over exact decimal sums
  * rather than Welford streaming (Spark's stddev_samp), trading a little
  * numerical stability (irrelevant at exact precision) for cross-engine
  * bitwise determinism.
  */
object Stats {
  private val D = DecimalType(38, 10)

  /** Exact decimal sum, cast back to double. */
  def dsum(c: Column): Column = sum(c.cast(D)).cast(DoubleType)

  /** Count of non-null, non-NaN values — the same validity predicate as
    * `Profiler.isValid`, and consistent with [[dsum]] (where a NaN casts
    * to a null decimal and silently drops out of the sum): a NaN
    * contributes to neither the numerator nor the denominator of
    * [[dmean]].
    */
  def nValid(c: Column): Column =
    count(when(c.isNotNull && !isnan(c.cast(DoubleType)), 1))

  /** Exact mean: decimal sum / valid count, division in double. */
  def dmean(c: Column): Column = dsum(c) / nValid(c)

  /** Sample variance via exact sums: (Σx² − (Σx)²/n) / (n−1).
    * x squared in double (IEEE, deterministic) to avoid integer overflow.
    */
  def dvarSamp(c: Column): Column = {
    val d = c.cast(DoubleType)
    val n = nValid(c).cast(DoubleType)
    (dsum(d * d) - dsum(d) * dsum(d) / n) / (n - lit(1.0))
  }

  /** Population variance via exact sums: (Σx² − (Σx)²/n) / n. */
  def dvarPop(c: Column): Column = {
    val d = c.cast(DoubleType)
    val n = nValid(c).cast(DoubleType)
    (dsum(d * d) - dsum(d) * dsum(d) / n) / n
  }

  def dstddevSamp(c: Column): Column = sqrt(dvarSamp(c))

  /** Sample covariance via exact sums: (Σxy − Σx·Σy/n) / (n−1), over
    * rows where BOTH sides are valid (pair with a caller-side filter
    * for complete-case semantics across more columns).
    */
  def dcovSamp(a: Column, b: Column): Column = {
    val x = a.cast(DoubleType); val y = b.cast(DoubleType)
    val n = count(when(x.isNotNull && !isnan(x) && y.isNotNull && !isnan(y), 1))
      .cast(DoubleType)
    (dsum(x * y) - dsum(x) * dsum(y) / n) / (n - lit(1.0))
  }

  /** Pairwise Pearson correlation matrix over `cols` in ONE aggregate
    * pass (long form: col_x, col_y, corr for each unordered pair).
    *
    * Pairwise-complete semantics: each pair's moments count only rows
    * where BOTH values are valid (non-null, non-NaN) — numpy
    * `np.corrcoef` on clean data, pandas `DataFrame.corr`'s
    * pairwise-deletion on dirty data. All six moments per pair are
    * conditional decimal sums in the same mergeable aggregate, so the
    * full matrix costs one map-side-combined pass regardless of width
    * (k columns → 6·k·(k−1)/2 buffer slots, no extra scans, no
    * shuffle beyond the single-row agg merge).
    *
    * corr = (n·Σxy − Σx·Σy) / (√(n·Σxx − Σx²) · √(n·Σyy − Σy²)),
    * final arithmetic in double over exact decimal sums (deterministic
    * cross-engine), null when either variance term is zero (constant
    * column — matches the undefined-correlation convention, and dodges
    * ANSI division-by-zero).
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.length >= 2, s"corrMatrix needs at least 2 columns: $cols")
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.length }
      yield (cols(i), cols(j))
    val aggs = pairs.zipWithIndex.flatMap { case ((a, b), idx) =>
      val x = col(a).cast(DoubleType); val y = col(b).cast(DoubleType)
      val both = x.isNotNull && !isnan(x) && y.isNotNull && !isnan(y)
      def s(c: Column, name: String) =
        sum(when(both, c).cast(D)).cast(DoubleType).as(s"${name}_$idx")
      Seq(count(when(both, 1)).as(s"n_$idx"),
        s(x, "sx"), s(y, "sy"), s(x * x, "sxx"), s(y * y, "syy"), s(x * y, "sxy"))
    }
    val rows = pairs.zipWithIndex.map { case ((a, b), idx) =>
      val n = col(s"n_$idx").cast(DoubleType)
      val vx = n * col(s"sxx_$idx") - col(s"sx_$idx") * col(s"sx_$idx")
      val vy = n * col(s"syy_$idx") - col(s"sy_$idx") * col(s"sy_$idx")
      val num = n * col(s"sxy_$idx") - col(s"sx_$idx") * col(s"sy_$idx")
      struct(lit(a).as("col_x"), lit(b).as("col_y"),
        when(vx > 0.0 && vy > 0.0, num / (sqrt(vx) * sqrt(vy))).as("corr"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("p"))
      .select(col("p.col_x"), col("p.col_y"), col("p.corr"))
  }

  /** DuckDB SQL fragments computing the identical quantities, for oracle
    * parity. `x` is a SQL expression string.
    */
  object Sql {
    def dsum(x: String): String =
      s"CAST(sum(CAST(($x) AS DECIMAL(38,10))) AS DOUBLE)"
    /** [[dsum]] for sums whose magnitude can exceed ~9·10⁵ (scaled
      * int128 > 2⁵³): DuckDB's direct DECIMAL→DOUBLE cast rounds twice
      * (int128→double, then ÷10¹⁰) and can land 1 ulp off the
      * correctly-rounded value Spark produces (BigDecimal.doubleValue
      * rounds once). Routing through VARCHAR forces strtod — correctly
      * rounded — restoring bitwise parity. Harmless for small sums;
      * REQUIRED when the sum feeds nonlinear math (squares, differences
      * of near-equal bigs) that amplifies the ulp.
      */
    def dsumWide(x: String): String =
      s"CAST(CAST(sum(CAST(($x) AS DECIMAL(38,10))) AS VARCHAR) AS DOUBLE)"
    def nValid(x: String): String =
      s"count(CASE WHEN ($x) IS NOT NULL AND NOT isnan(CAST(($x) AS DOUBLE)) THEN 1 END)"
    def dmean(x: String): String = s"(${dsum(x)} / ${nValid(x)})"
    def dvarSamp(x: String): String = {
      val d = s"CAST(($x) AS DOUBLE)"
      s"((${dsum(s"$d*$d")} - ${dsum(d)} * ${dsum(d)} / CAST(${nValid(x)} AS DOUBLE)) / (CAST(${nValid(x)} AS DOUBLE) - 1.0))"
    }
    def dstddevSamp(x: String): String = s"sqrt(${dvarSamp(x)})"
    def dvarPop(x: String): String = {
      val d = s"CAST(($x) AS DOUBLE)"
      s"((${dsum(s"$d*$d")} - ${dsum(d)} * ${dsum(d)} / CAST(${nValid(x)} AS DOUBLE)) / CAST(${nValid(x)} AS DOUBLE))"
    }
    /** Twin of [[Stats.dcovSamp]]; `n` must be the complete-case count
      * expression the caller also uses for the variances.
      */
    def dcovSamp(x: String, y: String, n: String): String = {
      val dx = s"CAST(($x) AS DOUBLE)"; val dy = s"CAST(($y) AS DOUBLE)"
      s"((${dsum(s"$dx*$dy")} - ${dsum(dx)} * ${dsum(dy)} / CAST($n AS DOUBLE)) / (CAST($n AS DOUBLE) - 1.0))"
    }
  }
}

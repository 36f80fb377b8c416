package graft.seq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Trailing-window rolling features per key — the moving-average /
  * moving-dispersion / lag-delta family a time-series anomaly pipeline
  * derives before scoring (the reference builds its LSTM input windows
  * the same way driver-side, `app/LSTM_AE.py:116-140`; these are the
  * set-based equivalents that stay distributed).
  *
  * Scale shape: ONE shuffle on the key columns, then per-partition
  * sorted window evaluation — parallel across keys, skew bounded by a
  * single key's history, no global window anywhere.
  *
  * Determinism: windowed sums accumulate in DECIMAL(38,10). Engines
  * disagree on windowed-double association order (DuckDB evaluates
  * frames via segment trees, Spark streams them), so a double sum can
  * differ in the last ulp — decimal is exact and associative, making
  * every downstream derived stat bitwise reproducible cross-engine.
  * The variance-under-sqrt is clamped at zero on both sides: the
  * sum-of-squares identity can go hair-negative on constant windows
  * (identically in both engines, since the inputs are identical), and
  * DuckDB's sqrt raises on negatives where Spark's returns NaN.
  */
object Rolling {
  private val D = DecimalType(38, 10)

  /** Adds to `df`: `<prefix>{n,avg,std,min,max,lag,delta}` computed
    * over the trailing `k` rows (current row inclusive) per key, rows
    * ordered by `ordCol`. `ordCol` must be unique within a key for the
    * lag/delta columns to be deterministic (the frame aggregates are
    * order-stable under ties, lag is not). `std` is the sample stddev,
    * null while the window holds < 2 rows; `lag`/`delta` are null on
    * each key's first row.
    */
  def rolling(df: DataFrame, keys: Seq[String], ordCol: Column, valCol: Column,
              k: Int, prefix: String = "roll_"): DataFrame = {
    require(k >= 1, s"rolling window must hold at least 1 row: $k")
    val wf = Window.partitionBy(keys.map(col): _*).orderBy(ordCol)
      .rowsBetween(-(k - 1).toLong, Window.currentRow)
    val wl = Window.partitionBy(keys.map(col): _*).orderBy(ordCol)
    val v = valCol.cast(DoubleType)
    val n = count(v).over(wf)
    val sm = sum(v.cast(D)).over(wf).cast(DoubleType)
    val sq = sum((v * v).cast(D)).over(wf).cast(DoubleType)
    val nD = n.cast(DoubleType)
    df.withColumn(prefix + "n", n)
      .withColumn(prefix + "avg", sm / nD)
      .withColumn(prefix + "std",
        when(n > 1, sqrt(greatest((sq - sm * sm / nD) / (nD - lit(1.0)), lit(0.0)))))
      .withColumn(prefix + "min", min(v).over(wf))
      .withColumn(prefix + "max", max(v).over(wf))
      .withColumn(prefix + "lag", lag(v, 1).over(wl))
      .withColumn(prefix + "delta", v - lag(v, 1).over(wl))
  }

  /** Per-key exponentially-weighted moving average (final value): the
    * fold s ← s·(1−α) + v·α over each key's time-ordered values,
    * seeded with the first value — pandas `ewm(alpha).mean(adjust=
    * False)` semantics, the smoothing step of every drift/telemetry
    * monitor. EWMA is inherently sequential, so it is computed per key
    * as a HOF fold over the key's sort-collected value array: ONE
    * shuffle on the key, state bounded by a single key's history (the
    * [[Sessionizer]] trade), zero windows. The fold multiplies in a
    * fixed written order (`s·(1−α) + v·α`) and the array is sorted by
    * (ord, value) so ties cannot reorder the sum — the exact same
    * left-fold a SQL oracle's `list_reduce(list(v ORDER BY ord, v),
    * (s, v) -> s*(1-α) + v*α)` performs, making the double result
    * reproducible cross-engine. Returns (keys..., n, ewma).
    */
  def ewmaByKey(df: DataFrame, keys: Seq[String], ordCol: String,
                valCol: String, alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    val vals = array_sort(collect_list(
      struct(col(ordCol), col(valCol).cast(DoubleType).as("v"))))
    df.groupBy(keys.map(col): _*)
      .agg(vals.as("ts_vals"))
      .select(keys.map(col) ++ Seq(
        size(col("ts_vals")).cast("long").as("n"),
        aggregate(
          slice(col("ts_vals"), lit(2), size(col("ts_vals")) - lit(1)),
          element_at(col("ts_vals"), 1).getField("v"),
          (s, x) => s * lit(1.0 - alpha) + x.getField("v") * lit(alpha)
        ).as("ewma")): _*)
  }

  /** Per-key Holt linear (double) exponential smoothing — level + trend
    * state, the forecasting step after [[ewmaByKey]]'s single-state
    * smoothing: l ← α·v + (1−α)(l+b); b ← β(l−l_prev) + (1−β)b, seeded
    * l₀ = first value, b₀ = 0 (statsmodels Holt with
    * initialization_method='known'). Same distribution shape as
    * [[ewmaByKey]]: ONE shuffle on the key, a HOF left-fold over the
    * sort-collected series with a 2-element array accumulator —
    * mirrored by a SQL oracle's `list_reduce(list_transform(l, v ->
    * [v, 0.0]), (s, x) -> [l', b'])`. (1−α)/(1−β) are built as runtime
    * IEEE subtractions so the oracle can write `(1.0 - β)` verbatim —
    * a pre-folded Scala literal could differ from the SQL parse of the
    * shortest decimal by 1 ulp. Returns (keys..., n, level, trend,
    * forecast = level + trend).
    */
  def holtByKey(df: DataFrame, keys: Seq[String], ordCol: String,
                valCol: String, alpha: Double, beta: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1]: $beta")
    val vals = array_sort(collect_list(
      struct(col(ordCol), col(valCol).cast(DoubleType).as("v"))))
    val folded = aggregate(
      slice(col("ts_vals"), lit(2), size(col("ts_vals")) - lit(1)),
      array(element_at(col("ts_vals"), 1).getField("v"), lit(0.0)),
      (s, x) => {
        val l = element_at(s, 1); val b = element_at(s, 2)
        val lNew = lit(alpha) * x.getField("v") +
          (lit(1.0) - lit(alpha)) * (l + b)
        array(lNew, lit(beta) * (lNew - l) + (lit(1.0) - lit(beta)) * b)
      })
    df.groupBy(keys.map(col): _*)
      .agg(vals.as("ts_vals"))
      .select(keys.map(col) ++ Seq(
        size(col("ts_vals")).cast("long").as("n"), folded.as("st")): _*)
      .select(keys.map(col) ++ Seq(col("n"),
        element_at(col("st"), 1).as("level"),
        element_at(col("st"), 2).as("trend"),
        (element_at(col("st"), 1) + element_at(col("st"), 2)).as("forecast")): _*)
  }

  /** Holt–Winters additive triple exponential smoothing per key —
    * q167's Holt plus a seasonal component of length `period`,
    * distributed one-key-per-group over sort-collected series exactly
    * like [[holtByKey]] (order-fixed sequential fold, bitwise
    * cross-engine). Seasonal state uses the ROTATION trick: the
    * current step's season slot is always the HEAD of the seasonal
    * sub-array and the updated slot is appended at the tail, so the
    * fold needs no time index. Zero-init variant (level = first value,
    * trend = 0, seasonals = 0) — the convention is documented rather
    * than estimated, keeping the fold a pure function of the series.
    * One-step forecast = level + trend + next season slot (the head
    * after rotation).
    */
  def holtWintersByKey(df: DataFrame, keys: Seq[String], ordCol: String,
                       valCol: String, alpha: Double, beta: Double,
                       gamma: Double, period: Int): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1]: $beta")
    require(gamma >= 0.0 && gamma <= 1.0, s"gamma must be in [0,1]: $gamma")
    require(period >= 2, s"period must be >= 2: $period")
    val vals = array_sort(collect_list(
      struct(col(ordCol), col(valCol).cast(DoubleType).as("v"))))
    val zeros = transform(sequence(lit(1), lit(period)), _ => lit(0.0))
    val folded = aggregate(
      slice(col("ts_vals"), lit(2), size(col("ts_vals")) - lit(1)),
      concat(array(element_at(col("ts_vals"), 1).getField("v"), lit(0.0)),
        zeros),
      (s, x) => {
        val l = element_at(s, 1)
        val b = element_at(s, 2)
        val sh = element_at(s, 3)
        val v = x.getField("v")
        val lNew = lit(alpha) * (v - sh) + (lit(1.0) - lit(alpha)) * (l + b)
        val bNew = lit(beta) * (lNew - l) + (lit(1.0) - lit(beta)) * b
        val seasNew = lit(gamma) * (v - lNew) + (lit(1.0) - lit(gamma)) * sh
        concat(array(lNew, bNew), slice(s, 4, period - 1), array(seasNew))
      })
    df.groupBy(keys.map(col): _*)
      .agg(vals.as("ts_vals"))
      .select(keys.map(col) ++ Seq(
        size(col("ts_vals")).cast("long").as("n"), folded.as("st")): _*)
      .select(keys.map(col) ++ Seq(col("n"),
        element_at(col("st"), 1).as("level"),
        element_at(col("st"), 2).as("trend"),
        element_at(col("st"), 3).as("next_season"),
        (element_at(col("st"), 1) + element_at(col("st"), 2) +
          element_at(col("st"), 3)).as("forecast")): _*)
  }

  /** Expanding-window one-step-ahead forecast backtest for the Holt
    * smoother: at every step t ≥ 2 the PRIOR state's forecast (l+b) is
    * scored against the arriving value before the state updates —
    * walk-forward validation with no look-ahead, the way a forecast
    * model's accuracy must be measured. The same order-fixed
    * sequential fold as [[holtByKey]], with the absolute one-step
    * error and the naive (last-value) baseline error accumulated
    * INSIDE the fold state — summation order is the series order on
    * both engines, so the MAEs are bitwise cross-engine. Skill =
    * 1 − mae/mae_naive (positive ⇒ the smoother beats persistence).
    */
  def holtBacktestByKey(df: DataFrame, keys: Seq[String], ordCol: String,
                        valCol: String, alpha: Double,
                        beta: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1]: $alpha")
    require(beta >= 0.0 && beta <= 1.0, s"beta must be in [0,1]: $beta")
    val vals = array_sort(collect_list(
      struct(col(ordCol), col(valCol).cast(DoubleType).as("v"))))
    // state: [level, trend, sum_abs_err, sum_abs_naive, prev_value]
    val folded = aggregate(
      slice(col("ts_vals"), lit(2), size(col("ts_vals")) - lit(1)),
      array(element_at(col("ts_vals"), 1).getField("v"), lit(0.0),
        lit(0.0), lit(0.0), element_at(col("ts_vals"), 1).getField("v")),
      (s, x) => {
        val l = element_at(s, 1)
        val b = element_at(s, 2)
        val v = x.getField("v")
        val err = abs(v - (l + b))
        val naive = abs(v - element_at(s, 5))
        val lNew = lit(alpha) * v + (lit(1.0) - lit(alpha)) * (l + b)
        array(lNew, lit(beta) * (lNew - l) + (lit(1.0) - lit(beta)) * b,
          element_at(s, 3) + err, element_at(s, 4) + naive, v)
      })
    df.groupBy(keys.map(col): _*)
      .agg(vals.as("ts_vals"))
      .select(keys.map(col) ++ Seq(
        size(col("ts_vals")).cast("long").as("n"), folded.as("st")): _*)
      .select(keys.map(col) ++ Seq(col("n"),
        when(col("n") > 1, element_at(col("st"), 3) /
          (col("n") - lit(1)).cast(DoubleType)).as("mae"),
        when(col("n") > 1, element_at(col("st"), 4) /
          (col("n") - lit(1)).cast(DoubleType)).as("mae_naive"),
        when(col("n") > 1 && element_at(col("st"), 4) > 0.0,
          lit(1.0) - element_at(col("st"), 3) / element_at(col("st"), 4))
          .as("skill")): _*)
  }

  /** DuckDB SQL fragments computing identical rolling columns, for
    * oracle parity: `window` must be declared as
    * `WINDOW wf AS (PARTITION BY <keys> ORDER BY <ord> ROWS <k-1> PRECEDING),
    *         wl AS (PARTITION BY <keys> ORDER BY <ord>)`.
    */
  object Sql {
    def n(v: String): String = s"count(CAST(($v) AS DOUBLE)) OVER wf"
    def sum(v: String): String =
      s"CAST(sum(CAST(CAST(($v) AS DOUBLE) AS DECIMAL(38,10))) OVER wf AS DOUBLE)"
    def sumSq(v: String): String = {
      val d = s"CAST(($v) AS DOUBLE)"
      s"CAST(sum(CAST(($d * $d) AS DECIMAL(38,10))) OVER wf AS DOUBLE)"
    }
    def avg(v: String): String = s"(${sum(v)} / CAST(${n(v)} AS DOUBLE))"
    def std(v: String): String = {
      val nD = s"CAST(${n(v)} AS DOUBLE)"
      s"""CASE WHEN ${n(v)} > 1 THEN
         | sqrt(greatest((${sumSq(v)} - ${sum(v)} * ${sum(v)} / $nD) / ($nD - 1.0), 0.0))
         | END""".stripMargin.replaceAll("\n", " ")
    }
  }
}

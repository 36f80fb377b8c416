package graft.seq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Per-key CUSUM changepoint detection over ordered series.
  *
  * The tabular CUSUM recursions
  *
  *   s⁺_i = max(0, s⁺_{i−1} + (x_i − μ − k))
  *   s⁻_i = max(0, s⁻_{i−1} − (x_i − μ) − k)
  *
  * look inherently sequential, but both have a closed window form: with
  * p_i = Σ_{j≤i}(x_j − μ − k) a plain prefix sum,
  *
  *   s⁺_i = p_i − min_{j≤i} p_j   (running min of the prefix sum,
  *                                 0-prepended)
  *
  * and symmetrically for s⁻ with q_i = Σ(−(x_j − μ) − k). So the whole
  * detector is two prefix sums and two running mins — four per-key
  * ordered window aggregates, shuffle-partitioned BY KEY (parallel
  * across keys, no global window), all inside whole-stage codegen.
  * An alarm fires where s⁺ or s⁻ exceeds the decision interval h; μ is
  * the in-control mean (fit upstream or supplied), k the slack
  * (typically δ/2 for a shift of δ), h the threshold (typically 4–5 σ).
  *
  * Capability rationale: the reference's LSTM anomaly pipeline flags
  * individual reconstruction-error spikes (`app/LSTM_AE.py:547-580`);
  * CUSUM is the standard complement that catches small persistent
  * LEVEL SHIFTS those per-point scores miss. Same shape at 100 TB:
  * one shuffle on the key, windows within partitions.
  */
object Changepoint {

  /** Append `cusum_pos`, `cusum_neg`, `alarm` to each row. Ordering
    * within a key follows `orderCols` (callers must make it total —
    * include a unique tiebreaker for determinism).
    */
  def cusum(df: DataFrame, keyCols: Seq[String], orderCols: Seq[Column],
            valueCol: String, mu: Double, slack: Double,
            h: Double): DataFrame = {
    val keyW = Window.partitionBy(keyCols.map(col): _*)
    val cum = keyW.orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val x = col(valueCol).cast(DoubleType)
    // exact decimal prefix sums: windowed double addition is
    // association-order-dependent across engines
    val D = org.apache.spark.sql.types.DecimalType(38, 10)
    val p = sum((x - lit(mu) - lit(slack)).cast(D)).over(cum)
    val q = sum((lit(mu) - x - lit(slack)).cast(D)).over(cum)
    df.withColumn("__p", p.cast(DoubleType))
      .withColumn("__q", q.cast(DoubleType))
      .withColumn("cusum_pos",
        col("__p") - least(lit(0.0), min(col("__p")).over(cum)))
      .withColumn("cusum_neg",
        col("__q") - least(lit(0.0), min(col("__q")).over(cum)))
      .withColumn("alarm",
        (col("cusum_pos") > h || col("cusum_neg") > h).cast("int"))
      .drop("__p", "__q")
  }
}

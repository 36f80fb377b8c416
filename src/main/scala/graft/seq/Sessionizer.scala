package graft.seq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based event sessionization — the standard pipeline windowing op
  * the reference's row-order sliding windows (W1) don't cover: a new
  * session starts when the gap to the key's previous event exceeds
  * `gap` (same units as `tsCol`, e.g. nanoseconds for the harness's
  * nanos-as-long timestamps).
  *
  * Plan shape at scale: ONE window per key — `Window.partitionBy(keys)`
  * shuffles on the key and runs per-key ordered lag + conditional
  * running count in parallel across keys (nothing like the global
  * single-partition ROC window; skewed keys are bounded by per-user
  * event counts). Session ids are 0-based per key, deterministic given
  * a total order (pass tie-breakers for equal timestamps).
  */
object Sessionizer {

  /** Append `sessionCol`: 0-based session index per key. */
  def sessionize(df: DataFrame, keys: Seq[String], tsCol: Column,
                 tieBreak: Seq[Column], gap: Long,
                 sessionCol: String = "session_seq"): DataFrame = {
    val order = tsCol +: tieBreak
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(tsCol, 1).over(w)
    val isNew = when(prev.isNull || tsCol - prev > gap, 1).otherwise(0)
    df.withColumn(sessionCol, sum(isNew).over(cum) - 1)
  }

  /** Per-session summary: event count, start/end ts, decimal-exact
    * value sum (order-free — see `graft.core.Stats`).
    */
  def sessionStats(df: DataFrame, keys: Seq[String], tsCol: Column,
                   tieBreak: Seq[Column], gap: Long,
                   valueCol: Column): DataFrame = {
    val s = sessionize(df, keys, tsCol, tieBreak, gap)
    s.groupBy((keys.map(col) :+ col("session_seq")): _*)
      .agg(count(lit(1)).as("n_events"),
        min(tsCol).as("start_ts"), max(tsCol).as("end_ts"),
        graft.core.Stats.dsum(valueCol).as("sum_value"))
  }
}

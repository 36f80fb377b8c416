package graft.seq

import graft.core.Stats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-key ordinary-least-squares trend fit — the telemetry trend
  * extractor (is this disk's error rate drifting up?) that turns each
  * key's (time, value) history into slope / intercept / R², the
  * precursor signal the reference's anomaly models consume as features.
  *
  * Everything reduces to the five sufficient statistics
  * (Σx, Σy, Σx², Σxy, Σy²) per key — ONE map-side-combined aggregate
  * after a per-key x-centering window (same shuffle key, so the window
  * and the aggregate share one exchange). Products are computed in
  * doubles (identical IEEE ops on any engine) and summed in
  * DECIMAL(38,10) partials ([[Stats.dsum]]) — order-free, so the fit
  * is reproducible under any partitioning.
  *
  * x is centered per key on min(x) BEFORE squaring: epoch-micro
  * timestamps are ~1.7e15, where Σx² would cancel catastrophically in
  * the slope denominator; after centering, x spans only the key's
  * observation window. Degenerate keys (single point, constant x) get
  * null slope/intercept/r2 rather than a division blow-up; constant-y
  * keys get r2 = null (0/0 — undefined, not 1).
  */
object Trend {

  /** (keys..., n, slope, intercept, r2) per key; `xCol`/`yCol` must be
    * castable to double.
    */
  def linearFit(df: DataFrame, keys: Seq[String], xCol: String,
                yCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    val centered = df
      .withColumn("t_x", (col(xCol) - min(col(xCol)).over(w)).cast("double"))
      .withColumn("t_y", col(yCol).cast("double"))
    val g = centered.groupBy(keys.map(col): _*).agg(
      count(lit(1)).cast("double").as("n"),
      Stats.dsum(col("t_x")).as("sx"),
      Stats.dsum(col("t_y")).as("sy"),
      Stats.dsum(col("t_x") * col("t_x")).as("sxx"),
      Stats.dsum(col("t_x") * col("t_y")).as("sxy"),
      Stats.dsum(col("t_y") * col("t_y")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denx = col("n") * col("sxx") - col("sx") * col("sx")
    val deny = col("n") * col("syy") - col("sy") * col("sy")
    g.select(keys.map(col) ++ Seq(
      col("n").cast("long").as("n"),
      when(denx > 0, num / denx).as("slope"),
      when(denx > 0,
        (col("sy") - (num / denx) * col("sx")) / col("n")).as("intercept"),
      when(denx > 0 && deny > 0, (num * num) / (denx * deny)).as("r2")): _*)
  }

  /** DuckDB twin fragments — `n/sx/sy/sxx/sxy/syy` must be the
    * aggregate aliases produced by the same centering + dsum shapes.
    */
  object Sql {
    val num = "(n * sxy - sx * sy)"
    val denx = "(n * sxx - sx * sx)"
    val deny = "(n * syy - sy * sy)"
    def slope: String = s"(CASE WHEN $denx > 0 THEN $num / $denx END)"
    def intercept: String =
      s"(CASE WHEN $denx > 0 THEN (sy - ($num / $denx) * sx) / n END)"
    def r2: String =
      s"(CASE WHEN $denx > 0 AND $deny > 0 THEN ($num * $num) / ($denx * $deny) END)"
  }
}

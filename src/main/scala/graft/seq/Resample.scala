package graft.seq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Time-series resampling to a regular grid with forward fill — the
  * gap-repair step between raw telemetry and any fixed-step model
  * input (the reference's LSTM windows assume evenly spaced readings;
  * real SMART telemetry has gaps — `lib/utils.py` sequence building
  * presumes the gaps were already repaired upstream; this operator IS
  * that upstream).
  *
  * Per key: events bucket to `stepSeconds` intervals (last observation
  * per bucket, by max event time — caller must guarantee (key, ts)
  * uniqueness for determinism), the grid spans the key's own
  * [min_bucket, max_bucket], and empty buckets carry the last
  * observed value forward (`last(ignoreNulls)` over the per-key
  * bucket order).
  *
  * Scale: one (key, bucket) aggregate with map-side combine, one
  * per-key grid explode (array size = key's span / step — bounded by
  * the retention window, not the row count), one per-key window. No
  * global sort, no cross join.
  */
object Resample {

  /** (key, bucket, grid_ts, value, observed): value forward-filled,
    * `observed` false for carried points. Buckets are
    * floor(epoch / step); grid_ts the bucket start.
    */
  def resampleFfill(df: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, stepSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(stepSeconds > 0, s"resampleFfill needs a positive step: $stepSeconds")
    // a LongType ts is NANOSECONDS (the harness's nanosAsLong parquet
    // shape) and must bucket by exact integer division — nanos exceed
    // double's 2^53 exactness, so a float divide could flip buckets
    // for timestamps sitting exactly on a boundary
    val bucket = df.schema(tsCol).dataType match {
      // floor-division via pmod, not `div`: `div` truncates toward
      // zero, so a pre-1970 epoch (-1ns) would land in bucket 0 instead
      // of -1, diverging from the timestamp path's floor() and the
      // oracle; pmod is non-negative, so (ts - pmod) div step IS floor
      case LongType =>
        val step = stepSeconds * 1000000000L
        expr(s"($tsCol - pmod($tsCol, ${step}L)) div ${step}L")
      case _ => floor(unix_timestamp(col(tsCol)).cast(LongType) / stepSeconds)
        .cast(LongType)
    }
    val obs = df
      .select(col(keyCol).as("key"), bucket.as("bucket"),
        col(tsCol).as("ts"), col(valueCol).cast("double").as("v"))
      .groupBy("key", "bucket")
      .agg(max_by(col("v"), col("ts")).as("v"))
    val span = obs.groupBy("key")
      .agg(min("bucket").as("b0"), max("bucket").as("b1"))
    val grid = span.select(col("key"),
      explode(sequence(col("b0"), col("b1"))).as("bucket"))
    val w = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"),
        timestamp_seconds(col("bucket") * stepSeconds).as("grid_ts"),
        last("v", ignoreNulls = true).over(w).as("value"),
        col("v").isNotNull.as("observed"))
  }
}

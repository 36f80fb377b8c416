package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Skew-mitigation operators.
  *
  * A grouped aggregation over 100 TB with a hot key (one group holding a
  * large share of rows) bottlenecks on the single reducer owning that
  * key. AQE's skew handling covers joins; for aggregations the classic
  * fix is SALTING: widen the key with a deterministic salt, aggregate
  * partials on (key, salt) — spreading the hot key over `buckets`
  * reducers — then merge partials in a second, tiny aggregation.
  *
  * Correctness: only decomposable aggregates (sum/count/min/max) are
  * offered, and the additive path keeps DECIMAL(38,10) through BOTH
  * stages, so the two-stage result is bit-identical to the single-stage
  * [[Stats.dsum]] — verified by the q42 oracle, which is a plain
  * GROUP BY. The salt is derived from a data column (not rand()), so
  * results are reproducible under retries.
  */
object Skew {

  private val D = DecimalType(38, 10)

  /** Salted sum+count per key. `spread` should be a high-cardinality
    * column (or expression) roughly uniform within hot keys.
    */
  def saltedSumCount(df: DataFrame, keys: Seq[String], valueCol: String,
                     spread: Column, buckets: Int): DataFrame = {
    val salted = df.withColumn("__salt", pmod(spread.cast("long"), lit(buckets)))
    val partials = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        sum(col(valueCol).cast(D)).as("__psum"), // stays decimal: exact merge
        count(lit(1)).as("__pcnt"))
    partials
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("__psum")).cast(DoubleType).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("n"))
  }
}

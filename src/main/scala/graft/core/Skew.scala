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

  /** Salted inner equi-join — the replicate-and-salt fix for a SKEWED
    * join key when the small side is still too big to broadcast and
    * AQE's split threshold is not in play: the fact side widens its
    * key with a deterministic salt (spread column mod `buckets`), the
    * other side is replicated `buckets`× with an exploded salt, and
    * the join runs on (keys, salt) — a hot key's rows land on
    * `buckets` reducers instead of one. Row-identical to
    * `fact.join(other, keys)` (the q91 oracle is the plain join);
    * costs `buckets`× the small side's shuffle volume, the standard
    * trade. Deterministic (data-derived salt, not rand()) so retries
    * and the oracle reproduce it.
    */
  def saltedJoin(fact: DataFrame, other: DataFrame, keys: Seq[String],
                 spread: Column, buckets: Int): DataFrame = {
    require(buckets >= 1, s"saltedJoin needs at least 1 bucket: $buckets")
    // a null (or uncastable) spread value must still land in SOME
    // bucket — a null salt would fail the equi-join and silently drop
    // the fact row, breaking the row-identical-to-plain-join contract
    val sf = fact.withColumn("__salt",
      coalesce(pmod(spread.cast("long"), lit(buckets.toLong)), lit(0L)))
    val so = other.withColumn("__salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    sf.join(so, keys :+ "__salt").drop("__salt")
  }
}

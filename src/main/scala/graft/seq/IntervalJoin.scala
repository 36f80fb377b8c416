package graft.seq

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range-containment) join — points matched to every interval
  * containing them, with NO key to equi-join on. The naive plan is a
  * BroadcastNestedLoopJoin evaluating `s <= t AND t < e` against every
  * (point, interval) pair — quadratic, the classic range-join trap (the
  * same trap [[AsOfJoin]] dodges with its tagged-union window and the
  * embedding near-dup family dodges with LSH buckets).
  *
  * This is the bucketed range join (the technique behind Databricks'
  * RANGE_JOIN hint): pick a bucket width w, put each point in bucket
  * ⌊t/w⌋, replicate each interval to every bucket it overlaps
  * (⌊s/w⌋..⌊(e−1)/w⌋ — end-exclusive), then a plain shuffled EQUI-join
  * on the bucket plus the residual containment predicate. Each matching
  * pair meets in exactly ONE bucket (the point's own), so no dedup pass
  * is needed. Cost: interval replication ≈ len/w rows — pick w near the
  * typical interval length so replication is O(1) per interval and each
  * bucket's population stays bounded; the shuffle is hash-partitioned
  * by bucket (time-skew → AQE skew-split handles hot buckets).
  *
  * Times are LONGS (epoch micros by convention — callers must divide
  * nanos down BEFORE the join; micro-vs-nano mismatches silently change
  * containment at the boundary). Intervals are [start, end) half-open.
  */
object IntervalJoin {

  /** Join `points` (tsCol) to `intervals` (startCol, endCol) by
    * containment. Returns points ⋈ intervals columns; empty intervals
    * (end <= start) match nothing.
    */
  def containment(points: DataFrame, intervals: DataFrame, tsCol: String,
                  startCol: String, endCol: String,
                  bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive: $bucketWidth")
    val w = lit(bucketWidth)
    // floorDiv semantics for pre-epoch longs: (x - pmod(x, w)) / w
    def fdiv(c: org.apache.spark.sql.Column) = (c - pmod(c, w)) / w
    val p = points.withColumn("ij_bucket", fdiv(col(tsCol)).cast("long"))
    val iv = intervals
      .where(col(endCol) > col(startCol))
      .withColumn("ij_bucket",
        explode(sequence(fdiv(col(startCol)).cast("long"),
          fdiv(col(endCol) - lit(1L)).cast("long"))))
    p.join(iv, Seq("ij_bucket"))
      .where(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop("ij_bucket")
  }
}

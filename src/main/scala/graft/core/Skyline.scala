package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distributed skyline (Pareto frontier) — the rows not dominated on a
  * set of criteria. Row u dominates v when u is ≥ v on every criterion
  * and > v on at least one (maximization; flip sign per-column for
  * minimization upstream).
  *
  * The scale design is the classic two-phase skyline:
  *
  *  1. LOCAL PRUNE: each partition computes its own skyline with the
  *     sort-filter scan — sort by (c₁ desc, c₂ desc, …); a row can only
  *     be dominated by an EARLIER row in that order (the first sort key
  *     is non-increasing, and strict dominance needs ≥ everywhere plus
  *     > somewhere — impossible for a later row), so one pass against
  *     the running frontier suffices. Output size is the partition's
  *     frontier, typically ≪ partition size.
  *  2. GLOBAL MERGE: the union of local frontiers (small by
  *     construction) is scanned once more on one partition with the
  *     same sort-filter — exactness does not depend on step 1's
  *     partitioning, since a globally dominated row is dominated by
  *     some survivor of every local frontier containing its dominator.
  *
  * No O(n²) self-join, no global window over the data; the only
  * movement of full rows is the frontier union. Dominance compares
  * doubles; rows with any null/NaN criterion are excluded (dominance
  * is undefined there).
  */
object Skyline {

  /** Rows of `df` on the Pareto frontier, maximizing every column in
    * `criteria`.
    */
  def skyline(df: DataFrame, criteria: Seq[String]): DataFrame = {
    require(criteria.nonEmpty, "skyline needs at least one criterion")
    val spark = df.sparkSession
    val cs = criteria.map(c => col(c).cast(DoubleType))
    val clean = df.where(cs.map(c => c.isNotNull && !isnan(c)).reduce(_ && _))
    val idx = criteria.map(clean.schema.fieldIndex).toArray

    def num(r: Row, i: Int): Double = r.get(i) match {
      case d: java.lang.Double => d
      case b: java.math.BigDecimal => b.doubleValue
      case n: java.lang.Number => n.doubleValue
      case other => throw new IllegalArgumentException(
        s"non-numeric skyline criterion value: $other")
    }

    def frontierScan(it: Iterator[Row]): Iterator[Row] = {
      // rows arrive sorted lexicographically desc on the criteria;
      // frontier stays small (it is the partition's skyline)
      val frontier = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
      val out = scala.collection.mutable.ArrayBuffer.empty[Row]
      it.foreach { r =>
        val v = idx.map(i => num(r, i))
        val dominated = frontier.exists { f =>
          var ge = true; var gt = false; var k = 0
          while (k < v.length && ge) {
            if (f(k) < v(k)) ge = false
            else if (f(k) > v(k)) gt = true
            k += 1
          }
          ge && gt
        }
        if (!dominated) { frontier += v; out += r }
      }
      out.iterator
    }

    val sortCols = cs.map(_.desc)
    val local = clean.sortWithinPartitions(sortCols: _*)
      .rdd.mapPartitions(frontierScan)
    val localDf = spark.createDataFrame(local, clean.schema)
    // global pass: single small partition over the merged frontiers
    val merged = localDf.coalesce(1).sortWithinPartitions(sortCols: _*)
      .rdd.mapPartitions(frontierScan)
    spark.createDataFrame(merged, clean.schema)
  }
}

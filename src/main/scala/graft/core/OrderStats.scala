package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distributed exact quantiles via order-statistic selection.
  *
  * Catalyst's `percentile` buffers every value per partition and merges
  * the full value multiset on a single reducer — at 100 TB that reducer
  * is an OOM, and before that a straggler. This computes the same exact,
  * linearly-interpolated quantiles (numpy `np.percentile` semantics, the
  * reference's threshold math at `app/AE_model.py:197` and
  * `app/LSTM_AE.py:513-517`) with bounded memory everywhere:
  *
  *  1. one mergeable agg: (count, min, max) per column;
  *  2. per pass: bucket the candidate value range into `buckets`
  *     equi-width cells and aggregate (count, min, max) per cell — a
  *     map-side-combined shuffle of at most `buckets` keys; locate the
  *     cell holding each target rank;
  *  3. a cell that is constant (min == max) resolves immediately; a cell
  *     with ≤ `collectThreshold` rows is fetched and sorted on the
  *     driver; anything else recurses into the cell's [min, max].
  *
  * Each pass shrinks the candidate span ~`buckets`-fold (the next span is
  * one cell's actual [min, max]), so passes are O(log_B span) — 2–3 full
  * scans in practice, each pruned to a single column with a pushed-down
  * range filter. Driver and executor memory are bounded by
  * `buckets` + `collectThreshold` regardless of data size, and every
  * aggregate is mergeable, so the plan survives a 1000-executor cluster.
  *
  * Interpolation matches Catalyst `Percentile` bitwise (and DuckDB
  * `quantile_cont` within rounding): with h = p·(n−1),
  * result = v_⌊h⌋·(⌈h⌉−h) + v_⌈h⌉·(h−⌊h⌋).
  * Nulls and NaNs are excluded (Imputer/profiler validity semantics).
  */
object OrderStats {

  private case class Segment(lo: Double, hi: Double, below: Long, ranks: List[Long])

  /** Exact interpolated quantiles `ps` for each of `cols`, computed with
    * the bounded-memory selection above. Returns per column the quantile
    * values in the order of `ps`; a column with zero valid rows maps to
    * NaNs.
    */
  def quantiles(df: DataFrame, cols: Seq[String], ps: Seq[Double],
                buckets: Int = 1024, collectThreshold: Int = 4096): Map[String, Seq[Double]] = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"quantile probabilities must be in [0,1]: $ps")
    // The selection makes 2-3 passes over the values; if the caller
    // didn't already persist, cache the column-pruned projection for the
    // duration so every pass reads the narrow cached frame instead of
    // re-running the upstream plan (scan + any exchange) per pass. At
    // 100 TB the projection is the pruned quantile columns only, and
    // MEMORY_AND_DISK degrades to re-scan economics, never OOM.
    val needCache = df.storageLevel == org.apache.spark.storage.StorageLevel.NONE
    val base =
      if (needCache)
        df.select(cols.distinct.map(col): _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else df
    try quantilesOn(base, cols, ps, buckets, collectThreshold)
    finally if (needCache) { base.unpersist(false); () }
  }

  private def quantilesOn(df: DataFrame, cols: Seq[String], ps: Seq[Double],
                          buckets: Int, collectThreshold: Int): Map[String, Seq[Double]] = {
    def valid(c: String): Column = {
      val d = col(c).cast(DoubleType)
      when(d.isNotNull && !isnan(d), d)
    }
    // ±Infinity cannot be histogram-bucketed (infinite cell width), so
    // the stats pass counts the infinite tails separately and the
    // selection runs over the FINITE range with a rank offset; ranks
    // inside a tail resolve to that infinity directly.
    def finite(c: String): Column = {
      val v = valid(c)
      when(v > Double.NegativeInfinity && v < Double.PositiveInfinity, v)
    }
    val statAggs = cols.flatMap { c =>
      val v = valid(c)
      Seq(count(v).as(s"${c}__n"),
        count(when(v === Double.NegativeInfinity, 1)).as(s"${c}__ninf"),
        count(when(v === Double.PositiveInfinity, 1)).as(s"${c}__pinf"),
        min(finite(c)).as(s"${c}__min"), max(finite(c)).as(s"${c}__max"))
    }
    val srow = df.agg(statAggs.head, statAggs.tail: _*).head()

    cols.zipWithIndex.map { case (c, ci) =>
      val n = srow.getLong(5 * ci)
      if (n == 0L) c -> ps.map(_ => Double.NaN)
      else {
        val nNegInf = srow.getLong(5 * ci + 1)
        val nPosInf = srow.getLong(5 * ci + 2)
        val pos = ps.map(p => p * (n - 1)) // 0-indexed fractional positions
        val needed = pos.flatMap(h => Seq(math.floor(h).toLong + 1L, math.ceil(h).toLong + 1L))
          .distinct.sorted.toList
        val (tailRanks, finiteRanks) =
          needed.partition(r => r <= nNegInf || r > n - nPosInf)
        val tailValues = tailRanks.map { r =>
          r -> (if (r <= nNegInf) Double.NegativeInfinity else Double.PositiveInfinity)
        }.toMap
        val finiteValues: Map[Long, Double] =
          if (finiteRanks.isEmpty) Map.empty
          else {
            val mn = srow.getDouble(5 * ci + 3)
            val mx = srow.getDouble(5 * ci + 4)
            if (mn == mx) finiteRanks.map(_ -> mn).toMap
            else select(df, finite(c), finiteRanks, mn, mx,
              buckets, collectThreshold, below0 = nNegInf)
          }
        val values = tailValues ++ finiteValues
        c -> pos.map { h =>
          val fl = math.floor(h); val cl = math.ceil(h)
          val lo = values(fl.toLong + 1L)
          if (cl == fl) lo
          else lo * (cl - h) + values(cl.toLong + 1L) * (h - fl)
        }
      }
    }.toMap
  }

  /** Single-column convenience. */
  def quantilesOf(df: DataFrame, colName: String, ps: Seq[Double]): Seq[Double] =
    quantiles(df, Seq(colName), ps)(colName)

  /** Resolve the 1-indexed order statistics `ranks` of the valid values
    * of `v`, known to lie in [mn, mx], by iterative histogram pruning.
    */
  private def select(df: DataFrame, v: Column, ranks: List[Long],
                     mn: Double, mx: Double, b: Int, collectThr: Int,
                     below0: Long = 0L): Map[Long, Double] = {
    val out = scala.collection.mutable.Map.empty[Long, Double]
    // project the (possibly deeply when-wrapped) value expression ONCE:
    // the cell filters below reference it up to 2·cells times per row,
    // and without this projection every reference re-evaluates the
    // whole validity/finiteness expression (measured 8× slowdown on a
    // 19-edge request)
    val vdf = df.select(v.as("__v")).where(col("__v").isNotNull)
    val vv = col("__v")

    /** Resolve a single small range by direct collect+sort (used only
      * for the rare no-shrink / sub-resolution branches — a lone range
      * is a simple AND filter, cheap to plan and run).
      */
    def collectResolveOne(cell: Segment): Unit = {
      val vals = vdf.where(vv >= lit(cell.lo) && vv <= lit(cell.hi))
        .collect().map(_.getDouble(0)).sorted
      cell.ranks.foreach(k => out(k) = vals((k - cell.below - 1).toInt))
    }

    /** ONE job resolves every small cell of a segment's histogram pass:
      * membership is the segment's own bucket arithmetic plus an
      * integer IN-set — a single codegen'd predicate. (An OR-chain of
      * per-cell range conjunctions is catastrophically worse: the
      * optimizer's CNF conversion is exponential in the number of
      * disjuncts — a 19-cell request spent ~8 s planning; a
      * higher-order `exists` over literal bounds fixes planning but
      * pays interpreted-lambda cost per row.)
      */
    def collectResolveBuckets(seg: Segment, w: Double,
                              cells: List[(Long, Segment)]): Unit = if (cells.nonEmpty) {
      val bucketCol = least(floor((vv - lit(seg.lo)) / lit(w)), lit(b - 1)).cast("long")
      val rows = vdf
        .where(vv >= lit(seg.lo) && vv <= lit(seg.hi) &&
          bucketCol.isin(cells.map(_._1): _*))
        .select(vv.as("v"), bucketCol.as("bkt"))
        .collect()
      val byBucket = rows.groupBy(_.getLong(1))
      cells.foreach { case (bi, cell) =>
        val slice = byBucket.getOrElse(bi, Array.empty)
          .map(_.getDouble(0)).sorted
        cell.ranks.foreach(k => out(k) = slice((k - cell.below - 1).toInt))
      }
    }

    var segments: List[Segment] = List(Segment(mn, mx, below0, ranks))
    var pass = 0
    while (segments.nonEmpty) {
      pass += 1
      require(pass <= 64, s"order-statistic selection failed to converge after $pass passes")
      segments = segments.flatMap { seg =>
        if (seg.lo == seg.hi) { seg.ranks.foreach(out(_) = seg.lo); Nil }
        else {
          // hi/b - lo/b instead of (hi-lo)/b: avoids overflow for huge spans
          val w = seg.hi / b - seg.lo / b
          if (!java.lang.Double.isFinite(w) || w <= 0.0) {
            // span below bucketing resolution — a handful of adjacent
            // doubles; resolve directly (count is tiny in value-space)
            collectResolveOne(seg); Nil
          } else {
            val bucket = least(floor((vv - lit(seg.lo)) / lit(w)), lit(b - 1)).cast("long")
            val hist = vdf.where(vv >= lit(seg.lo) && vv <= lit(seg.hi))
              .groupBy(bucket.as("b"))
              .agg(count(lit(1)).as("c"), min(vv).as("mn"), max(vv).as("mx"))
              .orderBy("b").collect()
            var cum = seg.below
            var remaining = seg.ranks
            val next = scala.collection.mutable.ListBuffer.empty[Segment]
            val small = scala.collection.mutable.ListBuffer.empty[(Long, Segment)]
            hist.foreach { r =>
              val cnt = r.getLong(1)
              val (inB, rest) = remaining.partition(k => k > cum && k <= cum + cnt)
              if (inB.nonEmpty) {
                val bmn = r.getDouble(2); val bmx = r.getDouble(3)
                if (bmn == bmx) inB.foreach(out(_) = bmn)
                else if (cnt <= collectThr)
                  small += ((r.getLong(0), Segment(bmn, bmx, cum, inB)))
                else if (bmn == seg.lo && bmx == seg.hi)
                  // no shrink possible (ulp-dense cell) — force resolve to
                  // guarantee termination; only reachable for adversarial
                  // distributions packed within ~buckets ULPs
                  collectResolveOne(Segment(bmn, bmx, cum, inB))
                else next += Segment(bmn, bmx, cum, inB)
              }
              cum += cnt
              remaining = rest
            }
            collectResolveBuckets(seg, w, small.toList)
            next.toList
          }
        }
      }
    }
    out.toMap
  }
}

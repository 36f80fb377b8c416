package graft.seq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: attach to each left row the most recent
  * right row with right.ts ≤ left.ts for the same key — the temporal
  * lookup behind feature stores, trade/quote alignment, and
  * last-known-state enrichment. Spark has no native ASOF JOIN (DuckDB
  * and pandas do), and the naive formulation — a range join
  * `l.key = r.key AND r.ts <= l.ts` followed by a max-per-left-row —
  * produces O(|L|·|R|) intermediate pairs per key.
  *
  * This is the scalable union-scan form: tag right rows 0 and left
  * rows 1, union them, and run ONE window pass partitioned by key and
  * ordered by (ts, tag), carrying the latest right payload forward
  * with `last(_, ignoreNulls)`. Cost is one shuffle of |L|+|R| narrow
  * rows on the key plus an in-partition sort — no pair blowup, fully
  * parallel across keys, skew bounded by a single key's history. Ties
  * (right.ts == left.ts) order the right row first, so a simultaneous
  * right row IS visible (≤ semantics, matching DuckDB's ASOF JOIN).
  * Duplicate RIGHT rows at the same (key, ts) resolve deterministically
  * to the struct-wise greatest payload (they are further ordered by the
  * payload struct); pre-deduplicate to one row per (key, ts) if a
  * different winner is wanted. That payload tiebreak applies only when
  * every payload type is ORDERABLE — a payload containing e.g. a
  * MapType cannot be a sort key (Window.orderBy on it fails analysis),
  * so such joins fall back to the two-key (ts, tag) ordering and the
  * winner among exact (key, ts) right-duplicates is partition-order
  * dependent; pre-deduplicate those upstream.
  *
  * The right payload travels as ONE struct, so a right row whose
  * payload FIELDS are null still registers as a match (the struct
  * itself is non-null) — field-wise carrying would silently skip to an
  * older row.
  */
object AsOfJoin {

  /** Left-outer as-of join. `tsCol` must be numeric/castable to long in
    * both frames (same clock); `payload` names right-side columns to
    * attach, emitted as `<outPrefix><name>` plus `<outPrefix>ts` (the
    * matched right timestamp, null when no right row precedes the left
    * row). `tolerance`: discard matches older than this many ts units
    * (pandas merge_asof semantics).
    */
  def asOf(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
           payload: Seq[String], outPrefix: String = "asof_",
           tolerance: Option[Long] = None): DataFrame = {
    require(payload.nonEmpty, "asOf needs at least one payload column")
    val rStructCol: Column =
      struct((col(tsCol).cast("long").as("__asof_ts") +: payload.map(col)): _*)
    val rStructType = right.select(rStructCol.as("r")).schema.head.dataType
    val lStructCol: Column = struct(left.columns.map(col): _*)
    val lStructType = left.select(lStructCol.as("l")).schema.head.dataType

    val r = right.select(col(keyCol).as("__k"), col(tsCol).cast("long").as("__ts"),
      lit(0).as("__tag"), lit(null).cast(lStructType).as("__l"), rStructCol.as("__r"))
    val l = left.select(col(keyCol).as("__k"), col(tsCol).cast("long").as("__ts"),
      lit(1).as("__tag"), lStructCol.as("__l"), lit(null).cast(rStructType).as("__r"))

    // third sort key = the right payload struct itself: with duplicate
    // right rows at the same (key, ts), `last` then deterministically
    // picks the struct-wise greatest payload instead of an arbitrary
    // partition-order-dependent one. Left rows tie only among
    // themselves (all carry the same preceding __m), so their null __r
    // is harmless. Only added when the payload is orderable — sorting
    // on a struct with a Map field fails analysis (see scaladoc).
    val sortKeys =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering
            .isOrderable(rStructType))
        Seq(col("__ts"), col("__tag"), col("__r"))
      else Seq(col("__ts"), col("__tag"))
    val w = Window.partitionBy("__k").orderBy(sortKeys: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = r.unionByName(l)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1)
    val ok = tolerance match {
      case Some(t) => col("__m").isNotNull && (col("__ts") - col("__m.__asof_ts")) <= t
      case None => col("__m").isNotNull
    }
    val matched = carried.withColumn("__mm", when(ok, col("__m")))
    val outCols = left.columns.toSeq.map(c => col(s"__l.`$c`").as(c)) ++
      (col("__mm.__asof_ts").as(outPrefix + "ts") +:
        payload.map(p => col(s"__mm.`$p`").as(outPrefix + p)))
    matched.select(outCols: _*)
  }
}

package graft.seq

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sliding-window sequence operators — the reference builds size-t
  * stride-1 sequences over row order for its LSTM models
  * (`lib/utils.py:99-114`, t=20 at `app/LSTM_AE.py:470`), expands
  * anomalous sequences back to member records deduped by original index
  * (`app/LSTM_AE.py:391-419`), and left-pads per-sequence scores to align
  * with source rows (`np.pad`, `app/LSTM_AE.py:547,575-580`).
  *
  * The reference's implicit "partition" is whole-table row order — a
  * single-node notion. Here ordering is explicit (a deterministic sort
  * key) and sequences are built PER SERIES KEY with
  * `Window.partitionBy(series).orderBy(order)`: each series sorts
  * independently inside its shuffle partition, so the op scales out to
  * any number of executors. Passing no series key reproduces the
  * reference's whole-table semantics but forces a single-partition sort
  * — supported, logged in the plan (WindowExec warning), discouraged
  * at scale.
  */
object Sequencer {

  private def window(seriesCols: Seq[String], orderCols: Seq[Column]) =
    if (seriesCols.isEmpty) Window.orderBy(orderCols: _*)
    else Window.partitionBy(seriesCols.map(col): _*).orderBy(orderCols: _*)

  /** Deterministic per-series row number (1-based), the explicit stand-in
    * for the reference's implicit row order.
    */
  def withRowId(df: DataFrame, seriesCols: Seq[String], orderCols: Seq[Column],
                idCol: String = "row_id"): DataFrame =
    df.withColumn(idCol, row_number().over(window(seriesCols, orderCols)))

  /** W1 — size-`t` stride-1 sliding sequences of `valueCol`. One output
    * row per window END position with a full window (`n < t` ⇒ empty,
    * matching `lib/utils.py:105-108`). Output: series cols, `row_id`
    * (end position), `seq` (ArrayType, oldest→newest).
    */
  def slidingSequences(df: DataFrame, seriesCols: Seq[String],
                       orderCols: Seq[Column], valueCol: Column, t: Int,
                       seqCol: String = "seq"): DataFrame = {
    require(t >= 1, s"sequence length must be >= 1, got $t")
    val w = window(seriesCols, orderCols).rowsBetween(-(t - 1), Window.currentRow)
    withRowId(df, seriesCols, orderCols)
      .withColumn(seqCol, collect_list(valueCol).over(w))
      .where(size(col(seqCol)) === t)
  }

  /** W2 — expand flagged sequence end-positions back to their t member
    * row_ids, deduplicated (overlapping windows share members,
    * `app/LSTM_AE.py:391-419`). Input needs `row_id` + series cols;
    * output: series cols + `member_row_id`, distinct.
    */
  def expandMembers(flagged: DataFrame, seriesCols: Seq[String], t: Int,
                    idCol: String = "row_id",
                    memberCol: String = "member_row_id"): DataFrame = {
    val cols = seriesCols.map(col) :+
      explode(sequence(col(idCol) - (t - 1), col(idCol))).as(memberCol)
    flagged.select(cols: _*).distinct()
  }

  /** W3 — align per-sequence scores back onto source rows: rows whose
    * row_id has no sequence (the first t−1 of each series) get a null
    * score — the distributed form of `np.pad(errors, (t-1, 0))`.
    */
  def padAlignScores(base: DataFrame, scores: DataFrame,
                     joinCols: Seq[String]): DataFrame =
    base.join(scores, joinCols, "left")
}

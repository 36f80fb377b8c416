package graft.eval

import graft.core.Quantiles
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-search threshold selection (reference SURVEY.md §2.4 A15: manual
  * nested-loop grids, `app/IsolationForest_AE_enhanced.py:39-146`;
  * GridSearchCV at `app/IsolationForest_AE.py:210-247`).
  *
  * SINGLE-PASS at scale: instead of cross-joining the table against the
  * grid (row count × grid size), every grid point becomes three
  * conditional aggregates in ONE scan — a 10-point grid is 30 extra
  * partial-agg columns, map-side combined, no extra shuffle. The 1×3n
  * result row is unpivoted driver-free via `inline(array(struct…))`.
  */
object GridSearch {

  /** F1 per candidate threshold (quantiles `ps` of the score column).
    * Output: (p, threshold, tp, fp, fn, f1) — one row per grid point.
    */
  def thresholdGrid(df: DataFrame, labelCol: String, scoreCol: String,
                    ps: Seq[Double]): DataFrame = {
    val thrs = Quantiles.exactQuantiles(df, scoreCol, ps)
    val y = col(labelCol)
    val s = col(scoreCol).cast("double")
    val aggs = ps.indices.flatMap { i =>
      val pred = s > thrs(i)
      Seq(
        count(when(pred && y === 1, 1)).as(s"tp_$i"),
        count(when(pred && y === 0, 1)).as(s"fp_$i"),
        count(when(!pred && y === 1, 1)).as(s"fn_$i"))
    }
    val onerow = df.agg(aggs.head, aggs.tail: _*)
    val structs = ps.indices.map { i =>
      struct(lit(ps(i)).as("p"), lit(thrs(i)).as("threshold"),
        col(s"tp_$i").as("tp"), col(s"fp_$i").as("fp"), col(s"fn_$i").as("fn"))
    }
    onerow.select(inline(array(structs: _*)))
      .withColumn("f1",
        when(lit(2) * col("tp") + col("fp") + col("fn") === 0, lit(null))
          .otherwise((lit(2.0) * col("tp")) /
            (lit(2) * col("tp") + col("fp") + col("fn")).cast("double")))
  }

  /** The winning threshold: max F1, ties to the smaller quantile. */
  def bestThreshold(df: DataFrame, labelCol: String, scoreCol: String,
                    ps: Seq[Double]): DataFrame =
    thresholdGrid(df, labelCol, scoreCol, ps)
      .orderBy(desc("f1"), asc("p"))
      .limit(1)
}

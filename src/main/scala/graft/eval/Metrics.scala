package graft.eval

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Binary-detection evaluation: confusion counts, rates, ROC/AUC,
  * Youden-J threshold — the reference computes these driver-side in
  * numpy/sklearn (`app/IsolationForest_AE.py:373-396`,
  * `lib/utils.py:117-151`, `app/AE_model_enhanced.py:150-168`); here they
  * are single-pass Spark aggregates / window functions.
  */
object Metrics {

  /** TP/FP/TN/FN in ONE aggregate job (vs four filtered counts in the
    * reference, `app/IsolationForest_AE.py:373-396`).
    * `label` ∈ {0,1}, `predicted` boolean or {0,1}.
    */
  def confusion(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    val y = col(labelCol).cast("int")
    val p = col(predCol).cast("boolean")
    df.agg(
      count(when(y === 1 && p, 1)).as("tp"),
      count(when(y === 0 && p, 1)).as("fp"),
      count(when(y === 0 && !p, 1)).as("tn"),
      count(when(y === 1 && !p, 1)).as("fn"))
  }

  /** Detection rate (recall), FPR, precision, F1 from confusion counts.
    * Rates are round()ed to 6 so cross-engine double division (which can
    * differ in the last ulp) hash-compares stably.
    */
  def rates(df: DataFrame, labelCol: String, predCol: String): DataFrame =
    confusion(df, labelCol, predCol).selectExpr(
      "tp", "fp", "tn", "fn",
      "round(CAST(tp AS DOUBLE)/nullif(tp+fn,0), 6) AS detection_rate",
      "round(CAST(fp AS DOUBLE)/nullif(fp+tn,0), 6) AS false_positive_rate",
      "round(CAST(tp AS DOUBLE)/nullif(tp+fp,0), 6) AS precision_",
      // 2.0 literal parses as DECIMAL in Spark SQL — cast to keep f1 DOUBLE
      "round(CAST(2*tp AS DOUBLE)/nullif(2*tp+fp+fn,0), 6) AS f1")

  /** ROC points via running totals over score-descending order — the
    * distributed form of sklearn.roc_curve (`lib/utils.py:117-151`).
    * Ties in score collapse to one ROC point (max cum counts per distinct
    * score), matching roc_curve's drop_intermediate=False on thresholds.
    *
    * NOTE scale: the global `orderBy` window is a single-partition sort
    * over DISTINCT SCORES after pre-aggregation — we first groupBy score
    * (shuffle on score, map-side combine), so the window input is
    * #distinct-scores rows, not #records. For continuous scores consider
    * quantile-bucketing scores first.
    */
  def rocPoints(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val y = col(labelCol).cast("int")
    val perScore = df.groupBy(col(scoreCol).as("score"))
      .agg(count(when(y === 1, 1)).as("pos"), count(when(y === 0, 1)).as("neg"))
    val w = Window.orderBy(desc("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val totals = df.agg(
      count(when(y === 1, 1)).as("P"), count(when(y === 0, 1)).as("N")).head()
    val (pTot, nTot) = (totals.getLong(0), totals.getLong(1))
    perScore
      .withColumn("cum_tp", sum("pos").over(w))
      .withColumn("cum_fp", sum("neg").over(w))
      .select(col("score"),
        (col("cum_tp").cast("double") / lit(pTot.toDouble)).as("tpr"),
        (col("cum_fp").cast("double") / lit(nTot.toDouble)).as("fpr"))
  }

  /** AUC by trapezoid over ROC points (matches sklearn.auc on the same
    * points). Uses lag() over fpr-ascending order.
    */
  def auc(df: DataFrame, labelCol: String, scoreCol: String): Double = {
    val roc = rocPoints(df, labelCol, scoreCol)
    val w = Window.orderBy(asc("fpr"), asc("tpr"))
    val trap = roc
      .withColumn("prev_fpr", lag("fpr", 1, 0.0).over(w))
      .withColumn("prev_tpr", lag("tpr", 1, 0.0).over(w))
      .select(((col("fpr") - col("prev_fpr")) *
        (col("tpr") + col("prev_tpr")) / 2.0).as("area"))
    trap.agg(sum("area")).head().getDouble(0)
  }

  /** AUC as a 1-row DataFrame with run-deterministic summation: trapezoid
    * areas are cast to DECIMAL(38,18) before the final sum so the result
    * does not depend on partition merge order (see [[graft.core.Stats]]).
    */
  def aucDF(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val roc = rocPoints(df, labelCol, scoreCol)
    val w = Window.orderBy(asc("fpr"), asc("tpr"))
    roc
      .withColumn("prev_fpr", lag("fpr", 1, 0.0).over(w))
      .withColumn("prev_tpr", lag("tpr", 1, 0.0).over(w))
      .select(((col("fpr") - col("prev_fpr")) *
        (col("tpr") + col("prev_tpr")) / 2.0).cast(DecimalType(38, 18)).as("area"))
      .agg(round(sum("area").cast(DoubleType), 6).as("auc"))
  }

  /** Youden-J optimal threshold: score maximizing tpr − fpr
    * (`app/AE_model_enhanced.py:150-168`). TakeOrderedAndProject — no
    * full sort materialization.
    */
  def youdenJ(df: DataFrame, labelCol: String, scoreCol: String): DataFrame =
    rocPoints(df, labelCol, scoreCol)
      .select(col("score"), (col("tpr") - col("fpr")).as("j"))
      .orderBy(desc("j"), asc("score"))
      .limit(1)

  /** Approximate AUC via quantile-binned scores — the 100 TB path for
    * continuous (near-unique) scores promised in [[rocPoints]]'s note:
    * the window input shrinks from #distinct-scores to `bins`+1 rows.
    *
    * Bin thresholds are the (1..bins−1)/bins score quantiles (exact,
    * deduplicated); bin(x) = count of thresholds strictly below x, a
    * codegen'd sum of comparisons. Per-bin pos/neg is one aggregate
    * pass; cumulative TPR/FPR + trapezoid run over the tiny bin table.
    * Converges to the exact AUC as bins → #distinct scores.
    */
  def binnedRocAuc(df: DataFrame, labelCol: String, scoreCol: String,
                   bins: Int = 20): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType}
    val ps = (1 until bins).map(_.toDouble / bins)
    val ts = graft.core.Quantiles.exactQuantiles(df, scoreCol, ps).distinct
    val y = col(labelCol).cast("int")
    val s = col(scoreCol).cast("double")
    val bin = ts.map(t => when(s > lit(t), 1).otherwise(0)).reduce(_ + _)
    val perBin = df.groupBy(bin.as("bin"))
      .agg(count(when(y === 1, 1)).as("pos"), count(when(y === 0, 1)).as("neg"))
    val totals = df.agg(
      count(when(y === 1, 1)).as("P"), count(when(y === 0, 1)).as("N")).head()
    val (pTot, nTot) = (totals.getLong(0), totals.getLong(1))
    val w = Window.orderBy(desc("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wl = Window.orderBy(asc("fpr"), asc("tpr"))
    perBin
      .withColumn("tpr", sum("pos").over(w).cast("double") / lit(pTot.toDouble))
      .withColumn("fpr", sum("neg").over(w).cast("double") / lit(nTot.toDouble))
      .withColumn("prev_fpr", lag("fpr", 1, 0.0).over(wl))
      .withColumn("prev_tpr", lag("tpr", 1, 0.0).over(wl))
      .select(((col("fpr") - col("prev_fpr")) *
        (col("tpr") + col("prev_tpr")) / 2.0).cast(DecimalType(38, 18)).as("area"))
      .agg(round(sum("area").cast(DoubleType), 6).as("auc_binned"))
  }
}

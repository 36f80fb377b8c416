package graft.features

import graft.core.Stats
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Target (mean) encoding of a categorical column — the
  * high-cardinality companion to [[FrequencyIndexer]]: replace each
  * category with a statistic of the label inside it, so a 10M-value
  * categorical becomes one dense double the model can use.
  *
  * Two surfaces:
  *  - [[encodings]] — the fitted per-category table with m-estimate
  *    smoothing toward the global prior:
  *    `enc = (Σy + m·prior) / (n + m)` (rare categories shrink to the
  *    prior; m = 0 is the raw per-category mean);
  *  - [[looTransform]] — leave-one-out encoding for the TRAINING frame
  *    itself: each row is encoded by its category's statistics
  *    excluding the row's own label (`(Σy − y) / (n − 1)`, prior for
  *    singleton categories), the standard guard against the
  *    target-leakage overfit of naive mean encoding.
  *
  * Scale shape: one map-side-combined aggregate keyed by category (the
  * q81 vocabulary shape — hot categories cost one partial row per
  * mapper, never a row per occurrence), then a broadcast-or-shuffle
  * equi-join of the tiny encoding table back onto the frame. Label
  * sums use exact DECIMAL partials ([[Stats.dsum]]) so the fit is
  * order-independent and cross-engine reproducible.
  */
object TargetEncoder {

  /** Fitted per-category encoding table:
    * (category, n, enc = (Σy + m·prior)/(n + m)), prior = global mean.
    */
  def encodings(df: DataFrame, catCol: String, labelCol: String,
                m: Double = 0.0): DataFrame = {
    require(m >= 0.0, s"smoothing m must be >= 0: $m")
    val y = col(labelCol).cast(DoubleType)
    val prior = df.agg((Stats.dsum(y) / count(y)).as("p")).head.getDouble(0)
    df.groupBy(col(catCol))
      .agg(count(y).as("n"), Stats.dsum(y).as("sum_y"))
      .select(col(catCol), col("n"),
        ((col("sum_y") + lit(m) * lit(prior)) /
          (col("n").cast(DoubleType) + lit(m))).as("enc"))
  }

  /** Leave-one-out transform: appends `looCol` where each row's
    * encoding excludes its own label; singleton categories (n = 1)
    * fall back to the global prior.
    */
  def looTransform(df: DataFrame, catCol: String, labelCol: String,
                   looCol: String = "loo_enc"): DataFrame = {
    val y = col(labelCol).cast(DoubleType)
    val prior = df.agg((Stats.dsum(y) / count(y)).as("p")).head.getDouble(0)
    val byCat = df.groupBy(col(catCol))
      .agg(count(y).as("cat_n"), Stats.dsum(y).as("cat_sum"))
    df.join(byCat, Seq(catCol))
      .withColumn(looCol,
        when(col("cat_n") > 1,
          (col("cat_sum") - y) / (col("cat_n") - 1).cast(DoubleType))
          .otherwise(lit(prior)))
      .drop("cat_n", "cat_sum")
  }
}

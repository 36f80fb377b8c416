package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF term weighting over a document corpus — the standard relevance
  * statistic a training-data pipeline uses for keyword extraction,
  * quality filtering, and near-topic sampling.
  *
  * Plan shape at scale: one explode + two grouped counts (both map-side
  * combinable) + a broadcast-sized IDF table joined back. No quadratic
  * stage anywhere; the per-document top-k is a window over (doc, score).
  *
  * Two IDF variants:
  *  - [[idfLog]]: smoothed log IDF, ln((1+N)/(1+df)) + 1 (sklearn's
  *    formula) — the conventional weighting;
  *  - [[idfRational]]: (1+N)/(1+df) without the log — order-equivalent
  *    per term and exactly representable in IEEE arithmetic, so
  *    cross-engine comparisons are bitwise (`ln` may differ in the last
  *    ulp between libm implementations). Oracle queries use this.
  */
object TfIdf {

  /** (id, term, tf) — term frequency per document (multiplicity). */
  def termFreq(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        explode(TextOps.tokens(col(textCol))).as("term"))
      .groupBy("id", "term").agg(count(lit(1)).as("tf"))

  /** (term, df) — document frequency per term. */
  def docFreq(tf: DataFrame): DataFrame =
    tf.groupBy("term").agg(count(lit(1)).as("df"))

  def idfLog(nDocs: Long): Column =
    log((lit(1.0) + nDocs.toDouble) / (lit(1.0) + col("df"))) + lit(1.0)

  def idfRational(nDocs: Long): Column =
    (lit(1.0) + nDocs.toDouble) / (lit(1.0) + col("df"))

  /** (id, term, tf, tfidf) scored frame. `rational` selects the
    * exact-arithmetic IDF (oracle parity).
    */
  def score(df: DataFrame, idCol: String, textCol: String,
            rational: Boolean = false): DataFrame = {
    val n = df.count()
    val tf = termFreq(df, idCol, textCol)
    val idf = docFreq(tf)
      .withColumn("idf", if (rational) idfRational(n) else idfLog(n))
    tf.join(broadcast(idf.select("term", "idf")), "term")
      .withColumn("tfidf", col("tf") * col("idf"))
      .select("id", "term", "tf", "tfidf")
  }

  /** Top-k terms per document by (tfidf desc, term asc). */
  def topTerms(df: DataFrame, idCol: String, textCol: String, k: Int,
               rational: Boolean = false): DataFrame =
    score(df, idCol, textCol, rational)
      .withColumn("rank", row_number().over(
        Window.partitionBy("id").orderBy(desc("tfidf"), asc("term"))))
      .where(col("rank") <= k)
      .select(col("id"), col("rank"), col("term"), col("tf"),
        round(col("tfidf"), 6).as("tfidf"))
}

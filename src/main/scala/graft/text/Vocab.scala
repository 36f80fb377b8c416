package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus vocabulary statistics — the frequency table tokenizer
  * training starts from (BPE merge candidates, unigram seed vocab,
  * stopword inference all begin with "count every token across the
  * corpus").
  *
  * One explode + one token-keyed aggregate computing total count and
  * document frequency together (both map-side combinable); the
  * `minCount` filter happens in the aggregate, so what survives is
  * vocabulary-sized, not corpus-sized. At 100 TB this is the same
  * plan: the only shuffle key is the token (skew on ultra-hot tokens
  * is absorbed by partial aggregation — each mapper emits one row per
  * distinct token).
  *
  * The reference has no text surface (numeric telemetry only); this
  * belongs to the LLM-pipeline family the engine adds.
  */
object Vocab {

  /** (token, n, df): total occurrences and document frequency for
    * tokens with n ≥ minCount.
    */
  def vocabulary(df: DataFrame, idCol: String, textCol: String,
                 minCount: Long = 1L): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("n"), countDistinct("id").as("df"))
      .where(col("n") >= minCount)

  /** DuckDB twin. */
  object Sql {
    def vocabulary(rel: String, id: String, text: String,
                   minCount: Long): String =
      s"""SELECT token, count(*) AS n, count(DISTINCT $id) AS df
         | FROM (SELECT $id, unnest(${TextOps.Sql.toks(text)}) AS token FROM $rel)
         | GROUP BY token HAVING count(*) >= $minCount""".stripMargin
        .replaceAll("\n", " ")
  }
}

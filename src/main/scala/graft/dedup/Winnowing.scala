package graft.dedup

import graft.text.TextOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
  * "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
  * 2003 — the MOSS algorithm): hash every k-token gram, slide a
  * w-window over consecutive gram hashes, keep each window's MINIMUM
  * hash. The guarantee: any shared token run of length ≥ w + k − 1
  * between two documents produces at least one shared fingerprint,
  * while retaining only ~2/(w+1) of the gram hashes — a
  * density/guarantee trade the plain "sample every j-th hash" scheme
  * cannot make (it has no detection guarantee at all).
  *
  * Scale shape: gram hashing is per-row map work; the window-min runs
  * per document (partitionBy doc — never a global window); the
  * fingerprint table is the same inverted-index join shape as
  * MinHash-LSH bands, so the pair stage is bucket-confined by
  * fingerprint value. Where MinHash estimates WHOLE-document Jaccard,
  * winnowing localizes SUBSTRING overlap — the reference dedups whole
  * records by equality (`app/data_augmentation_enhanced.py`); this is
  * the substring-granular analog a 100 TB text corpus needs for
  * quote/boilerplate detection.
  */
object Winnowing {

  /** Distinct winnowed fingerprints per document: (idCol, fp). Tokens
    * are hoisted into their own projection before the gram transform
    * (the HOF shared-subtree inlining trap — see the verify notes).
    */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 4): DataFrame = {
    val toks = df.select(col(idCol), TextOps.tokens(col(textCol)).as("toks"))
    val grams = toks.select(col(idCol),
      posexplode(when(size(col("toks")) >= k,
        transform(sequence(lit(1), size(col("toks")) - (k - 1)),
          i => array_join(slice(col("toks"), i, lit(k)), " ")))
        .otherwise(array().cast("array<string>"))))
      .toDF(idCol, "pos", "g")
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(-(w - 1), 0)
    grams
      .select(col(idCol), col("pos"), TextOps.strHash(col("g")).as("h"))
      .withColumn("fp", min(col("h")).over(win))
      .where(col("pos") >= w - 1) // full windows only
      .select(col(idCol), col("fp")).distinct()
  }
}

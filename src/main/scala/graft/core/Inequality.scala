package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Per-group Gini coefficient / Lorenz summary — concentration of a
  * non-negative quantity (revenue, token counts, document lengths)
  * within each group.
  *
  * Uses the sorted-rank identity over each group's members:
  *
  *   G = (2·Σᵢ i·xᵢ) / (n·Σᵢ xᵢ) − (n + 1)/n,   x sorted ascending,
  *                                               i = 1..n
  *
  * Ranks come from a window PARTITIONED BY the group — parallel across
  * groups, no global window; the shuffle is the same one the final
  * group-by needs anyway, so the whole operator costs one shuffle.
  * `row_number` over (value, tiebreak) makes ranks total and
  * deterministic; the identity is tie-invariant (permuting the ranks
  * of EQUAL values leaves Σ i·xᵢ unchanged), so any unique tiebreaker
  * yields engine-equal results. Σ i·xᵢ accumulates in DECIMAL(38,10) —
  * grouped double sums are association-order-dependent across engines.
  *
  * Capability rationale: a 100 TB corpus-curation pass needs exactly
  * this shape to answer "is the corpus dominated by a few domains?"
  * (pair with the q104 source-cap operator, which acts on the answer).
  */
object Inequality {

  /** One row per group: n, total, gini (null for groups with zero
    * total or a single member — both conventionally undefined).
    */
  def giniByGroup(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  tiebreak: Column): DataFrame = {
    val D = DecimalType(38, 10)
    val x = col(valueCol).cast(DoubleType)
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(x.asc, tiebreak.asc)
    val ranked = df
      .where(x.isNotNull && !isnan(x) && x >= 0)
      .withColumn("__rk", row_number().over(w))
    val n = count(lit(1)).cast(DoubleType)
    val tot = sum(x.cast(D)).cast(DoubleType)
    val wsum = sum((col("__rk") * x).cast(D)).cast(DoubleType)
    ranked.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n"), tot.as("total"),
        when(n > 1.0 && tot > 0.0,
          lit(2.0) * wsum / (n * tot) - (n + 1.0) / n).as("gini"))
  }
}

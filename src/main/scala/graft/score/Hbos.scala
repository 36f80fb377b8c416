package graft.score

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** HBOS — histogram-based outlier score (Goldstein & Dengel 2012): the
  * linear-time unsupervised anomaly baseline. Per feature, a quantile
  * histogram estimates density; a row's score sums the negative log
  * densities of its bins across features (an independence assumption —
  * the price of linear scaling, complementary to [[Mahalanobis]] which
  * models the covariance HBOS ignores).
  *
  * Bins are EQUAL-WIDTH (the paper's static variant): with
  * equal-frequency (quantile) bins every bin holds ~n/k rows, the
  * densities flatten to 1/k and the score carries no signal — the
  * histogram must vary in occupancy for an outlier to stand out.
  * Degenerate (min = max) features collapse to one bin and contribute
  * a constant 0 to every score.
  *
  * Scale shape: fit is ONE min/max aggregate for the edges plus ONE
  * aggregate computing every (feature, bin) count as a conditional
  * count cell — features × bins mergeable slots in a single map-side-
  * combined pass. Scoring is a literal-folded when-chain per feature:
  * no join, no broadcast, no UDF — pure codegen'd column arithmetic,
  * identical on a laptop and a 1000-executor cluster.
  */
object Hbos {

  final case class Model(cols: Seq[String], edges: Seq[Seq[Double]],
                         logDens: Seq[Seq[Double]]) {
    /** Per-feature bin expression (count of edges strictly below). */
    private def binOf(c: String, es: Seq[Double]): Column =
      es.foldLeft(lit(0)) { (acc, e) =>
        acc + when(col(c).cast(DoubleType) > lit(e), 1).otherwise(0)
      }

    /** Σ_f −log₁₀ density_f(bin_f(x)) as a column expression. The
      * density lookup is `element_at` on a LITERAL array indexed by
      * the bin (one evaluation of the 9-CASE bin expression per
      * feature) — the previous 10-branch when-chain inlined the bin
      * subtree into EVERY branch (Catalyst shares no common
      * subexpressions across CASE branches), ~45× the comparisons
      * per row; the r16 honest bench surfaced it at 13 s/600k rows.
      * Values are the same model doubles, summed in the same order —
      * bitwise identical to the chain it replaces.
      */
    def score: Column =
      cols.zip(edges).zip(logDens).map { case ((c, es), lds) =>
        element_at(typedlit(lds.map(ld => -ld)), binOf(c, es) + 1)
      }.reduceLeft(_ + _)
  }

  def fit(df: DataFrame, cols: Seq[String], bins: Int = 10): Model = {
    require(bins >= 2, s"hbos needs at least 2 bins: $bins")
    val mmAggs = cols.flatMap(c => Seq(
      min(col(c).cast(DoubleType)).as(s"mn_$c"),
      max(col(c).cast(DoubleType)).as(s"mx_$c")))
    val mm = df.agg(mmAggs.head, mmAggs.tail: _*).head()
    val edges = cols.map { c =>
      val mn = mm.getAs[Double](s"mn_$c")
      val mx = mm.getAs[Double](s"mx_$c")
      if (!(mx > mn)) Seq.empty[Double]
      // left-assoc (mx-mn)/bins*i — the Discretizer.fitEqualWidth IEEE
      // op sequence, bitwise-matched by the oracle's (mx - mn) / k * i
      else (1 until bins).map(i => mn + (mx - mn) / bins * i).distinct
    }
    def binOf(c: String, es: Seq[Double]): Column =
      es.foldLeft(lit(0)) { (acc, e) =>
        acc + when(col(c).cast(DoubleType) > lit(e), 1).otherwise(0)
      }
    val cells = for { (c, es) <- cols.zip(edges); b <- 0 to es.length }
      yield count(when(binOf(c, es) === b, 1)).as(s"n_${c}_$b")
    val nAgg = count(lit(1)).as("n")
    val row = df.agg(nAgg, cells: _*).head()
    val n = row.getLong(0).toDouble
    var i = 1
    val logDens = cols.zip(edges).map { case (_, es) =>
      (0 to es.length).map { _ =>
        val nb = row.getLong(i).toDouble; i += 1
        // empty bins (possible when distinct edges collapse) get the
        // minimum observable density to keep the log finite
        math.log10(math.max(nb, 1.0) / n)
      }
    }
    Model(cols, edges, logDens)
  }
}

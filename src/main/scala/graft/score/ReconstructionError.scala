package graft.score

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Variance-normalized reconstruction error — the reference's scoring
  * function for every autoencoder flow:
  *
  *  - F1 (record form, `lib/utils.py:39-63`):
  *      err(x, x̂) = mean_f ( |x_f − x̂_f| / max(var_f, 1e-6) )
  *  - F2 (sequence form, `lib/utils.py:66-96`): F1 per timestep, then
  *      mean over the sequence's timesteps.
  *
  * Per-feature variances are **population** variances (`np.var`), fit on
  * the training batch — kept as driver literals, so the scoring pass is
  * pure codegen'd column arithmetic: one map stage, no UDF, no shuffle,
  * identical at any parallelism. Folds are sequential (index order) for
  * cross-engine bitwise parity with the SQL oracle.
  */
object ReconstructionError {

  private def varArr(vars: Seq[Double]): Column =
    array(vars.map(v => lit(math.max(v, 1e-6))): _*)

  /** F1 over two array columns (x, x̂) with fixed per-feature variances. */
  def varNormalizedMae(x: Column, xhat: Column, vars: Seq[Double]): Column = {
    val terms = zip_with(
      zip_with(x, xhat, (a, b) => abs(a.cast("double") - b.cast("double"))),
      varArr(vars),
      (d, v) => d / v)
    aggregate(terms, lit(0.0), (acc, t) => acc + t) / lit(vars.size.toDouble)
  }

  /** F1 over scalar feature columns (no array assembly): identical
    * values to [[varNormalizedMae]] — t1+t2+…+tn left-associates exactly
    * like the fold (0.0+t1 ≡ t1) — but pure codegen'd arithmetic, no
    * interpreted higher-order evaluation. Prefer this form on hot paths
    * when features are top-level columns.
    */
  def varNormalizedMaeCols(cols: Seq[Column], xhat: Seq[Double],
                           vars: Seq[Double]): Column = {
    val terms = cols.zip(xhat).zip(vars).map { case ((c, m), v) =>
      abs(c.cast("double") - lit(m)) / lit(math.max(v, 1e-6))
    }
    terms.reduce(_ + _) / lit(vars.size.toDouble)
  }

  /** F2 over a sequence column (array of per-timestep feature arrays)
    * reconstructed against a fixed per-timestep x̂ (broadcast literal
    * array) — mean of per-timestep F1 scores.
    */
  def seqVarNormalizedMae(seq: Column, xhatStep: Seq[Double],
                          vars: Seq[Double]): Column = {
    val xhat = array(xhatStep.map(lit): _*)
    val perStep = transform(seq, step => varNormalizedMae(step, xhat, vars))
    aggregate(perStep, lit(0.0), (acc, t) => acc + t) / size(seq)
  }

  /** DuckDB oracle twins (sequential list folds, same order). */
  object Sql {
    def varNormalizedMae(x: String, xhat: String, vars: Seq[Double]): String = {
      val vlist = vars.map(v => math.max(v, 1e-6)).mkString("[", ", ", "]")
      s"(list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, ${vars.size}), i -> abs(CAST(($x)[i] AS DOUBLE) - CAST(($xhat)[i] AS DOUBLE)) / ($vlist::DOUBLE[])[i])), (acc, t) -> acc + t) / ${vars.size}.0)"
    }
  }
}

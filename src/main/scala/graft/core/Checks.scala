package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality checks — the engine-native generalization of
  * the reference's defensive validation (SURVEY.md §5: emptiness/shape
  * guards `app/AE_model.py:100-109`, NaN/Inf asserts
  * `app/LSTM_AE_enhanced.py:72-73`, per-column validity profiling
  * `lib/utils.py:187-199`).
  *
  * A check suite compiles to ONE aggregation pass over the table (every
  * check is a conditional aggregate; map-side combined, no extra
  * shuffles) plus one optional anti-join per referential check. Results
  * come back as a (check, observed, threshold, passed) table — the
  * deequ-style shape, fully SQL-expressible for the oracle.
  */
object Checks {

  sealed trait Check { def name: String }

  /** Fraction of null/NaN values in `col` must be ≤ maxFraction. */
  final case class MaxNullFraction(col: String, maxFraction: Double) extends Check {
    def name = s"null_fraction($col)"
  }

  /** All non-null values within [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range($col)"
  }

  /** Column values are unique (no duplicates). */
  final case class Unique(col: String) extends Check {
    def name = s"unique($col)"
  }

  /** Table is non-empty. */
  case object NonEmpty extends Check { def name = "non_empty" }

  /** No +-Inf/NaN in a numeric column. */
  final case class Finite(col: String) extends Check {
    def name = s"finite($col)"
  }

  private def observed(c: Check): Column = c match {
    case MaxNullFraction(cl, _) =>
      val d = col(cl).cast("double")
      // empty table → 0.0 (vacuously clean), not null
      coalesce(avg(when(col(cl).isNull || isnan(d), 1.0).otherwise(0.0)), lit(0.0))
    case InRange(cl, lo, hi) =>
      val d = col(cl).cast("double")
      count(when(d < lo || d > hi, 1)).cast("double")
    case Unique(cl) =>
      (count(col(cl)) - count_distinct(col(cl))).cast("double")
    case NonEmpty => count(lit(1)).cast("double")
    case Finite(cl) =>
      val d = col(cl).cast("double")
      count(when(isnan(d) || d === Double.PositiveInfinity ||
        d === Double.NegativeInfinity, 1)).cast("double")
  }

  private def threshold(c: Check): Double = c match {
    case MaxNullFraction(_, f) => f
    case NonEmpty => 1.0
    case _ => 0.0
  }

  private def passes(c: Check, obs: Column): Column = c match {
    case MaxNullFraction(_, f) => obs <= f
    case NonEmpty => obs >= 1.0
    case _ => obs <= 0.0
  }

  /** Run all checks in one aggregation pass.
    * Output: (check, observed, threshold, passed) ordered by check.
    */
  def run(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks")
    val aggs = checks.zipWithIndex.map { case (c, i) => observed(c).as(s"o_$i") }
    val onerow = df.agg(aggs.head, aggs.tail: _*)
    val structs = checks.zipWithIndex.map { case (c, i) =>
      struct(lit(c.name).as("check"),
        round(col(s"o_$i"), 6).as("observed"),
        lit(threshold(c)).as("threshold"),
        passes(c, col(s"o_$i")).as("passed"))
    }
    onerow.select(inline(array(structs: _*))).orderBy("check")
  }

  /** Referential-integrity check: count of `df.fkCol` values absent from
    * `ref.pkCol` (0 = intact). One anti-join; broadcast when `ref`'s key
    * set is small, shuffle-hash otherwise — Catalyst/AQE decides.
    */
  def referentialOrphans(df: DataFrame, fkCol: String,
                         ref: DataFrame, pkCol: String): Long =
    df.select(col(fkCol)).where(col(fkCol).isNotNull)
      .join(ref.select(col(pkCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
      .count()
}

package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of embedding columns — the standard memory
  * compression for a large-scale vector store (4× smaller than float32,
  * 8× smaller than float64), applied before ANN indexing so candidate
  * scans read 1 byte per dimension.
  *
  * Symmetric max-abs scheme: per-vector `scale = max|v_i| / 127`,
  * `q_i = round_half_up(v_i / scale) ∈ [−127, 127]`,
  * dequantized `v̂_i = q_i · scale`. Everything is a pure
  * higher-order-function Column expression (codegen'd, no UDFs, no
  * shuffle) — at 100 TB this is one map stage over the embedding scan.
  *
  * Determinism / oracle parity: rounding is `floor(x + 0.5)` (half
  * toward +∞) rather than engine `round()`, because floor is exact in
  * IEEE arithmetic and identical across engines, whereas round()
  * half-away-from-zero vs banker's conventions differ; division and
  * multiplication are IEEE-deterministic. An all-zero vector has
  * scale 0 and quantizes to all zeros (guarded — ANSI double division
  * by zero throws).
  *
  * Reference ties: the reference stores float embeddings raw
  * (`app/AE_model.py` latent vectors); quantization is the scale path
  * this engine adds for the 100 TB similarity-search family (q29/q30/
  * q45 read full-precision vectors; a production deployment would run
  * them over `quantize`d columns re-ranked at full precision).
  */
object Quantize {

  /** Per-vector symmetric scale: max|v_i| / 127 (double). */
  def scaleCol(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double")))) / lit(127.0)

  /** Int8 codes as array<long> (long for safe downstream sums; values
    * lie in [−127, 127]). Zero scale → all-zero codes.
    */
  def quantize(vec: Column, scale: Column): Column =
    when(scale > 0,
      transform(vec, x => floor(x.cast("double") / scale + lit(0.5)).cast("long")))
      .otherwise(transform(vec, _ => lit(0L)))

  /** Max absolute dequantization error max_i |v_i − q_i·scale| —
    * bounded by scale/2 for the symmetric scheme; surfacing it per
    * vector makes the compression loss auditable.
    */
  def dequantError(vec: Column, q: Column, scale: Column): Column =
    array_max(zip_with(vec, q,
      (v, qi) => abs(v.cast("double") - qi.cast("double") * scale)))

  /** Sequential long fold Σ q_i (order-fixed, engine-portable). */
  def codeSum(q: Column): Column =
    aggregate(q, lit(0L), (acc, x) => acc + x)

  /** Sequential long fold Σ |q_i|. */
  def codeL1(q: Column): Column =
    aggregate(q, lit(0L), (acc, x) => acc + abs(x))

  /** DuckDB twins: identical folds/arithmetic over list columns. */
  object Sql {
    def scaleCol(v: String): String =
      s"(list_max(list_transform($v, x -> abs(CAST(x AS DOUBLE)))) / 127.0)"
    def quantize(v: String, scale: String): String =
      s"(CASE WHEN $scale > 0 THEN list_transform($v, x -> CAST(floor(CAST(x AS DOUBLE) / $scale + 0.5) AS BIGINT)) ELSE list_transform($v, x -> 0::BIGINT) END)"
    def dequantError(v: String, q: String, scale: String): String =
      s"list_max(list_transform(generate_series(1, len($v)), i -> abs(CAST(($v)[i] AS DOUBLE) - CAST(($q)[i] AS DOUBLE) * $scale)))"
    def codeSum(q: String): String =
      s"list_reduce(list_prepend(0::BIGINT, $q), (acc, x) -> acc + x)"
    def codeL1(q: String): String =
      s"list_reduce(list_prepend(0::BIGINT, $q), (acc, x) -> acc + abs(x))"
  }
}

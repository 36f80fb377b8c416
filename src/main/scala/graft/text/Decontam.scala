package graft.text

import graft.dedup.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share word
  * n-gram shingles with an evaluation/benchmark set — the overlap check
  * run before LLM training so test data does not leak into the corpus
  * (the classic 13-gram decontamination; n is a parameter here).
  *
  * Scale shape: the benchmark side is SMALL by definition (eval sets),
  * so its distinct shingles broadcast; the corpus side is one shingle
  * explosion + a broadcast-hash semi join + a per-doc count with
  * map-side combine. The only corpus-wide shuffle carries (doc_id,
  * hit_count) pairs — document bodies never move, and nothing about
  * the plan changes at 1000 executors.
  */
object Decontam {

  /** Per-corpus-document overlap against the benchmark's shingle set:
    * (id, n_shingles, n_contaminated, contamination ∈ [0,1] rounded to
    * 6, null when the document has no shingles).
    */
  def contamination(corpus: DataFrame, benchmark: DataFrame,
                    idCol: String, textCol: String, n: Int): DataFrame = {
    val bsh = benchmark
      .select(explode(Dedup.shingles(col(textCol), n)).as("shingle"))
      .distinct()
    // A non-numeric or null id casts to null, the left join below then
    // never matches its hit counts, and the document silently reports
    // n_contaminated = 0 — a false NEGATIVE in a leak-safety check.
    // Fail loudly instead (same contract as GridSearch.cvThresholdGrid).
    val base = corpus.select(
      when(col(idCol).cast("long").isNull, raise_error(lit(
        "Decontam.contamination: id column cast to null — contamination join needs numeric non-null ids")))
        .otherwise(col(idCol).cast("long")).as("id"),
      Dedup.shingles(col(textCol), n).as("sh"))
    // ONE pass (r16): the previous shape joined `base` back to a
    // grouped explode of itself — a self-join that recomputed the
    // shingle expression for every document twice. explode_outer
    // keeps empty documents (one null-shingle row), the broadcast
    // LEFT join marks benchmark hits, and a single per-id aggregate
    // recovers both counts. Same numbers, half the shingle work, no
    // self-join.
    base.select(col("id"), size(col("sh")).as("n_sh"),
        explode_outer(col("sh")).as("shingle"))
      .join(broadcast(bsh.withColumn("__hit", lit(1))),
        Seq("shingle"), "left")
      .groupBy("id")
      .agg(first(col("n_sh")).cast("long").as("n_shingles"),
        count(col("__hit")).as("n_contaminated"))
      .select(col("id"), col("n_shingles"), col("n_contaminated"),
        when(col("n_shingles") > 0,
          round(col("n_contaminated").cast("double") /
            col("n_shingles").cast("double"), 6)).as("contamination"))
  }
}

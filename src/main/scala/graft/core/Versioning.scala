package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset snapshot diffing — the release-engineering side of corpus
  * curation: given two snapshots of a keyed table (yesterday's corpus
  * and today's), classify every key as added / removed / changed /
  * unchanged by content hash and summarize the churn. This is what a
  * training-data release note is made of, and the guard that catches
  * an upstream pipeline silently rewriting half the corpus.
  *
  * Scale shape: each side reduces to (id, content_hash) in its map
  * stage — bodies never shuffle — then ONE full-outer equi-join on id
  * and a tiny status aggregate. At 100 TB the diff moves 16 bytes per
  * document per side.
  */
object Versioning {

  /** Per-id diff status between snapshots. `hash` maps the content
    * column(s) to a 64-bit hash (defaults to the oracle-parity
    * polynomial text hash; pass `xxhash64(...)` for production).
    * Returns (id, status) with status ∈ added|removed|changed|unchanged.
    */
  def diffStatus(a: DataFrame, b: DataFrame, idCol: String,
                 hash: DataFrame => Column): DataFrame = {
    // presence is carried as an explicit flag per side, NOT inferred
    // from hash nullness: a key present in both snapshots with a null
    // content hash (e.g. null text) must classify as unchanged, not
    // "added", and one-sided null hashes must compare null-safely
    // (<=>) instead of falling through a null-valued === to "changed"
    val ha = a.select(col(idCol).cast("long").as("id"), hash(a).as("ha"),
      lit(true).as("pa"))
    val hb = b.select(col(idCol).cast("long").as("id"), hash(b).as("hb"),
      lit(true).as("pb"))
    ha.join(hb, Seq("id"), "full_outer")
      .select(col("id"),
        when(col("pa").isNull, lit("added"))
          .when(col("pb").isNull, lit("removed"))
          .when(col("ha") <=> col("hb"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Churn summary: (status, n) — one row per present status. */
  def diffSummary(a: DataFrame, b: DataFrame, idCol: String,
                  hash: DataFrame => Column): DataFrame =
    diffStatus(a, b, idCol, hash)
      .groupBy("status").agg(count(lit(1)).as("n"))
}

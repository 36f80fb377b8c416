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

  /** CDC merge (SCD-type-1 upsert-apply) — the other half of snapshot
    * versioning: apply a change batch (id, op ∈ I|U|D, payload, seq) to
    * a snapshot, producing the next snapshot. Semantics:
    *
    *  - per id, the LATEST change wins (highest `seqCol`; ties broken
    *    by `opCol` ascending so the result is a pure function of the
    *    data, not arrival order),
    *  - winning D deletes the id (a D for an absent id is a no-op),
    *  - winning I/U replaces-or-inserts the payload (an upsert — a U
    *    for an absent id inserts, matching MERGE WHEN NOT MATCHED).
    *
    * Scale shape: the latest-change window partitions by id (change
    * batches are small relative to snapshots and key-spread); the
    * snapshot side is touched by ONE left-anti equi-join on id — the
    * snapshot's payload never shuffles more than the join requires,
    * and with both sides bucketed by id it shuffles nothing. This is
    * exactly the shape Iceberg/Delta MERGE plans under the hood; kept
    * engine-native here since the sandbox ships no table-format jars.
    * `changes` must carry every snapshot column plus `opCol`/`seqCol`.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, idCol: String,
                   opCol: String = "op", seqCol: String = "seq"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol))
      .orderBy(col(seqCol).desc, col(opCol).asc)
    val latest = changes.withColumn("cdc_rn", row_number().over(w))
      .where(col("cdc_rn") === 1)
    val payload = snapshot.columns.toSeq
    val upserts = latest.where(col(opCol) =!= lit("D"))
      .select(payload.map(col): _*)
    snapshot.join(latest.select(col(idCol)), Seq(idCol), "left_anti")
      .unionByName(upserts)
  }

  /** Churn summary: (status, n) — one row per present status. */
  def diffSummary(a: DataFrame, b: DataFrame, idCol: String,
                  hash: DataFrame => Column): DataFrame =
    diffStatus(a, b, idCol, hash)
      .groupBy("status").agg(count(lit(1)).as("n"))
}

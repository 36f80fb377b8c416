package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HITS hubs-and-authorities (Kleinberg 1999) by DataFrame power
  * iteration over a directed edge table — the mutual-reinforcement
  * twin of [[PageRank]]: a good hub points at good authorities, a good
  * authority is pointed at by good hubs, and the fixed point is the
  * principal left/right singular-vector pair of the adjacency matrix.
  *
  * Each half-step is one equi-join of the edge table with the current
  * score vector plus one grouped aggregate — the same
  * billions-of-edges-safe shape as [[PageRank.run]] (scores and edge
  * endpoints shuffle; no adjacency collects to the driver). The L2
  * normalization after every half-step is a 1-row aggregate broadcast
  * back with a crossJoin (metadata-sized, the scalar-margin pattern).
  * Score sums accumulate through [[Stats.dsum]] (exact decimal,
  * partition-order-independent) so iterations are bitwise reproducible
  * and the SQL oracle can unroll the same half-steps as CTEs.
  *
  * Score frames `localCheckpoint(true)` every second iteration — the
  * iterative-lineage rule (planning blows up exponentially otherwise;
  * persist() does not truncate the plan).
  */
object Hits {

  /** edges: (hub, auth) directed pairs, deduplicated by the caller or
    * not (distinct applied here). Returns (hubScores(hub, h),
    * authScores(auth, a)), both L2-normalized.
    */
  def run(edges: DataFrame, iters: Int = 6,
          cacheKey: String = "hits"): (DataFrame, DataFrame) = {
    val e = edges.select(col("hub"), col("auth")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Caches.retain(cacheKey, e)
    val nH = e.select(col("hub")).distinct().count()
    var h = e.select(col("hub")).distinct()
      .select(col("hub"), lit(1.0 / math.sqrt(nH.toDouble)).as("h"))
      .localCheckpoint(true)
    var a: DataFrame = null
    for (i <- 1 to iters) {
      val ar = e.join(h, "hub").groupBy("auth")
        .agg(Stats.dsum(col("h")).as("ar"))
      val an = ar.agg(Stats.dsum(col("ar") * col("ar")).as("an2"))
      a = ar.crossJoin(broadcast(an))
        .select(col("auth"), (col("ar") / sqrt(col("an2"))).as("a"))
      val hr = e.join(a, "auth").groupBy("hub")
        .agg(Stats.dsum(col("a")).as("hr"))
      val hn = hr.agg(Stats.dsum(col("hr") * col("hr")).as("hn2"))
      h = hr.crossJoin(broadcast(hn))
        .select(col("hub"), (col("hr") / sqrt(col("hn2"))).as("h"))
      if (i % 2 == 0 || i == iters) {
        a = a.localCheckpoint(true)
        h = h.localCheckpoint(true)
      }
    }
    (h, a)
  }
}

package graft.sim

import graft.core.Stats
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group embedding centroids — class prototypes: the aggregation
  * behind prototype classifiers, cluster summaries, and per-source
  * embedding monitoring (is source X's embedding mass moving?).
  *
  * Plan shape: posexplode to (group, dim, value) — a NARROW row per
  * vector component — then one (group, dim) aggregate with map-side
  * combine. The shuffle carries ≤ groups × dim aggregate rows per
  * mapper, never the vectors themselves. Component sums use
  * DECIMAL(38,10) partials (the engine-wide convention for shuffled
  * additive aggregates), so the centroid is partition-order
  * independent and oracle-exact.
  */
object Centroids {

  /** (group, dim, mean, n) — one row per group per vector component;
    * `dim` is 1-based. All vectors in a group must share a dimension
    * (posexplode makes ragged inputs visible as differing n per dim —
    * see [[graft.core.SchemaAlign.padFeatures]] for the guard/pad).
    */
  def labelCentroids(df: DataFrame, groupCol: String,
                     vecCol: String): DataFrame =
    df.select(col(groupCol).as("group"), posexplode(col(vecCol)))
      .groupBy(col("group"), (col("pos") + 1).cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        (Stats.dsum(col("col")) / count(lit(1))).as("mean"))

  /** DuckDB twin of the (group, dim) mean table. */
  object Sql {
    def labelCentroids(rel: String, group: String, vec: String): String =
      s"""SELECT $group AS "group", CAST(dim AS BIGINT) AS dim, count(*) AS n,
         | ${Stats.Sql.dsum(s"CAST($vec[dim] AS DOUBLE)")} / count(*) AS mean
         | FROM (SELECT $group, unnest(generate_series(1, len($vec))) AS dim, $vec
         |   FROM $rel)
         | GROUP BY $group, dim""".stripMargin.replaceAll("\n", " ")
  }
}

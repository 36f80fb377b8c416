package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the round-6/7 advisory question: would the profile
  * family (q02/q03/q14/q16 — each scanning the same few lineitem
  * numeric columns) win from one shared, persisted pruned slice?
  *
  * Measures, at a given SF: (a) the pruned-scan cost alone (what
  * sharing could save per query), (b) each query end-to-end, (c) the
  * same composite with a persisted slice warmed first.
  * Usage: runMain graft.tools.SharedScanAb <sfDir>
  */
object SharedScanAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val family = Seq("q02_profile", "q03_quantiles", "q14_impute_median",
      "q16_clip")
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def r(v: Double): Double = math.round(v * 1000) / 1000.0
    // warmup (codegen/JIT)
    family.foreach(q => graft.SparkEntry.queries(q)(spark, sfDir).count())
    graft.core.Caches.releaseAll(); System.gc()
    // (a) the pruned scan alone — the most sharing could save per reuse
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val scanSec = time(spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(cols.map(col): _*).agg(count(lit(1))).collect())
    // (b) family end-to-end, cold caches per query (bench protocol)
    val cold = family.map { q =>
      graft.core.Caches.releaseAll(); System.gc()
      q -> r(time(graft.SparkEntry.queries(q)(spark, sfDir).count()))
    }
    // (c) retained-cache leg: persist NOTHING up front, just stop
    // releasing each query's own Caches.retain working set between
    // queries — isolates how much of any "warm" win is intra-family
    // cache retention rather than the shared slice
    graft.core.Caches.releaseAll(); System.gc()
    val retained = family.map { q =>
      q -> r(time(graft.SparkEntry.queries(q)(spark, sfDir).count()))
    }
    // (d) family with a shared persisted slice warmed first (caches
    // also retained between queries, as in a real composite session)
    graft.core.Caches.releaseAll(); System.gc()
    val slice = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(cols.map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val warmSec = time(slice.count())
    val warm = family.map { q =>
      q -> r(time(graft.SparkEntry.queries(q)(spark, sfDir).count()))
    }
    slice.unpersist()
    println(s"""{"sf":"$sfDir","pruned_scan_sec":${r(scanSec)},""" +
      s""""slice_warm_sec":${r(warmSec)},""" +
      s""""cold":{${cold.map { case (k, v) => s""""$k":$v""" }.mkString(",")}},""" +
      s""""retained":{${retained.map { case (k, v) => s""""$k":$v""" }.mkString(",")}},""" +
      s""""warm":{${warm.map { case (k, v) => s""""$k":$v""" }.mkString(",")}}}""")
    spark.stop()
  }
}

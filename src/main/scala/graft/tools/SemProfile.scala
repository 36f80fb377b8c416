package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch stage profiler for q198 (SemDeDup) — times each stage at a
  * given SF dir so the ScaleAb exponent work targets the real cost,
  * not a guess. Not part of the driver contract. */
object SemProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/scaleab_10x_r14")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.dedup.SemDedup
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = e.count()
    val k = SemDedup.kForCorpus(n)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[semprofile] $label%-22s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    System.err.println(s"[semprofile] n=$n k=$k")
    (1 to 2).foreach { rep =>
      System.err.println(s"[semprofile] -- rep $rep --")
      graft.core.Caches.releaseAll()
      val assigned = time("assign+persist") {
        val a = SemDedup.assign(e, "vec_id", "embedding", k)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        a.count(); a
      }
      time("assign_ok agg") {
        assigned.agg(count(when(col("cluster") === col("cluster_check"), 1)))
          .collect()
      }
      val capped = time("capBuckets+persist") {
        val c = SemDedup.capBuckets(assigned, 64, 64)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        c.count(); c
      }
      val pairs = time("clusterPairs+persist") {
        val p = SemDedup.clusterPairs(capped)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        System.err.println(s"[semprofile] n_pairs=${p.count()}")
        p
      }
      time("prunedIds") {
        SemDedup.prunedIds(pairs, 0.45).count()
      }
      assigned.unpersist(); capped.unpersist(); pairs.unpersist()
    }
    spark.stop()
  }
}

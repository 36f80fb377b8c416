package graft.tools
// scratch: A/B the q290 AUC tail — 3-partition window vs per-method
// two-phase prefix scan — over the same cached byScore frame, with an
// exact result-equality check. Usage: runMain graft.tools.Q290Auc [sfDir]
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object Q290Auc {
  def main(args: Array[String]): Unit = {
    val dir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/lineitem.parquet").limit(1000)
      .agg(sum("l_quantity")).collect()
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s"); r
    }
    // rebuild scored exactly as the entry does, via the entry itself:
    // run the full query once so its caches are warm, then grab the
    // byScore shape from scratch over a synthetic rebuild
    val fn = graft.SparkEntry.queries("q290_link_prediction")
    t("entry cold (fills caches)")(noop(fn(spark, dir)))
    // rebuild the same lineage: the entry's persisted frames are
    // plan-matched by the CacheManager, so this reads the warm caches
    import graft.aug.Sampling.keyBucket
    import graft.core.Stats
    import org.apache.spark.sql.types.DoubleType
    val s = spark
    val raw = graft.SparkEntry.li(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").cast("long").as("pk"))
    val kk = raw.agg(
      (ceil(sqrt(countDistinct(col("ok")))).cast("long") * lit(6L)).as("k"))
    val ob = raw.crossJoin(broadcast(kk))
      .select(col("ok"), (col("pk") % col("k")).as("pk")).distinct()
    val co = ob.toDF("ok", "p1")
      .join(ob.toDF("ok2", "p2"), col("ok") === col("ok2") && col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("npair"))
      .where(col("npair") >= 2)
      .withColumn("test",
        keyBucket((col("p1") * lit(1000003L) + col("p2")) % lit(1000000007L),
          83L) < lit(200000L))
    val trainE = co.where(!col("test")).select("p1", "p2")
    val adj = trainE.union(trainE.select(col("p2"), col("p1"))).toDF("a", "b")
    val deg = adj.groupBy("a").agg(count(lit(1)).as("dg"))
    val mids = adj.toDF("x", "m")
      .join(adj.toDF("mm", "y"), col("m") === col("mm"))
      .where(col("x") < col("y")).select("x", "m", "y")
      .join(deg.select(col("a").as("m"), col("dg").as("dgm")), Seq("m"))
    val pairScores = mids.groupBy("x", "y").agg(
      count(lit(1)).as("cn"),
      round(Stats.dsum(lit(1.0) / log(col("dgm").cast(DoubleType))), 6).as("aa"))
    val scored = pairScores
      .join(trainE.select(col("p1").as("x"), col("p2").as("y"),
        lit(1).as("istr")), Seq("x", "y"), "left")
      .where(col("istr").isNull).drop("istr")
      .join(co.where(col("test")).select(col("p1").as("x"), col("p2").as("y"),
        lit(1).as("pos")), Seq("x", "y"), "left")
      .na.fill(0, Seq("pos"))
      .join(deg.select(col("a").as("x"), col("dg").as("dgx")), Seq("x"))
      .join(deg.select(col("a").as("y"), col("dg").as("dgy")), Seq("y"))
      .withColumn("jac", round(col("cn").cast(DoubleType) /
        (col("dgx") + col("dgy") - col("cn")).cast(DoubleType), 6))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("scored materialize (warm?)")(noop(scored))
    val long = scored.select(lit("cn").as("method"),
        col("cn").cast(DoubleType).as("score"), col("pos"))
      .unionByName(scored.select(lit("jaccard").as("method"),
        col("jac").as("score"), col("pos")))
      .unionByName(scored.select(lit("adamic_adar").as("method"),
        col("aa").as("score"), col("pos")))
    val byScore = long.groupBy("method", "score").agg(
      sum(col("pos")).cast("long").as("np"),
      sum(lit(1) - col("pos")).cast("long").as("nn"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("byScore materialize")(noop(byScore))
    // ---- variant A: the current 3-partition window ----
    def variantA(): DataFrame = {
      val w = Window.partitionBy("method").orderBy("score")
        .rowsBetween(Window.unboundedPreceding, -1)
      byScore
        .withColumn("cum_nn", coalesce(sum("nn").over(w), lit(0L)))
        .withColumn("won2",
          lit(2L) * col("np") * col("cum_nn") + col("np") * col("nn"))
        .groupBy("method").agg(sum("np").as("n_pos"),
          sum("nn").as("n_neg"), sum("won2").as("won2"))
    }
    // ---- variant B: per-method two-phase prefix scan ----
    def variantB(): DataFrame =
      Seq("cn", "jaccard", "adamic_adar").map { m =>
        val one = byScore.where(col("method") === m)
          .select(col("score"), col("np"), col("nn"))
        val (scanned, _) = graft.core.PrefixScan.exclusive(
          one, "score", Seq("nn"), s"q290.auc.$m")
        scanned
          .withColumn("won2",
            lit(2L) * col("np") * col("cum_nn_below") + col("np") * col("nn"))
          .agg(sum("np").as("n_pos"), sum("nn").as("n_neg"),
            sum("won2").as("won2"))
          .select(lit(m).as("method"), col("n_pos"), col("n_neg"), col("won2"))
      }.reduce(_ unionByName _)
    (1 to 3).foreach { i => t(s"A window+agg rep $i")(noop(variantA())) }
    (1 to 3).foreach { i => t(s"B prefix-scan rep $i")(noop(variantB())) }
    val a = variantA().orderBy("method").collect().map(_.toSeq).toSeq
    val b = variantB().orderBy("method").collect().map(_.toSeq).toSeq
    println(s"  A = $a")
    println(s"  B = $b")
    println(s"  EQUAL = ${a == b}")
    spark.stop()
  }
}

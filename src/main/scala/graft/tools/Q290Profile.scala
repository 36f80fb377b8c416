package graft.tools
// scratch: stage-level wall-time attribution for q290_link_prediction.
// Rebuilds the query's pipeline with a noop action after each stage so
// the incremental cost of every stage is visible (caches warm between
// steps exactly like a bench rep). Usage: runMain graft.tools.Q290Profile [sfDir]
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import org.apache.spark.sql.expressions.Window
import graft.aug.Sampling.keyBucket
import graft.core.Stats
object Q290Profile {
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
    val s = spark
    val raw = graft.SparkEntry.li(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").cast("long").as("pk"))
    val kk = raw.agg(
      (ceil(sqrt(countDistinct(col("ok")))).cast("long") * lit(6L)).as("k"))
    val ob = raw.crossJoin(broadcast(kk))
      .select(col("ok"), (col("pk") % col("k")).as("pk"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("ob materialize")(noop(ob))
    println(s"  ob rows = ${ob.count()}")
    val co = ob.toDF("ok", "p1")
      .join(ob.toDF("ok2", "p2"), col("ok") === col("ok2") && col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("npair"))
      .where(col("npair") >= 2)
      .withColumn("test",
        keyBucket((col("p1") * lit(1000003L) + col("p2")) % lit(1000000007L),
          83L) < lit(200000L))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("co (pair join)")(noop(co))
    println(s"  co rows = ${co.count()}")
    val trainE = co.where(!col("test")).select("p1", "p2")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val adj = trainE.union(trainE.select(col("p2"), col("p1"))).toDF("a", "b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("trainE+adj")(noop(adj))
    println(s"  adj rows = ${adj.count()}")
    val deg = adj.groupBy("a").agg(count(lit(1)).as("dg"))
    val mids = adj.toDF("x", "m")
      .join(adj.toDF("mm", "y"), col("m") === col("mm"))
      .where(col("x") < col("y")).select("x", "m", "y")
      .join(deg.select(col("a").as("m"), col("dg").as("dgm")), Seq("m"))
    val pairScores = mids.groupBy("x", "y").agg(
      count(lit(1)).as("cn"),
      round(Stats.dsum(lit(1.0) / log(col("dgm").cast(DoubleType))), 6).as("aa"))
    t("mids+pairScores")(noop(pairScores))
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
    t("scored (4 joins)")(noop(scored))
    println(s"  scored rows = ${scored.count()}")
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
    t("byScore groupBy")(noop(byScore))
    println(s"  byScore rows = ${byScore.count()}")
    val w = Window.partitionBy("method").orderBy("score")
      .rowsBetween(Window.unboundedPreceding, -1)
    val won = byScore
      .withColumn("cum_nn", coalesce(sum("nn").over(w), lit(0L)))
      .withColumn("won2",
        lit(2L) * col("np") * col("cum_nn") + col("np") * col("nn"))
    val agg = won.groupBy("method").agg(sum("np").as("n_pos"),
      sum("nn").as("n_neg"), sum("won2").as("won2"))
    t("window+agg")(noop(agg))
    val testTotal = co.where(col("test")).agg(count(lit(1)).as("n_test_total"))
    val fin = agg.crossJoin(broadcast(testTotal))
      .select(col("method"), col("n_pos"), col("n_neg"), col("n_test_total"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          round(col("won2").cast(DoubleType) /
            (lit(2.0) * col("n_pos").cast(DoubleType) *
              col("n_neg").cast(DoubleType)), 6)).as("auc"))
      .orderBy("method")
    t("final")(noop(fin))
    // warm full rep through the real entry (caches from above are NOT
    // shared — the entry builds its own persists; this times a cold
    // entry rep then a warm one for reference)
    graft.core.Caches.releaseAll(); spark.sql("CLEAR CACHE")
    val fn = graft.SparkEntry.queries("q290_link_prediction")
    t("entry rep 1 (cold)")(noop(fn(s, dir)))
    t("entry rep 2 (warm)")(noop(fn(s, dir)))
    t("entry rep 3 (warm)")(noop(fn(s, dir)))
    spark.stop()
  }
}

package graft

import graft.score.{IsolationForest, LinearAE}
import graft.sources.Persist
import org.apache.spark.sql.functions._

class ModelSpec extends SparkSpec {
  import spark.implicits._

  /** Tight cluster around (0,0) + one far outlier. */
  private def planted(n: Int) = {
    val rows = (0 until n).map { i =>
      (i.toLong, Seq((i % 7) * 0.01, (i % 5) * 0.01))
    } :+ (n.toLong, Seq(50.0, 50.0))
    rows.toDF("id", "features")
  }

  test("isolation forest scores a planted outlier highest") {
    val df = planted(200)
    val m = IsolationForest.fit(df, "id", "features", numTrees = 100,
      maxSamples = 16, poolSize = 201)
    val scored = m.transform(df, "features").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("if_score"))
    val top = scored.maxBy(_._2)._1
    assert(top == 200L, s"outlier not top-scored (top=$top)")
    scored.foreach { case (_, s) => assert(s > 0.0 && s <= 1.0) }
  }

  test("isolation forest is deterministic for a fixed seed") {
    val df = planted(100)
    val s1 = IsolationForest.fit(df, "id", "features", 50, 16, 101, seed = 7L)
      .transform(df, "features").select("if_score").as[Double].collect()
    val s2 = IsolationForest.fit(df, "id", "features", 50, 16, 101, seed = 7L)
      .transform(df, "features").select("if_score").as[Double].collect()
    assert(s1.toSeq == s2.toSeq)
  }

  test("codegen forest scoring is bitwise-identical to the UDF baseline") {
    val df = planted(300)
    val m = IsolationForest.fit(df, "id", "features", numTrees = 80,
      maxSamples = 16, poolSize = 301)
    val fast = m.transform(df, "features").orderBy("id")
      .select("if_score").as[Double].collect()
    val slow = m.udfTransform(df, "features").orderBy("id")
      .select("if_score").as[Double].collect()
    assert(fast.length == slow.length)
    fast.zip(slow).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("isolation forest c(n) matches known values") {
    assert(IsolationForest.c(1) == 0.0)
    assert(math.abs(IsolationForest.c(2) - 0.15443133) < 1e-6)
    assert(IsolationForest.c(256) > IsolationForest.c(16))
  }

  test("linear AE: zero reconstruction error on in-subspace data") {
    // rank-1 data along (1,1,0)
    val df = (0 until 100).map(i => (i.toLong, Seq(i * 0.1, i * 0.1, 0.0)))
      .toDF("id", "features")
    val m = LinearAE.fit(df, "id", "features", k = 1, sampleSize = 100)
    val errs = m.transform(df, "features").select("recon_error").as[Double].collect()
    errs.foreach(e => assert(e < 1e-10, s"unexpected recon error $e"))
  }

  test("linear AE: off-subspace outlier scores highest") {
    val rows = (0 until 100).map(i => (i.toLong, Seq(i * 0.1, i * 0.1, 0.0))) :+
      (100L, Seq(1.0, 1.0, 25.0))
    val df = rows.toDF("id", "features")
    val m = LinearAE.fit(df, "id", "features", k = 1, sampleSize = 101)
    val scored = m.transform(df, "features").collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[Double]("recon_error"))
    assert(scored.maxBy(_._2)._1 == 100L)
  }

  test("linear AE components are orthonormal") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .withColumn("features", col("embedding").cast("array<double>"))
    val m = LinearAE.fit(emb, "vec_id", "features", k = 4)
    for (i <- m.components.indices; j <- i until m.components.length) {
      val d = m.components(i).zip(m.components(j)).map { case (a, b) => a * b }.sum
      if (i == j) assert(math.abs(d - 1.0) < 1e-8)
      else assert(math.abs(d) < 1e-6, s"components $i,$j not orthogonal: $d")
    }
  }

  test("persistence round-trips: threshold, forest, linear AE") {
    val dir = Files.tmp()
    Persist.saveThreshold(s"$dir/thr.txt", 16739.8548828125)
    assert(Persist.loadThreshold(s"$dir/thr.txt") == 16739.8548828125)

    val df = planted(80)
    val ifm = IsolationForest.fit(df, "id", "features", 20, 16, 81)
    Persist.saveIsolationForest(s"$dir/if.txt", ifm)
    val ifm2 = Persist.loadIsolationForest(s"$dir/if.txt")
    val x = Array(0.02, 0.03)
    assert(ifm.score(x) == ifm2.score(x))
    assert(ifm2.sampleSize == ifm.sampleSize)

    val aem = LinearAE.fit(df, "id", "features", k = 2, sampleSize = 81)
    Persist.saveLinearAE(s"$dir/ae.txt", aem)
    val aem2 = Persist.loadLinearAE(s"$dir/ae.txt")
    assert(aem.reconstructionError(x) == aem2.reconstructionError(x))
  }
}

private object Files {
  def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-model-spec").toString
}

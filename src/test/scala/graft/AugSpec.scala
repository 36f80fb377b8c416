package graft

import graft.aug.{Sampling, Smote}
import org.apache.spark.sql.functions._

class AugSpec extends SparkSpec {
  import spark.implicits._

  private lazy val li = spark.read.parquet(s"$sf/lineitem.parquet")

  test("hashSample is deterministic and roughly proportional") {
    val a = Sampling.hashSample(li, "l_orderkey", 0.1).count()
    val b = Sampling.hashSample(li, "l_orderkey", 0.1).count()
    assert(a == b)
    val total = li.count()
    assert(a > total * 0.03 && a < total * 0.25, s"sampled $a of $total")
  }

  test("hashSample is stable under reordering (content-addressed)") {
    val a = Sampling.hashSample(li, "l_orderkey", 0.1)
      .select("l_orderkey", "l_linenumber").collect().map(_.toString).sorted
    val b = Sampling.hashSample(li.orderBy(desc("l_extendedprice")), "l_orderkey", 0.1)
      .select("l_orderkey", "l_linenumber").collect().map(_.toString).sorted
    assert(a.toSeq == b.toSeq)
  }

  test("seeded sample/shuffle are reproducible for a fixed seed") {
    val s1 = Sampling.seededSample(li, 0.05, 42L).count()
    val s2 = Sampling.seededSample(li, 0.05, 42L).count()
    assert(s1 == s2 && s1 > 0)
    val o1 = Sampling.shuffle(li.limit(500), 42L).select("l_orderkey").collect()
    val o2 = Sampling.shuffle(li.limit(500), 42L).select("l_orderkey").collect()
    assert(o1.toSeq == o2.toSeq)
  }

  test("stratifiedSample respects per-class fractions approximately") {
    val s = Sampling.stratifiedSample(li, "l_returnflag",
      Map[Any, Double]("R" -> 0.2, "A" -> 0.0, "N" -> 0.0), 42L)
    val flags = s.select("l_returnflag").distinct().as[String].collect().toSet
    assert(flags == Set("R"))
  }

  test("smote: target count, u in [0,1), synthetic vec between endpoints") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val out = Smote.oversample(emb, "vec_id", "embedding",
      col("label") === 1, k = 3, target = 20).collect()
    assert(out.length == 20)
    out.foreach { r =>
      val u = r.getAs[Double]("u")
      assert(u >= 0.0 && u < 1.0)
      assert(r.getAs[Long]("a") != r.getAs[Long]("b"))
      assert(r.getSeq[Double](r.fieldIndex("vec")).length == 64)
    }
  }

  test("smote interpolation is exact: vec = va + u*(vb-va)") {
    val tiny = Seq(
      (1L, Seq(0.0f, 0.0f), 1), (2L, Seq(1.0f, 2.0f), 1), (3L, Seq(4.0f, 4.0f), 1),
      (4L, Seq(9.0f, 9.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val out = Smote.oversample(tiny, "vec_id", "embedding",
      col("label") === 1, k = 2, target = 6).collect()
    assert(out.length == 6)
    out.foreach { r =>
      val u = r.getAs[Double]("u")
      val vec = r.getSeq[Double](r.fieldIndex("vec"))
      val va = Map(1L -> Seq(0.0, 0.0), 2L -> Seq(1.0, 2.0), 3L -> Seq(4.0, 4.0))
      val a = va(r.getAs[Long]("a")); val b = va(r.getAs[Long]("b"))
      vec.indices.foreach { i =>
        assert(math.abs(vec(i) - (a(i) + u * (b(i) - a(i)))) < 1e-12)
      }
    }
  }

  test("smote: k larger than the minority still yields every target row") {
    val tiny = Seq(
      (1L, Seq(0.0f, 0.0f), 1), (2L, Seq(1.0f, 2.0f), 1), (3L, Seq(9.0f, 9.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    // minority has 2 rows (1 neighbor each); k=5 must clamp, not drop rows
    val out = Smote.oversample(tiny, "vec_id", "embedding",
      col("label") === 1, k = 5, target = 8)
    assert(out.count() == 8)
  }

  test("balance yields original + synthetic rows of the minority class") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val n0 = emb.count()
    val out = Smote.balance(emb, "vec_id", "embedding", "label",
      minorityValue = 1, k = 3, target = 15)
    assert(out.count() == n0 + 15)
    // synthetic ids start past the real id range (no collisions)
    val maxReal = emb.agg(max(col("vec_id").cast("long"))).head().getLong(0)
    assert(out.where(col("vec_id") > maxReal).count() == 15)
  }

  test("hashStratifiedSample: per-class fractions, unlisted classes dropped") {
    import spark.implicits._
    val s = Sampling.hashStratifiedSample(li, "l_returnflag", "l_orderkey",
      Map("R" -> 0.5, "N" -> 0.1), 42L)
    val counts = s.groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toMap
    assert(!counts.contains("A"), "class without a fraction must be dropped")
    val totals = li.groupBy("l_returnflag").count()
      .as[(String, Long)].collect().toMap
    assert(counts("R") > totals("R") * 0.3 && counts("R") < totals("R") * 0.7)
    assert(counts("N") < totals("N") * 0.3)
    // per-class stratum == the single-fraction hash sample restricted to
    // that class (same key bucket): strata stay join-consistent
    val viaGlobal = Sampling.hashSample(
      li.where(col("l_returnflag") === "R"), "l_orderkey", 0.5, 42L).count()
    assert(counts("R") == viaGlobal)
  }

  test("negativeSamples: known hash draws, self-collision bump, k per anchor") {
    val ids = (0L until 5L).toDF("id")
    val out = Sampling.negativeSamples(ids, "id", k = 2, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // ((a·2654435761 + j·40503 + 7) mod P) mod 5; (0,1) and (2,1) hit
    // the anchor and bump, (4,1) bumps and wraps to 0
    assert(out == Map((0L, 0L) -> 2L, (0L, 1L) -> 1L, (1L, 0L) -> 4L,
      (1L, 1L) -> 2L, (2L, 0L) -> 4L, (2L, 1L) -> 3L, (3L, 0L) -> 1L,
      (3L, 1L) -> 4L, (4L, 0L) -> 1L, (4L, 1L) -> 0L))
    // seed 0: anchor 0, j 0 → raw 0 = self → bumped to 1
    val bump = Sampling.negativeSamples(ids, "id", k = 1, seed = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(bump(0L) == 1L)
    // every anchor gets exactly k rows, never itself
    val big = Sampling.negativeSamples((0L until 100L).toDF("id"), "id", k = 4)
    assert(big.count() == 400L)
    assert(big.where(col("neg_id") === col("anchor")).count() == 0L)
    assert(big.where(col("neg_id") < 0 || col("neg_id") >= 100).count() == 0L)
    // no systematic stride collapse when n shares a factor with the
    // j-multiplier (the old (a·131 + j·977) mod n drew k IDENTICAL
    // negatives for every anchor at n = 977)
    val deg = Sampling.negativeSamples((0L until 977L).toDF("id"), "id", k = 4)
      .groupBy("anchor").agg(countDistinct("neg_id").as("nd"))
    val dist = deg.agg(avg("nd")).head.getDouble(0)
    assert(dist > 3.9, s"degenerate draws: avg distinct negatives $dist of 4")
  }

  test("temperatureSample upsamples low-resource classes (alpha=0.5 math)") {
    // a: 100 rows, b: 400 rows; N_target = 250, sw = 10 + 20 = 30
    // → rate_a = 250·10/(30·100) = 0.8333, rate_b = 250·20/(30·400) = 0.4167
    val df = ((1 to 100).map(i => ("a", i.toLong)) ++
      (1 to 400).map(i => ("b", 1000L + i))).toDF("cls", "id")
    val kept = Sampling.temperatureSample(df, "cls", "id",
        targetFraction = 0.5)
      .groupBy("cls").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fa = kept("a") / 100.0
    val fb = kept("b") / 400.0
    // hash-bucket sampling tracks the computed rates closely
    assert(math.abs(fa - 0.8333) < 0.08, s"rate_a off: $fa")
    assert(math.abs(fb - 0.4167) < 0.08, s"rate_b off: $fb")
    // the whole point: the low-resource class keeps ~2× the rate
    assert(fa / fb > 1.6, s"no upsampling: $fa vs $fb")
    // determinism across runs
    val again = Sampling.temperatureSample(df, "cls", "id", 0.5)
      .groupBy("cls").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again == kept)
    // targetFraction 1.0 with equal classes keeps everything (rate 1)
    val eq = ((1 to 50).map(i => ("x", i.toLong)) ++
      (1 to 50).map(i => ("y", 100L + i))).toDF("cls", "id")
    assert(Sampling.temperatureSample(eq, "cls", "id", 1.0).count() == 100L)
    // null classes are dropped, not an NPE on the driver
    val withNull = (Seq((null.asInstanceOf[String], 900L)) ++
      (1 to 50).map(i => ("x", i.toLong))).toDF("cls", "id")
    val kept2 = Sampling.temperatureSample(withNull, "cls", "id", 1.0)
    assert(kept2.where(col("cls").isNull).count() == 0L)
    assert(kept2.count() == 50L)
  }

  test("splitAssign: stable 3-way partition, rest label, fraction bounds") {
    val df = (0L until 1000L).toDF("id")
    val out = Sampling.splitAssign(df, "id",
        Seq("train" -> 0.5, "val" -> 0.3), restLabel = "rest")
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out.values.sum == 1000L) // total partition: nothing dropped
    assert(math.abs(out("train") - 500L) < 60, s"train ${out("train")}")
    assert(math.abs(out("val") - 300L) < 60, s"val ${out("val")}")
    assert(math.abs(out("rest") - 200L) < 60, s"rest ${out("rest")}")
    // no rest label → remainder rows are dropped
    val dropped = Sampling.splitAssign(df, "id",
      Seq("train" -> 0.5, "val" -> 0.3)).count()
    assert(dropped == out("train") + out("val"))
    // join stability: a filtered subset keeps identical assignments
    val full = Sampling.splitAssign(df, "id", Seq("train" -> 0.8),
        restLabel = "eval")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val subset = Sampling.splitAssign(df.where(col("id") % 3 === 0), "id",
        Seq("train" -> 0.8), restLabel = "eval")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    subset.foreach { case (k, s) => assert(full(k) == s) }
    // fractions that sum to exactly 1 but truncate individually (three
    // 1/3 splits) must still cover every bucket: cumulative-rounded
    // bounds, so NO rows drop even with no rest label
    val thirds = Sampling.splitAssign(df, "id",
      Seq("a" -> 1.0 / 3, "b" -> 1.0 / 3, "c" -> 1.0 / 3))
    assert(thirds.count() == 1000L)
  }

  test("capPerGroup: cap respected, deterministic, counted path identical") {
    val df = (1L to 300L).map(i => (s"g${i % 7}", i)).toDF("grp", "id")
    val capped = Sampling.capPerGroup(df, "grp", "id", cap = 10)
    val byGrp = capped.groupBy("grp").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byGrp.values.forall(_ == 10L), s"per-group counts: $byGrp")
    // deterministic: same rows on re-run
    val a = capped.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val b = Sampling.capPerGroup(df, "grp", "id", cap = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(a == b)
    // survivors are stable when the group grows: a kept id stays kept
    // unless out-ranked — subsetting other groups never changes this one
    val g0 = a.filter(_._1 == "g0")
    val g0Sub = Sampling.capPerGroup(df.where(col("grp") === "g0"), "grp",
      "id", cap = 10).collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(g0 == g0Sub)
    // counted path (small-group bypass) is row-identical, including
    // groups under the cap passing through untouched
    val mixed = df.where(col("id") <= 150 || col("grp") === "g1")
    val plain = Sampling.capPerGroup(mixed, "grp", "id", cap = 18)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val counted = Sampling.capPerGroupCounted(mixed, "grp", "id", cap = 18)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(plain == counted)
  }

  test("weightedSample: k rows, deterministic, weight-monotone inclusion") {
    val df = (1L to 1000L).map(i => (i, (i % 10 + 1).toDouble)).toDF("id", "w")
    val a = Sampling.weightedSample(df, "id", "w", k = 100)
      .collect().map(_.getLong(0)).toSet
    assert(a.size == 100)
    val b = Sampling.weightedSample(df, "id", "w", k = 100)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // zero/negative/null weights can never win
    val z = Seq((1L, 0.0), (2L, -3.0), (3L, 1e-9)).toDF("id", "w")
    val zs = Sampling.weightedSample(z, "id", "w", k = 3)
      .collect().map(_.getLong(0)).toSet
    assert(zs == Set(3L))
    // proportionality (statistical, deterministic given the hash):
    // weight-10 ids should beat weight-1 ids decisively in the sample
    val byW = Sampling.weightedSample(df, "id", "w", k = 200)
      .collect().map(r => r.getDouble(1)).groupBy(identity).view.mapValues(_.length)
    assert(byW.getOrElse(10.0, 0) > byW.getOrElse(1.0, 0),
      s"weight-10 (${byW.getOrElse(10.0, 0)}) should outdraw weight-1 (${byW.getOrElse(1.0, 0)})")
  }

  test("labelCentroids: exact component means per group") {
    val vecs = Seq(
      ("a", Seq(1.0f, 2.0f)), ("a", Seq(3.0f, 4.0f)), ("b", Seq(5.0f, 6.0f))
    ).toDF("label", "embedding")
    val out = graft.sim.Centroids.labelCentroids(vecs, "label", "embedding")
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map(("a", 1L) -> ((2L, 2.0)), ("a", 2L) -> ((2L, 3.0)),
      ("b", 1L) -> ((1L, 5.0)), ("b", 2L) -> ((1L, 6.0))))
  }

  test("poisson bootstrap CI brackets the mean, deterministically, layout-independent") {
    import graft.aug.Bootstrap
    val rows = (1L to 2000L).map(k => (k, 50.0 + (k % 100).toDouble))
    val df = rows.toDF("k", "x")
    val r1 = Bootstrap.meanCi(df, "k", "x", replicates = 40,
      alpha = 0.025, seed = 42L).head()
    val r2 = Bootstrap.meanCi(df.repartition(7), "k", "x", replicates = 40,
      alpha = 0.025, seed = 42L).head()
    assert(r1 === r2, "hash-derived weights must be layout-independent")
    val (est, lo, hi) = (r1.getDouble(0), r1.getDouble(1), r1.getDouble(2))
    assert(lo < est && est < hi, s"CI [$lo, $hi] must bracket estimate $est")
    // CI width for iid uniform-ish data with n=2000: a few std errors
    assert(hi - lo < 10.0 && hi - lo > 0.1, s"implausible CI width ${hi - lo}")
    assert(r1.getLong(3) === 2000L && r1.getLong(4) === 40L)
  }

  test("poisson bootstrap weights average to ~1 per replicate") {
    import graft.aug.Bootstrap
    // the thresholds are a partition of [0, M): weight k has mass
    // ≈ e^{-1}/k!; the empirical mean over many keys must be ≈ 1
    val df = (1L to 5000L).map(k => (k, 1.0)).toDF("k", "x")
    val means = Bootstrap.meanCi(df, "k", "x", replicates = 10,
      alpha = 0.1, seed = 7L)
    // estimate of constant-1 data is 1; replicate means of constant
    // data are also exactly 1 regardless of weights => CI collapses
    val r = means.head()
    assert(r.getDouble(0) === 1.0 && r.getDouble(1) === 1.0 &&
      r.getDouble(2) === 1.0)
  }
}

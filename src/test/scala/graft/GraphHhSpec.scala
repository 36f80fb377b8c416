package graft

import graft.core.{HeavyHitters, PageRank}
import org.apache.spark.sql.functions._

/** Specs for the heavy-hitter sketch-prune and the PageRank power
  * iteration.
  */
class GraphHhSpec extends SparkSpec {
  import spark.implicits._

  test("heavy hitters finds exactly the items above n/k on a planted skew") {
    // 1000 rows: 'a' 400, 'b' 300, 'c' 200, 100 singletons: k = 5
    // (threshold 200) → heavy = a, b (c == n/k is NOT strictly above)
    val rows = Seq.fill(400)("a") ++ Seq.fill(300)("b") ++
      Seq.fill(200)("c") ++ (1 to 100).map(i => s"u$i")
    val df = rows.toDF("item").repartition(8)
    val got = HeavyHitters.exact(df, "item", 5).collect()
    assert(got.map(_.getString(0)).toSeq === Seq("a", "b"))
    assert(got.map(r => r.getString(0) -> r.getLong(1)).toMap ===
      Map("a" -> 400L, "b" -> 300L))
    assert(got.head.getDouble(2) === 0.4)
  }

  test("misra-gries candidates form a superset of the true heavy hitters") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 5000).map(_ => s"t${rnd.nextInt(500)}") ++
      Seq.fill(800)("hot1") ++ Seq.fill(600)("hot2")
    val df = rows.toDF("item").repartition(16)
    val cand = HeavyHitters.candidates(df, "item", 10).toSet
    assert(cand.contains("hot1") && cand.contains("hot2"))
  }

  test("heavy hitters ignores null items as candidates but counts them in n") {
    val df = (Seq.fill(60)(Some("x")) ++ Seq.fill(40)(Option.empty[String]))
      .toDF("item")
    // n = 100, k = 2 → threshold 50: x (60) qualifies; null never does
    val got = HeavyHitters.exact(df, "item", 2).collect()
    assert(got.map(_.getString(0)).toSeq === Seq("x"))
    assert(got.head.getDouble(2) === 0.6)
  }

  test("pagerank on a symmetric cycle is uniform 1/N") {
    val edges = Seq((0, 1, 1L), (1, 2, 1L), (2, 3, 1L), (3, 0, 1L))
      .toDF("src", "dst", "w")
    val r = PageRank.run(edges, iters = 10, cacheKey = "spec_pr_cycle")
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    r.values.foreach(v => assert(math.abs(v - 0.25) < 1e-9))
  }

  test("pagerank ranks the sink hub above its spokes") {
    // star: 1..5 all point at 0; 0 points back at 1 only
    val edges = ((1 to 5).map(i => (i, 0, 1L)) :+ (0, 1, 1L))
      .toDF("src", "dst", "w")
    val r = PageRank.run(edges, iters = 20, cacheKey = "spec_pr_star")
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r(0) > r(1)); assert(r(1) > r(2))
    (2 to 5).foreach(i => assert(math.abs(r(i) - r(2)) < 1e-12))
    // total mass stays ≤ 1 (no dangling nodes here → ≈ 1)
    assert(math.abs(r.values.sum - 1.0) < 1e-6)
  }

  test("pagerank respects edge weights") {
    // 0 splits 3:1 between 1 and 2; both return all mass to 0
    val edges = Seq((0, 1, 3L), (0, 2, 1L), (1, 0, 1L), (2, 0, 1L))
      .toDF("src", "dst", "w")
    val r = PageRank.run(edges, iters = 30, cacheKey = "spec_pr_w")
      .collect().map(x => x.getInt(0) -> x.getDouble(1)).toMap
    assert(r(1) > r(2))
    // stationary ratio of the two spokes approaches the 3:1 weight split
    val ratio = (r(1) - 0.05) / (r(2) - 0.05) // strip the teleport floor
    assert(ratio > 2.5 && ratio < 3.5)
  }
}

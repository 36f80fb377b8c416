package graft

import graft.eval.Metrics
import graft.score.ZScoreAnomaly
import org.apache.spark.sql.functions._

class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("confusion counts match hand computation") {
    // (label, predicted): TP, FP, TN, FN = 2,1,3,1
    val df = Seq((1, true), (1, true), (0, true), (0, false), (0, false),
      (0, false), (1, false)).toDF("label", "pred")
    val r = Metrics.confusion(df, "label", "pred").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 1L, 3L, 1L)))
    val rates = Metrics.rates(df, "label", "pred").head()
    // rates are round()ed to 6 dp for cross-engine hash stability
    assert(rates.getDouble(4) == 0.666667) // recall
    assert(rates.getDouble(5) == 0.25) // fpr
  }

  test("AUC is 1 for a perfect ranking, 0.5-ish for labels==scores ties") {
    val perfect = Seq((1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)).toDF("y", "s")
    assert(math.abs(Metrics.auc(perfect, "y", "s") - 1.0) < 1e-12)
    val inverted = Seq((0, 0.9), (0, 0.8), (1, 0.2), (1, 0.1)).toDF("y", "s")
    assert(math.abs(Metrics.auc(inverted, "y", "s") - 0.0) < 1e-12)
  }

  test("Youden-J picks the separating threshold") {
    val df = Seq((1, 0.9), (1, 0.7), (0, 0.4), (0, 0.2)).toDF("y", "s")
    val j = Metrics.youdenJ(df, "y", "s").head()
    assert(j.getDouble(0) == 0.7) // tpr=1, fpr=0 at score 0.7
    assert(j.getDouble(1) == 1.0)
  }

  test("rank-sum AUC equals the windowed trapezoid, on ties and any layout") {
    val rows = (1 to 500).map { i =>
      // deliberately tie-heavy scores, imperfectly correlated labels
      (if ((i * 7) % 10 < 3) 1 else 0, ((i * 13) % 40).toDouble)
    }
    val df = rows.toDF("y", "s")
    val viaTrapezoid = graft.eval.Metrics.aucDF(df, "y", "s").head().getDouble(0)
    val viaRankSum = graft.eval.Metrics.aucRankSum(df, "y", "s").head().getDouble(0)
    assert(viaRankSum == viaTrapezoid, s"$viaRankSum != $viaTrapezoid")
    val shuffled = graft.eval.Metrics.aucRankSum(df.repartition(17), "y", "s")
      .head().getDouble(0)
    assert(shuffled == viaRankSum)
    // degenerate: single-class input yields null
    assert(graft.eval.Metrics.aucRankSum(df.where($"y" === 1), "y", "s").head().isNullAt(0))
  }

  test("IF param grid: stability matches the reference formula, deterministic") {
    val df = (0 until 250).map { i =>
      (i.toLong, Seq((i % 7) * 0.1, (i % 11) * 0.2, (i % 3) * 1.0))
    }.toDF("id", "features")
    val grid = Seq((20, 16), (40, 32))
    val g1 = graft.eval.GridSearch.ifParamGrid(df, "id", "features", grid, poolSize = 250)
      .orderBy("num_trees").collect()
    assert(g1.length == 2)
    g1.foreach { r =>
      val (mu, sd, rg, st) = (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      val expect = 1.0 / (1.0 + sd / (mu + 1e-8) + rg / (mu + 1e-8))
      assert(math.abs(st - expect) < 1e-12)
      assert(st > 0.0 && st <= 1.0)
    }
    val g2 = graft.eval.GridSearch.ifParamGrid(df, "id", "features", grid, poolSize = 250)
      .orderBy("num_trees").collect()
    assert(g1.map(_.toSeq).toSeq == g2.map(_.toSeq).toSeq)
  }

  test("CV threshold grid: fold cells partition the data, partition-layout-proof") {
    val df = (1 to 400).map { i =>
      (i.toLong, if (i % 10 == 0) 1 else 0, i * 1.0)
    }.toDF("id", "y", "s")
    val g1 = graft.eval.GridSearch
      .cvThresholdGrid(df, "id", "y", "s", Seq(0.5, 0.9), k = 4)
      .orderBy("p", "fold").collect()
    assert(g1.length == 8)
    // repartitioned input must yield identical cells (hash folds + exact
    // quantiles are layout-free)
    val g2 = graft.eval.GridSearch
      .cvThresholdGrid(df.repartition(13), "id", "y", "s", Seq(0.5, 0.9), k = 4)
      .orderBy("p", "fold").collect()
    assert(g1.map(_.toSeq).toSeq == g2.map(_.toSeq).toSeq)
    // every positive lands in exactly one held-out cell per p
    val positives = 40L
    Seq(0.5, 0.9).foreach { p =>
      val cells = g1.filter(_.getDouble(0) == p)
      assert(cells.map(r => r.getLong(3) + r.getLong(5)).sum == positives)
    }
    val (bestP, bestF1) = graft.eval.GridSearch.cvBestThreshold(df, "id", "y", "s", Seq(0.5, 0.9), k = 4)
    assert(Seq(0.5, 0.9).contains(bestP) && bestF1 >= 0.0 && bestF1 <= 1.0)
  }

  test("ZScoreAnomaly flags a planted outlier") {
    val base = (1 to 200).map(i => (i.toLong, 10.0 + (i % 5), 5.0 + (i % 3)))
    val planted = (999L, 1000.0, -500.0)
    val df = (base :+ planted).toDF("id", "f1", "f2")
    val out = ZScoreAnomaly.detect(df, Seq("f1", "f2"), p = 0.99)
    val flagged = out.filter($"is_anomaly").select("id").collect().map(_.getLong(0))
    assert(flagged.contains(999L))
  }

  test("rocCurve matches hand-computed tpr/fpr per distinct score") {
    // pos scores {3,2}, neg scores {2,1}; thresholds = distinct scores
    val df = Seq((1, 3.0), (1, 2.0), (0, 2.0), (0, 1.0)).toDF("y", "s")
    val out = Metrics.rocCurve(df, "y", "s").orderBy(desc("score"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq == Seq((3.0, 0.5, 0.0), (2.0, 1.0, 0.5), (1.0, 1.0, 1.0)))
    // layout-proof: identical on a different partitioning
    val shuffled = Metrics.rocCurve(df.repartition(7), "y", "s")
      .orderBy(desc("score"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(shuffled.toSeq == out.toSeq)
  }

  test("binnedRocCurve is monotone and reaches (1,1) at the lowest bin") {
    val df = (1 to 200).map(i => (if (i > 120) 1 else 0, i.toDouble))
      .toDF("y", "s")
    val out = Metrics.binnedRocCurve(df, "y", "s", bins = 5)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(out.head._1 == 0 && out.head._2 == 1.0 && out.head._3 == 1.0)
    // cumulated from the top bin down: tpr/fpr non-increasing in bin
    out.sliding(2).foreach { case Array((_, t1, f1), (_, t2, f2)) =>
      assert(t1 >= t2 && f1 >= f2)
    }
    out.foreach { case (_, t, f) =>
      assert(t >= 0.0 && t <= 1.0 && f >= 0.0 && f <= 1.0)
    }
  }

  test("prCurve matches hand-computed precision/recall per distinct score") {
    val df = Seq((1, 3.0), (0, 3.0), (1, 2.0), (0, 1.0)).toDF("label", "score")
    val out = Metrics.prCurve(df, "label", "score")
      .orderBy(desc("score")).collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    // s=3: tp=1 of 2 predicted; s=2: tp=2 of 3; s=1: tp=2 of 4
    assert(out(0) == ((3.0, 0.5, 0.5)))
    assert(out(1)._1 == 2.0 && math.abs(out(1)._2 - 2.0 / 3.0) < 1e-15 &&
      out(1)._3 == 1.0)
    assert(out(2) == ((1.0, 0.5, 1.0)))
  }

  test("calibrationBins: per-quantile-bin count, mean score, positive rate") {
    val df = (1 to 10).map(i => (if (i > 5) 1 else 0, i.toDouble))
      .toDF("label", "score")
    val out = Metrics.calibrationBins(df, "label", "score", bins = 2)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    // median 5.5 splits 1..5 (no positives) from 6..10 (all positive)
    assert(out.length == 2)
    assert(out(0) == ((0, 5L, 3.0, 0.0)))
    assert(out(1) == ((1, 5L, 8.0, 1.0)))
  }

  test("isotonic minimax fit equals hand PAV and is monotone") {
    import graft.eval.Isotonic
    // scores 1..8 in 4 bins of 2; per-bin positive rates 0, 1, 0.5, 1:
    // PAV pools bins 1..2 (rates 1, 0.5 violate) → pooled 0.75
    val rows = Seq(
      (0, 1.0), (0, 2.0),           // bin 0: rate 0
      (1, 3.0), (1, 4.0),           // bin 1: rate 1   ┐ pooled
      (0, 5.0), (1, 6.0),           // bin 2: rate 0.5 ┘ → 0.75
      (1, 7.0), (1, 8.0))           // bin 3: rate 1
    val df = rows.toDF("y", "s")
    val out = Isotonic.fitBins(df, "y", "s", bins = 4)
      .orderBy("bin")
      .select("bin", "rate", "fitted")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(out.map(_._2).toSeq == Seq(0.0, 1.0, 0.5, 1.0))
    assert(out.map(_._3).toSeq == Seq(0.0, 0.75, 0.75, 1.0))
    val fitted = out.map(_._3)
    assert(fitted.zip(fitted.tail).forall { case (a, b) => a <= b },
      s"fitted must be monotone: ${fitted.toSeq}")
  }

  test("isotonic fit is the identity when rates are already monotone") {
    import graft.eval.Isotonic
    val rows = Seq((0, 1.0), (0, 2.0), (0, 3.0), (1, 4.0), (1, 5.0), (1, 6.0))
    val out = Isotonic.fitBins(rows.toDF("y", "s"), "y", "s", bins = 3)
      .orderBy("bin").select("rate", "fitted")
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    out.foreach { case (rate, fitted) => assert(rate === fitted) }
  }

  test("RocPlot renders a deterministic self-contained SVG artifact") {
    import spark.implicits._
    import graft.eval.{Metrics, RocPlot}
    val df = Seq((1, 0.9), (1, 0.8), (0, 0.7), (1, 0.6), (0, 0.4),
      (0, 0.3), (1, 0.55), (0, 0.2)).toDF("y", "s")
    val curve = Metrics.rocCurve(df, "y", "s")
    val auc = Metrics.auc(df, "y", "s")
    val svg = RocPlot.rocSvg(curve, auc)
    assert(svg.startsWith("<svg") && svg.endsWith("</svg>"))
    assert(svg.contains("polyline") && svg.contains("AUC = "))
    assert(svg.contains("%.4f".formatLocal(java.util.Locale.ROOT, auc)))
    // deterministic: identical input → identical artifact
    assert(svg == RocPlot.rocSvg(Metrics.rocCurve(df, "y", "s"), auc))
    // file write round-trips
    val p = java.nio.file.Files.createTempFile("roc", ".svg")
    RocPlot.writeRocSvg(curve, auc, p.toString)
    assert(java.nio.file.Files.readString(p) == svg)
  }

  test("RocPlot.downsample bounds points, keeps order and endpoints") {
    import spark.implicits._
    import graft.eval.RocPlot
    val big = (0 until 5000).map(i => (i / 5000.0, i / 5000.0))
      .toDF("fpr", "tpr")
    val ds = RocPlot.downsample(big, "fpr", maxPoints = 100)
      .collect().map(_.getDouble(0))
    assert(ds.length <= 100 && ds.length >= 99)
    assert(ds.head == 0.0 && ds.last == 4999 / 5000.0)
    assert(ds.sorted.sameElements(ds), "downsample must preserve order")
    // small frames pass through untouched
    val small = (0 until 10).map(i => (i / 10.0, i / 10.0)).toDF("fpr", "tpr")
    assert(RocPlot.downsample(small, "fpr", 512).count() == 10)
  }
}

package graft.features

import graft.core.Stats
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Composable fitted feature pipeline — the reference's
  * `Pipeline(Imputer → StringIndexer* → VectorAssembler → StandardScaler)`
  * (`lib/utils.py:240-251`) re-expressed as immutable fitted state plus a
  * pure column transform, with exact text persistence (SURVEY.md §2.1
  * S6: `PipelineModel.save/load`).
  *
  * Fit runs one aggregation job per stage kind (fills, label tables,
  * z-params) — the same job count as spark.ml's Pipeline.fit — and the
  * fitted state is tiny driver data that rides into the plan as
  * literals/broadcasts. Transform is a single codegen'd projection: no
  * UDFs, no extra shuffle, identical at any parallelism. Label indexing
  * uses `array_position` on a literal label array (labels are small by
  * construction; this is the StringIndexer model, inlined), with
  * handleInvalid="keep" semantics: unseen/null → numLabels.
  */
object FeaturePipeline {

  final case class Spec(
      imputeCols: Seq[String] = Nil,
      imputeStrategy: Imputers.Strategy = Imputers.Mean,
      indexCols: Seq[String] = Nil,
      numericCols: Seq[String],
      standardize: Boolean = true)

  /** Fitted state. Feature order = numericCols (imputed where listed)
    * then indexCols' indexes.
    */
  final case class Fitted(
      spec: Spec,
      fills: Map[String, Double],
      labels: Map[String, Seq[String]],
      means: Seq[Double],
      stds: Seq[Double]) {

    private def featureExprs(df: DataFrame): Seq[Column] = {
      val nums = spec.numericCols.map { c =>
        val d = col(c).cast(DoubleType)
        val clean = when(!isnan(d), d)
        fills.get(c).map(f => coalesce(clean, lit(f))).getOrElse(d)
      }
      val idxs = spec.indexCols.map { c =>
        val lab = labels(c)
        val pos = array_position(typedLit(lab), col(c))
        (when(pos > 0, pos - 1).otherwise(lit(lab.size.toLong))).cast(DoubleType)
      }
      nums ++ idxs
    }

    /** Appends `outCol: array<double>` — assembled (and, if enabled,
      * z-scored) features.
      */
    def transform(df: DataFrame, outCol: String = "features"): DataFrame = {
      val raw = array(featureExprs(df): _*)
      val out =
        if (!spec.standardize) raw
        else {
          val mu = array(means.map(lit): _*)
          val sd = array(stds.map(lit): _*)
          zip_with(zip_with(raw, mu, (x, m) => x - m), sd,
            (xm, s) => when(s === 0.0 || isnan(s), lit(0.0)).otherwise(xm / s))
        }
      df.withColumn(outCol, out)
    }

    // --- persistence (exact round-trip via Double.toString) ---------- //

    private val FS = "\u001f" // unit separator: safe for label values

    def save(path: String): Unit = {
      val lines = Seq(
        "numeric" + FS + spec.numericCols.mkString(FS),
        "index" + FS + spec.indexCols.mkString(FS),
        "strategy" + FS + spec.imputeStrategy.toString,
        "standardize" + FS + spec.standardize,
        "fills" + FS + spec.imputeCols.map(c => c + FS + fills(c)).mkString(FS),
        "means" + FS + means.mkString(FS),
        "stds" + FS + stds.mkString(FS)) ++
        spec.indexCols.map(c => "labels." + c + FS + labels(c).mkString(FS))
      val p = Paths.get(path)
      if (p.getParent != null) Files.createDirectories(p.getParent)
      Files.writeString(p, lines.mkString("\n"))
    }
  }

  def fit(df: DataFrame, spec: Spec): Fitted = {
    val fills =
      if (spec.imputeCols.isEmpty) Map.empty[String, Double]
      else Imputers.fit(df, spec.imputeCols, spec.imputeStrategy)
    val labels = spec.indexCols.map { c =>
      val m = FrequencyIndexer.fit(df, c)
      c -> m.labels.orderBy("label_index").select("label")
        .collect().map(_.getString(0)).toSeq
    }.toMap
    val interim = Fitted(spec.copy(standardize = false), fills, labels, Nil, Nil)
    val (means, stds) =
      if (!spec.standardize) (Nil, Nil)
      else {
        val nFeat = spec.numericCols.size + spec.indexCols.size
        val feats = interim.transform(df, "__f")
        val aggs = (0 until nFeat).flatMap { i =>
          val e = element_at(col("__f"), i + 1)
          Seq(Stats.dmean(e).as(s"mu_$i"), Stats.dstddevSamp(e).as(s"sd_$i"))
        }
        val r = feats.agg(aggs.head, aggs.tail: _*).head()
        ((0 until nFeat).map(i => r.getDouble(2 * i)),
          (0 until nFeat).map(i => r.getDouble(2 * i + 1)))
      }
    Fitted(spec, fills, labels, means, stds)
  }

  def load(path: String): Fitted = {
    val FS = "\u001f"
    val lines = Files.readAllLines(Paths.get(path)).asScala.toSeq
    val m = lines.map { l =>
      val parts = l.split(FS, -1).toSeq
      parts.head -> parts.tail
    }.toMap
    def seqOf(k: String): Seq[String] = m.getOrElse(k, Nil).filter(_.nonEmpty)
    val fillPairs = seqOf("fills").grouped(2).collect {
      case Seq(k, v) => k -> v.toDouble
    }.toMap
    val strategy = m("strategy").head match {
      case "Mean" => Imputers.Mean
      case "MedianExact" => Imputers.MedianExact
      case _ => Imputers.MedianApprox
    }
    val indexCols = seqOf("index")
    Fitted(
      Spec(fillPairs.keys.toSeq.sorted, strategy, indexCols,
        seqOf("numeric"), m("standardize").head.toBoolean),
      fillPairs,
      indexCols.map(c => c -> seqOf("labels." + c)).toMap,
      seqOf("means").map(_.toDouble),
      seqOf("stds").map(_.toDouble))
  }
}

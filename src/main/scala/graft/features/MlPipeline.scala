package graft.features

import org.apache.spark.ml.{Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.feature.{Imputer, StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame

/** The reference's feature pipeline on the ACTUAL spark.ml API —
  * byte-for-byte the stage graph of `build_and_fit_feature_pipeline`
  * (`lib/utils.py:154-269`): Imputer(mean|median) → StringIndexer per
  * categorical (frequencyDesc, handleInvalid="keep") → VectorAssembler
  * (handleInvalid="skip") → StandardScaler(withMean, withStd), persisted
  * with the built-in `PipelineModel.write` (Parquet + JSON metadata —
  * the same artifact format as the reference's `pipelines/` directory,
  * S6).
  *
  * [[FeaturePipeline]] remains the engine's native path (pure column
  * transform, oracle-checkable math); this twin exists for DROP-IN
  * parity: a user loading the reference's mental model — or migrating
  * fitted-pipeline artifacts — gets the identical spark.ml surface.
  */
object MlPipeline {

  /** Mirror of `lib/utils.py:205-251`: impute numerics, index
    * categoricals, assemble, standardize. Output column: "features"
    * (vector), like the reference.
    */
  def build(numericCols: Seq[String], categoricalCols: Seq[String],
            imputeStrategy: String = "mean"): Pipeline = {
    val imputed = numericCols.map(c => s"${c}__imp")
    val imputer = new Imputer()
      .setInputCols(numericCols.toArray).setOutputCols(imputed.toArray)
      .setStrategy(imputeStrategy)
    val indexers: Seq[PipelineStage] = categoricalCols.map { c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}__idx")
        .setStringOrderType("frequencyDesc").setHandleInvalid("keep")
    }
    val assembler = new VectorAssembler()
      .setInputCols((imputed ++ categoricalCols.map(c => s"${c}__idx")).toArray)
      .setOutputCol("assembled").setHandleInvalid("skip")
    val scaler = new StandardScaler()
      .setInputCol("assembled").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    new Pipeline().setStages(
      (Seq(imputer) ++ indexers ++ Seq(assembler, scaler)).toArray)
  }

  def fit(df: DataFrame, numericCols: Seq[String], categoricalCols: Seq[String],
          imputeStrategy: String = "mean"): PipelineModel =
    build(numericCols, categoricalCols, imputeStrategy).fit(df)

  /** Built-in artifact round-trip (`PipelineModel.write` — the S6
    * Parquet+JSON format).
    */
  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(path: String): PipelineModel = PipelineModel.load(path)
}

package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.types.StructType

/** Schema reconciliation — the reference aligns a test set to the train
  * schema by adding missing columns as typed nulls and dropping extras
  * (`app/test_AE.py:50-67`, `app/data_augmentation_enhanced.py:190-196`).
  * Pure metadata operations: no job, no shuffle.
  */
object SchemaAlign {

  /** Align `df` to `target`: add missing columns as `lit(null).cast(t)`,
    * drop columns not in `target`, emit in `target` field order.
    */
  def alignTo(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    val cols = target.fields.map { f =>
      if (have.contains(f.name)) col(f.name).cast(f.dataType).as(f.name)
      else lit(null).cast(f.dataType).as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /** Union two frames on the union of their schemas (missing side-columns
    * become typed nulls) — `pd.concat`-with-NaN-fill semantics
    * (`app/data_augmentation_enhanced.py:246`).
    */
  def unionAligned(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  /** Cast every boolean column to int — the reference does this before
    * feature assembly (`lib/utils.py:9-14`, `app/AE_model.py:35-40`).
    */
  def boolsToInt(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{BooleanType, IntegerType}
    df.schema.fields.filter(_.dataType == BooleanType).foldLeft(df) {
      (acc, f) => acc.withColumn(f.name, col(f.name).cast(IntegerType))
    }
  }

  /** Feature-dimension guard + zero-pad for an assembled array-feature
    * column — the reference detects a train/test feature-dim mismatch
    * and zero-pads the narrow side up to the training width
    * (`app/test_AE.py:138-165`). A row whose array is WIDER than `dim`
    * fails loudly (`raise_error`): silently truncating features would
    * corrupt every downstream score. Null arrays pass through null (the
    * validity predicate decides their fate, not the pad). Pure per-row
    * projection — codegen'd, no shuffle, no job to plan the guard.
    */
  def padFeatures(df: DataFrame, featCol: String, dim: Int,
                  pad: Double = 0.0): DataFrame = {
    import org.apache.spark.sql.functions.{array_repeat, concat, lit => flit,
      raise_error, size, when => fwhen, concat_ws}
    val c = col(featCol)
    val sz = size(c)
    df.withColumn(featCol,
      fwhen(c.isNull, c)
        .when(sz === dim, c)
        .when(sz < dim,
          concat(c, array_repeat(flit(pad), flit(dim) - sz)))
        .otherwise(raise_error(concat_ws("",
          flit(s"feature dim mismatch in '$featCol': got "),
          sz.cast("string"), flit(s", expected <= $dim")))))
  }
}

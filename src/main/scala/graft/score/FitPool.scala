package graft.score

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** The deterministic fit pool shared by every driver-fit model
  * (IsolationForest, LinearAE, MlpAE): the lexicographically-first `n`
  * rows by `idCol` — a TakeOrdered job (per-partition top-n, no global
  * sort materialization), bounded driver memory, identical on any
  * cluster layout when `idCol` is a total order. The reference trains
  * on driver-collected data too (`app/AE_model.py:64-67`); here the
  * collect is bounded and only the fitted weights travel back out (as
  * a broadcast).
  */
object FitPool {
  def collect(df: DataFrame, idCol: String, featuresCol: String,
              n: Int): Array[Array[Double]] =
    df.select(col(idCol), col(featuresCol))
      .orderBy(col(idCol)).limit(n)
      .collect()
      .map(_.getSeq[Double](1).toArray)
}

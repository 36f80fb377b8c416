package graft.score

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, col}
import org.apache.spark.sql.types._

/** A broadcastable per-row scorer over a primitive feature vector —
  * the engine's contract for driver-fit models scored distributed
  * (LinearAE, MlpAE; the reference's `model.predict` after `collect()`,
  * `app/AE_model.py:218-226`, minus the driver boundary).
  */
trait ArrayScorer extends Serializable {
  def score(x: Array[Double]): Double
}

/** Scores an `array<float|double>` column with a broadcast
  * [[ArrayScorer]], reading elements straight out of `ArrayData` (one
  * bulk primitive copy per row) — no Seq materialization, no
  * per-element boxing, no Scala-UDF encoder round-trip. CodegenFallback
  * (the scorer is an opaque closure), but the per-row work is a matrix
  * multiply that dwarfs the fallback dispatch. Feature arrays must have
  * non-null elements.
  */
case class ArrayScoreExpr(child: Expression, scorer: Broadcast[ArrayScorer])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft array scorer expects array<float|double>, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val x =
      if (isFloat) {
        val f = arr.toFloatArray()
        val d = new Array[Double](f.length)
        var i = 0
        while (i < f.length) { d(i) = f(i).toDouble; i += 1 }
        d
      } else arr.toDoubleArray()
    scorer.value.score(x)
  }

  override protected def withNewChildInternal(newChild: Expression): ArrayScoreExpr =
    copy(child = newChild)
}

object ArrayScoreExpr {
  // monotonic registration ids: identityHashCode can collide between two
  // live scorers, silently rebinding a not-yet-analyzed plan
  private val nextId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Build the scoring Column: broadcast the scorer, route through a
    * scorer-specific temp function (the registry is the public seam for
    * Column←Expression in Spark 4). Each call registers one session
    * function holding one broadcast — session-scoped model state, like
    * a registered UDF.
    */
  def column(df: DataFrame, scorer: ArrayScorer, featuresCol: String): Column = {
    val bc = df.sparkSession.sparkContext.broadcast(scorer)
    val name = s"graft_arrayscore_${nextId.incrementAndGet()}"
    df.sparkSession.sessionState.functionRegistry.createOrReplaceTempFunction(
      name,
      { args: Seq[Expression] =>
        require(args.length == 1, s"$name takes 1 argument")
        ArrayScoreExpr(args.head, bc)
      },
      "built-in")
    call_function(name, col(featuresCol))
  }
}

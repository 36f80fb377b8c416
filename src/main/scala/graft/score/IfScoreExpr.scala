package graft.score

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Pointer-free isolation forest: every tree flattened into parallel
  * primitive arrays so the scoring loop is a tight `int`/`double` walk
  * with no virtual dispatch, no boxing, and no object graph to chase.
  * Leaves store their `c(size)` term in `threshold`, so a walk
  * accumulates `depth + threshold(leaf)` directly.
  *
  * A 6000-tree forest with ψ=16 (the reference's largest grid point,
  * `app/IsolationForest_AE.py:210-247`) flattens to ~4 MB of arrays —
  * broadcast once, shared by every task on an executor.
  */
final class FlatForest private (
    val roots: Array[Int],
    val feature: Array[Int], // -1 marks a leaf
    val threshold: Array[Double], // split value, or c(size) at a leaf
    val left: Array[Int],
    val right: Array[Int],
    val cNorm: Double)
    extends Serializable {

  /** Same arithmetic, same order as `IsolationForest.Model.score`. */
  def score(x: Array[Double]): Double = {
    var s = 0.0
    var t = 0
    while (t < roots.length) {
      var node = roots(t)
      var depth = 0
      while (feature(node) >= 0) {
        node = if (x(feature(node)) < threshold(node)) left(node) else right(node)
        depth += 1
      }
      s += depth + threshold(node)
      t += 1
    }
    math.pow(2.0, -(s / roots.length) / cNorm)
  }
}

object FlatForest {
  def apply(m: IsolationForest.Model): FlatForest = {
    import IsolationForest._
    val feature = scala.collection.mutable.ArrayBuffer.empty[Int]
    val threshold = scala.collection.mutable.ArrayBuffer.empty[Double]
    val left = scala.collection.mutable.ArrayBuffer.empty[Int]
    val right = scala.collection.mutable.ArrayBuffer.empty[Int]
    def emit(t: ITree): Int = t match {
      case Leaf(size) =>
        val i = feature.length
        feature += -1; threshold += c(size); left += -1; right += -1
        i
      case Split(f, v, l, r) =>
        val i = feature.length
        feature += f; threshold += v; left += -1; right += -1
        left(i) = emit(l)
        right(i) = emit(r)
        i
    }
    val roots = m.trees.map(emit)
    new FlatForest(roots, feature.toArray, threshold.toArray,
      left.toArray, right.toArray, c(m.sampleSize))
  }
}

/** Whole-stage-codegen isolation-forest scoring over an
  * `array<float|double>` feature column. Replaces the boxed
  * `udf { xs: Seq[Double] => ... }` path: the generated loop reads
  * elements straight out of `ArrayData` (one bulk primitive copy per
  * row) and walks the broadcast [[FlatForest]] arrays — no Seq
  * materialization, no per-element boxing, no encoder round-trip.
  * Feature arrays must have non-null elements.
  */
case class IfScoreExpr(child: Expression, forest: Broadcast[FlatForest])
    extends UnaryExpression {

  override def dataType: DataType = DoubleType

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_ifscore expects array<float|double>, got ${other.catalogString}")
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
    forest.value.score(x)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ffClass = classOf[FlatForest].getName
    val bcRef = ctx.addReferenceObj("graftForestBc", forest,
      classOf[Broadcast[FlatForest]].getName)
    // unwrap the broadcast once per task, not once per row
    val ff = ctx.addMutableState(ffClass, "graftForest",
      v => s"$v = ($ffClass) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, a => {
      val x = ctx.freshName("x")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val node = ctx.freshName("node")
      val depth = ctx.freshName("depth")
      val i = ctx.freshName("i")
      val fl = ctx.freshName("fl")
      val toX =
        if (isFloat)
          s"""float[] $fl = $a.toFloatArray();
             |double[] $x = new double[$fl.length];
             |for (int $i = 0; $i < $fl.length; $i++) { $x[$i] = (double) $fl[$i]; }
           """.stripMargin
        else s"double[] $x = $a.toDoubleArray();"
      s"""
         |$toX
         |double $s = 0.0;
         |for (int $t = 0; $t < $ff.roots().length; $t++) {
         |  int $node = $ff.roots()[$t];
         |  int $depth = 0;
         |  while ($ff.feature()[$node] >= 0) {
         |    $node = ($x[$ff.feature()[$node]] < $ff.threshold()[$node])
         |      ? $ff.left()[$node] : $ff.right()[$node];
         |    $depth++;
         |  }
         |  $s += $depth + $ff.threshold()[$node];
         |}
         |${ev.value} = java.lang.Math.pow(2.0, -($s / $ff.roots().length) / $ff.cNorm());
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): IfScoreExpr =
    copy(child = newChild)
}

object IfScoreExpr {

  /** The scored frame `df` + `outCol`: broadcasts the flattened forest
    * and applies it as a codegen'd map expression. Registration is
    * scoped (register → analyze → deregister, see
    * [[ArrayScoreExpr.scored]]) so repeated model builds don't pin
    * broadcasts in the session function registry.
    */
  def withScore(df: DataFrame, model: IsolationForest.Model, featuresCol: String,
                outCol: String): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(FlatForest(model))
    ArrayScoreExpr.scored(df, featuresCol, outCol, "graft_ifscore", { args: Seq[Expression] =>
      require(args.length == 1, "graft_ifscore takes 1 argument")
      IfScoreExpr(args.head, bc)
    })
  }
}

package graft.sim

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, functions => F}

/** Native Catalyst expression for the dot product of two array columns
  * (float or double elements), with whole-stage codegen.
  *
  * Why a custom Expression: `aggregate(zip_with(a, b, _*_), 0.0, _+_)`
  * is semantically identical but interpreted — each element evaluation
  * walks a lambda closure with boxing (~100 ns/element). At sf0.1 the
  * all-pairs cosine stage spends 24 s there; this expression's generated
  * loop runs the same 2M×64 multiply-adds in under a second. Summation
  * order is the same left-to-right double fold, so results are bitwise
  * identical to the higher-order form AND to the DuckDB oracle's
  * `list_reduce` (see [[VectorMath]]).
  *
  * Array elements must be non-null (embedding vectors); a null array
  * yields null via BinaryExpression's null-intolerant contract.
  */
case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_dot expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      def get(arr: String, e: Expression) = elemType(e) match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, left)} * ${get(b, right)};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 distance Σ(x−y)² of two array columns, whole-stage
  * codegen, SEQUENTIAL left-to-right fold — bitwise identical to
  * [[KMeans.Model.assign]]'s inner loop (the dual-path q198 audit pins
  * that agreement) and to the interpreted
  * `aggregate(zip_with(a, b, (x,y) => (x−y)²), 0.0, _+_)` it replaces,
  * which cost ~24 s at the 10× ScaleAb point (142 centers × 64 dims ×
  * 20k rows of boxed lambda evaluation). */
case class SqDistExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_sqdist expects array<float|double> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemType(left) == FloatType
    val rf = elemType(right) == FloatType
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv
      s += d * d
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val d = ctx.freshName("d")
      def get(arr: String, e: Expression) = elemType(e) match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = ${get(a, left)} - ${get(b, right)};
         |  $s += $d * $d;
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistExpr =
    copy(left = newLeft, right = newRight)
}

/** Session registration for graft's native functions. Idempotent. */
object GraftFunctions {
  val DotName = "graft_dot"
  val StrHashName = "graft_strhash"

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      DotName,
      { args: Seq[Expression] =>
        require(args.length == 2, s"$DotName takes 2 arguments")
        DotProductExpr(args(0), args(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      StrHashName,
      { args: Seq[Expression] =>
        require(args.length == 2, s"$StrHashName takes 2 arguments")
        StrHashExpr(args(0), args(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      MinHashName,
      { args: Seq[Expression] =>
        require(args.length == 2, s"$MinHashName takes 2 arguments")
        MinHashSigExpr(args(0), args(1))
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      SqDistName,
      { args: Seq[Expression] =>
        require(args.length == 2, s"$SqDistName takes 2 arguments")
        SqDistExpr(args(0), args(1))
      },
      "built-in")
  }

  val SqDistName = "graft_sqdist"

  /** Codegen'd sequential Σ(x−y)² (requires [[register]]). */
  def sqDist(a: Column, b: Column): Column =
    F.call_function(SqDistName, a, b)

  val MinHashName = "graft_minhash"

  /** Codegen'd MinHash signature over a shingle-array column. */
  def minhashSig(shingles: Column, k: Int): Column =
    F.call_function(MinHashName, shingles, F.lit(k))

  /** Codegen'd polynomial string hash (requires [[register]]). */
  def strHash(c: Column, seed: Long): Column =
    F.call_function(StrHashName, c, F.lit(seed))

  /** Codegen'd dot product (requires [[register]] on the session). */
  def dot(a: Column, b: Column): Column = F.call_function(DotName, a, b)

  /** Codegen'd squared L2 norm. */
  def norm2(a: Column): Column = dot(a, a)
}

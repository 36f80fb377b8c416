package graft.sim

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared hash kernel: polynomial character hash mod P (see
  * [[graft.text.TextOps.P]]), h := (h·31 + char) mod P folded over UTF-16
  * code units. For BMP text this is exactly the higher-order-function
  * form `aggregate(split(s,""), seed, (acc,c) -> (acc*31+ascii(c)) % P)`
  * — the engine's corpora are ASCII; supplementary-plane codepoints
  * would differ between the two forms (surrogate pairs vs codepoints)
  * and are out of contract.
  */
object HashUtil {
  val P = 1000000007L

  def polyHash(s: UTF8String, seed: Long): Long = {
    val str = s.toString
    var acc = seed
    var i = 0
    val n = str.length
    while (i < n) {
      acc = (acc * 31 + str.charAt(i).toLong) % P
      i += 1
    }
    acc
  }
}

/** Native codegen form of the polynomial string hash. The interpreted
  * higher-order fold walks one lambda invocation per *character*; this
  * expression is one static JVM call per row. MinHash signatures hash
  * every shingle of every document — at sf0.1 that is ~4M shingle
  * hashes × ~17 chars, the dominant cost of the LSH stage.
  */
case class StrHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == StringType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_strhash expects (string, bigint), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(s: Any, seed: Any): Any =
    HashUtil.polyHash(s.asInstanceOf[UTF8String], seed.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, seed) =>
      s"${ev.value} = graft.sim.HashUtil.polyHash($s, $seed);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): StrHashExpr =
    copy(left = newLeft, right = newRight)
}

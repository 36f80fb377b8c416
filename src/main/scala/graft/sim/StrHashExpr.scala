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

  /** k-wide MinHash signature over a shingle array: hash each shingle
    * once (polyHash, seed 7), update k mins with
    * h_i = ((2i+1)·h + 7919·i + 12345) mod P. Exactly the arithmetic of
    * `MinHashLSH.signatureFromShinglesHof` in one tight loop. Returns
    * null for an empty shingle set (no signature).
    */
  def minhashSig(shingles: org.apache.spark.sql.catalyst.util.ArrayData,
                 k: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return null
    val mins = Array.fill(k)(P)
    var j = 0
    while (j < n) {
      val h = polyHash(shingles.getUTF8String(j), 7L)
      var i = 0
      while (i < k) {
        val hi = ((2L * i + 1L) * h + 7919L * i + 12345L) % P
        if (hi < mins(i)) mins(i) = hi
        i += 1
      }
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
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

/** Native MinHash signature: one generated loop over the shingle array
  * (each shingle hashed once, k mins updated in registers) instead of
  * the interpreted transform/aggregate/zip_with chain — the dominant
  * cost of the LSH dedup stage at sf0.1. Null for empty shingle sets.
  */
case class MinHashSigExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  private def k: Int = right.eval(null).asInstanceOf[Int]

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType.isInstanceOf[ArrayType] &&
        left.dataType.asInstanceOf[ArrayType].elementType == StringType &&
        right.dataType == IntegerType && right.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_minhash expects (array<string>, literal int), got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def nullSafeEval(sh: Any, kk: Any): Any =
    HashUtil.minhashSig(
      sh.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      kk.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (sh, kk) =>
      s"""
         |${ev.value} = graft.sim.HashUtil.minhashSig($sh, $kk);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MinHashSigExpr =
    copy(left = newLeft, right = newRight)
}

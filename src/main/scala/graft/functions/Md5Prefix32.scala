package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first 32 bits of md5(input) as an int64 —
  * semantically identical to `conv(substring(md5(c), 1, 8), 16, 10)` (the
  * first 8 hex chars ARE the first 4 digest bytes big-endian) but with no
  * hex-string materialization, no string parsing, and full codegen: one
  * digest + one shift chain per row. This sits in the hot path of every
  * MinHash/SimHash pipeline (one call per shingle/token).
  */
case class Md5Prefix32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_prefix32 requires a string input, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "md5_prefix32"

  protected override def nullSafeEval(input: Any): Any =
    Md5Prefix32.hash(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Prefix32.hash($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): Md5Prefix32 =
    copy(child = newChild)
}

object Md5Prefix32 {
  private[functions] val digests = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** First 4 md5 digest bytes as an unsigned big-endian long (0 .. 2^32). */
  def hash(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Register into the session (Column access via [[md5Prefix32]] and SQL
    * access as `md5_prefix32(col)`).
    */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "md5_prefix32", exprs => Md5Prefix32(exprs.head), "built-in")

  /** Column API (requires [[register]] on the session first). */
  def md5Prefix32(c: Column): Column = call_function("md5_prefix32", c)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row SimHash kernels — the [[MinHashSigFull]] treatment for
  * the SimHash family: tokenize (same tag-exact rules), one md5 per token
  * OCCURRENCE, ±1 votes on every bit position, sign-threshold signature —
  * all in ONE native call, so the signature is a map-side projection with
  * no explode and no per-doc aggregate Exchange. Value-exact twins of the
  * explode/groupBy pipelines they replace (parity locked in
  * `OperatorsSpec`): the 16-bit form votes with the [[Md5Prefix32]] value
  * (first 4 digest bytes, bits 0–15), the 64-bit form with both unsigned
  * 32-bit digest halves (bits 0–31 from bytes 4–7, bits 32–63 from bytes
  * 0–3 — `conv(substr(md5, 9, 8))` / `conv(substr(md5, 1, 8))`), hex
  * output in the dHash byte layout. NULL when the text yields no tokens
  * (the explode pipeline's row-drop semantics).
  */
object SimHashKernels {

  /** Bit-vote sums over all 64 positions, or null for zero tokens. */
  private def votes(text: UTF8String, tag: String): Array[Int] = {
    val toks = MinHashSigKernels.tokens(text, tag)
    if (toks.isEmpty) return null
    val md = Md5Prefix32.digests.get()
    val sums = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val lo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      var b = 0
      while (b < 32) {
        if (((lo >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        if (((hi >> b) & 1L) == 1L) sums(32 + b) += 1 else sums(32 + b) -= 1
        b += 1
      }
      i += 1
    }
    sums
  }

  /** 16-bit signature: bit b = [vote sum of hash32 bit b > 0], b < 16 —
    * hash32 = the hi half (first 4 digest bytes), matching
    * `md5_prefix32(token)`'s low 16 bits.
    */
  def sig16(text: UTF8String, tag: String): java.lang.Integer = {
    // own 16-bit loop: the full votes() extracts the lo half and runs 64
    // positions per token — 3/4 of that is wasted for a 16-bit signature
    val toks = MinHashSigKernels.tokens(text, tag)
    if (toks.isEmpty) return null
    val md = Md5Prefix32.digests.get()
    val sums = new Array[Int](16)
    var i = 0
    while (i < toks.length) {
      md.reset()
      val d = md.digest(toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // hash32's low 16 bits live in digest bytes 2-3
      val h = (((d(2) & 0xffL) << 8) | (d(3) & 0xffL)).toInt
      var b = 0
      while (b < 16) {
        if (((h >> b) & 1) == 1) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0
    var b = 0
    while (b < 16) { if (sums(b) > 0) out |= (1 << b); b += 1 }
    java.lang.Integer.valueOf(out)
  }

  /** 64-bit signature as 16 lowercase hex chars in the dHash byte layout:
    * byte r = positions r·8 … r·8+7, bit c of the byte = position r·8+c.
    */
  def sig64Hex(text: UTF8String, tag: String): UTF8String = {
    val s = votes(text, tag)
    if (s == null) return null
    val sb = new java.lang.StringBuilder(16)
    var r = 0
    while (r < 8) {
      var byteR = 0
      var c = 0
      while (c < 8) { if (s(r * 8 + c) > 0) byteR |= (1 << c); c += 1 }
      if (byteR < 16) sb.append('0')
      sb.append(java.lang.Integer.toHexString(byteR))
      r += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

case class SimHash16(child: Expression, tokenizerTag: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash16 requires a string input, got $t")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash16"
  protected override def nullSafeEval(v: Any): Any =
    SimHashKernels.sig16(v.asInstanceOf[UTF8String], tokenizerTag)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagRef = ctx.addReferenceObj("tokTag", tokenizerTag, "java.lang.String")
    val resName = ctx.freshName("res")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        |java.lang.Integer $resName = graft.functions.SimHashKernels.sig16($v, $tagRef);
        |if ($resName == null) { ${ev.isNull} = true; } else { ${ev.value} = $resName.intValue(); }
      """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

case class SimHash64Hex(child: Expression, tokenizerTag: String)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash64_hex requires a string input, got $t")
  }
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64_hex"
  protected override def nullSafeEval(v: Any): Any =
    SimHashKernels.sig64Hex(v.asInstanceOf[UTF8String], tokenizerTag)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagRef = ctx.addReferenceObj("tokTag", tokenizerTag, "java.lang.String")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        |${ev.value} = graft.functions.SimHashKernels.sig64Hex($v, $tagRef);
        |${ev.isNull} = (${ev.value} == null);
      """.stripMargin
    })
  }
  override protected def withNewChildInternal(newChild: Expression): SimHash64Hex =
    copy(child = newChild)
}

object SimHashSig {
  import org.apache.spark.sql.graft.ColumnBridge

  def simhash16(text: Column, tokenizerTag: String): Column =
    ColumnBridge.column(SimHash16(ColumnBridge.expression(text), tokenizerTag))

  def simhash64Hex(text: Column, tokenizerTag: String): Column =
    ColumnBridge.column(SimHash64Hex(ColumnBridge.expression(text), tokenizerTag))
}

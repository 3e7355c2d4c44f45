package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row MinHash signature kernel: tokenize → 3-word shingles →
  * md5-prefix hash mod P → all 32 permutation minima, in ONE native call.
  *
  * Value-exact twin of the explode/aggregate pipeline it replaces
  * (`explode(ngramsCol(text, 3, tokenizer))` → `md5_prefix32(s) % P` →
  * `MinHashSigAgg` — parity locked on the real corpus in
  * `OperatorsSpec`), with the structural win that the whole signature
  * becomes a MAP-SIDE PROJECTION: no shingle-row materialization, no
  * aggregate, and no per-doc Exchange — one shuffle stage removed from
  * every near-dup pipeline and every signature-index write/probe.
  *
  * Exactness notes (each mirrors the Spark expression the column form
  * used): lower-casing is `UTF8String.toLowerCase` (the `Lower`
  * expression's own rule — NOT java.lang.String's locale-sensitive map);
  * splitting is Java regex on the JVM string, which is precisely what
  * `StringSplit`/`RegExpReplace` execute; the shingle is 3 tokens joined
  * by one space; the hash is the first 8 hex chars of md5 over the
  * shingle's UTF-8 bytes ([[Md5Prefix32]]'s contract) taken `% P`.
  * Returns NULL for fewer than 3 tokens — the explode pipeline's
  * row-drops-out semantics, reproduced by the caller's filter.
  */
object MinHashSigKernels {

  private val P: Long = graft.queries.TextQueries.P
  private val as: Array[Long] = graft.queries.TextQueries.perms.map(_._1).toArray
  private val bs: Array[Long] = graft.queries.TextQueries.perms.map(_._2).toArray

  private val patterns = new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  private def pattern(re: String): java.util.regex.Pattern = {
    val p = patterns.get(re)
    if (p != null) p
    else { val c = java.util.regex.Pattern.compile(re); patterns.putIfAbsent(re, c); c }
  }

  /** The tokenizer rules by tag — semantics identical to
    * [[graft.operators.Tokenizer]]'s column expressions (each is a
    * lower?+regex-split+drop-empties chain; the regexes are the same
    * strings those expressions pass to Spark's Java-regex engine).
    */
  def tokens(text: UTF8String, tag: String): Array[String] = {
    val (lowered, re) = tag match {
      case "house" => (text, " ")
      case "ascii" => (text.toLowerCase, "[^a-z0-9]+")
      case "unicode_cf" => (text.toLowerCase, "[^\\p{L}\\p{N}]+")
      case "unicode" => (text, "[^\\p{L}\\p{N}]+")
      case other => throw new IllegalArgumentException(
        s"minhash_sig_full: unknown tokenizer tag '$other'")
    }
    pattern(re).split(lowered.toString, -1).filter(_.nonEmpty)
  }

  /** All 32 permutation minima, or null when the text yields fewer than
    * 3 tokens (no shingle exists).
    */
  def signature(text: UTF8String, tag: String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = tokens(text, tag)
    if (toks.length < 3) return null
    val mins = Array.fill(as.length)(P)
    var i = 0
    while (i + 2 < toks.length) {
      val shingle = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      // THE one definition of the first-4-digest-bytes hash — Md5Prefix32
      // owns it (and its per-thread digest); the kernels must never fork it
      val h = Md5Prefix32.hash(
        shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8)) % P
      var j = 0
      while (j < as.length) {
        val x = (as(j) * h + bs(j)) % P
        if (x < mins(j)) mins(j) = x
        j += 1
      }
      i += 1
    }
    // primitive-backed array — GenericArrayData over Array[Long] boxes
    // every element per row on this hot path
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(mins)
  }
}

case class MinHashSigFull(child: Expression, tokenizerTag: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig_full requires a string input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // fewer than 3 tokens
  override def prettyName: String = "minhash_sig_full"

  protected override def nullSafeEval(v: Any): Any =
    MinHashSigKernels.signature(v.asInstanceOf[UTF8String], tokenizerTag)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagRef = ctx.addReferenceObj("tokTag", tokenizerTag, "java.lang.String")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        |${ev.value} = graft.functions.MinHashSigKernels.signature($v, $tagRef);
        |${ev.isNull} = (${ev.value} == null);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigFull =
    copy(child = newChild)
}

object MinHashSigFull {
  import org.apache.spark.sql.graft.ColumnBridge

  def minhashSigFull(text: Column, tokenizerTag: String): Column =
    ColumnBridge.column(MinHashSigFull(ColumnBridge.expression(text), tokenizerTag))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row n-gram language-model log-probability kernel with
  * STUPID BACKOFF smoothing (Brants et al., "Large Language Models in
  * Machine Translation", EMNLP'07 §3 — the smoothing designed for
  * distributed corpus-scale counts: no discount redistribution, so the
  * model is NOTHING but raw gram counts and one backoff constant). This
  * is the scoring half of the CCNet/KenLM perplexity-filter stage
  * (Wenzek et al. 2020 §4.3); [[graft.operators.NgramLm]] fits the
  * counts and wraps this expression.
  *
  * Per token position i (0-based) with start order o0 = min(i+1, n):
  * try the longest gram ending at i; on a miss (gram OR its context
  * absent from the pruned count table) back off one order and pay the
  * α = 0.4 penalty once per level; at order 1 an unseen token scores as
  * count 1 over the corpus total (the deterministic OOV floor). The
  * per-position value is the integer micro-unit
  * `(o0−o)·AlphaPenaltyMicro + floor((ln c − ln d)·10⁶)` and the row
  * result is the plain integer SUM over positions — order-independent,
  * so the DuckDB oracle's unnest+join recompute hash-matches exactly.
  * The α penalty is the PINNED integer [[NgramLmKernel.AlphaPenaltyMicro]]
  * (= floor(ln 0.4 ·10⁶)), NOT a float multiplied at score time: the
  * only float work either engine does is `ln` of count doubles, the
  * op-order-pinned pattern `q_dsir_weights` already proves bit-stable
  * across Spark and DuckDB.
  *
  * Counts ≤ context counts by construction (a gram occurrence is an
  * occurrence of its prefix), so every position value is ≤ 0 and the
  * negated sum is a non-negative NLL — integer division by the token
  * count (both engines truncate-toward-zero = floor on non-negatives)
  * gives the per-token NLL the CCNet buckets rank on.
  *
  * The count table rides the expression as a plan REFERENCE object
  * (never a per-row literal rebuild — the r13 PqEncode lesson). Zero
  * tokens → 0 (an empty document carries no evidence, not a NULL).
  */
object NgramLmKernel {

  /** floor(ln(0.4)·10⁶): the stupid-backoff α = 0.4 per-level penalty,
    * pinned as an integer so neither engine reproduces the float
    * constant at score time.
    */
  val AlphaPenaltyMicro: Long = -916291L

  def score(text: UTF8String, tag: String, n: Int,
      table: LmTable, totalTokens: Long): Long =
    scoreTokens(MinHashSigKernels.tokens(text, tag), n, table.counts,
      totalTokens)

  /** [[score]] fused with the token count: `[Σ logprob micro, n_tokens]`
    * as one primitive long array, so the per-token-NLL stage tokenizes
    * ONCE instead of paying a second full tokenize for `size(tokens)`
    * (unfused paid ~1.5× of plain scoring at 500k docs; fused times
    * identical to plain scoring — SCALE.md round 18, incl. the
    * alias-anchoring requirement that makes the fusion actually land).
    */
  def scoreWithCount(text: UTF8String, tag: String, n: Int,
      table: LmTable,
      totalTokens: Long): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = MinHashSigKernels.tokens(text, tag)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(Array(
        scoreTokens(toks, n, table.counts, totalTokens), toks.length.toLong))
  }

  private def scoreTokens(toks: Array[String], n: Int,
      counts: java.util.HashMap[String, java.lang.Long],
      totalTokens: Long): Long = {
    val lnTotal = math.log(totalTokens.toDouble)
    var sum = 0L
    var i = 0
    while (i < toks.length) {
      val o0 = math.min(i + 1, n)
      // One builder for the longest window ending at i; shorter grams
      // drop LEFTMOST tokens, so they are suffixes — substring, no rejoin.
      val sb = new java.lang.StringBuilder
      val starts = new Array[Int](o0)
      var j = 0
      while (j < o0) {
        if (j > 0) sb.append(' ')
        starts(j) = sb.length
        sb.append(toks(i - o0 + 1 + j))
        j += 1
      }
      val full = sb.toString
      val ctxEnd = if (o0 > 1) starts(o0 - 1) - 1 else 0
      var v = 0L
      var done = false
      var o = o0
      while (o >= 2 && !done) {
        val gram = full.substring(starts(o0 - o))
        val c = counts.get(gram)
        if (c != null) {
          val d = counts.get(full.substring(starts(o0 - o), ctxEnd))
          if (d != null) {
            v = (o0 - o) * AlphaPenaltyMicro +
              math.floor((math.log(c.longValue.toDouble) -
                math.log(d.longValue.toDouble)) * 1e6).toLong
            done = true
          }
        }
        o -= 1
      }
      if (!done) {
        val c1 = counts.get(toks(i))
        val cv = if (c1 != null) c1.longValue else 1L
        v = (o0 - 1) * AlphaPenaltyMicro +
          math.floor((math.log(cv.toDouble) - lnTotal) * 1e6).toLong
      }
      sum += v
      i += 1
    }
    sum
  }
}

/** Plan reference holder for the LM count table — identity equality and
  * hashCode (the [[BpeTable]] pattern), NOT the HashMap's content-based
  * O(model-size) ones: Catalyst compares and hashes expressions
  * repeatedly during planning (subexpression elimination, ExpressionSet,
  * canonicalization), and a multi-million-entry map as a direct
  * case-class field would make every such call traverse the model.
  */
final class LmTable(val counts: java.util.HashMap[String, java.lang.Long])
  extends Serializable

case class NgramLmScore(child: Expression, tokenizerTag: String, n: Int,
    table: LmTable, totalTokens: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (n < 1) TypeCheckResult.TypeCheckFailure(
        s"ngram_lm_score: order must be >= 1, got $n")
      else if (totalTokens <= 0) TypeCheckResult.TypeCheckFailure(
        s"ngram_lm_score: totalTokens must be > 0, got $totalTokens")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_lm_score requires a string input, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "ngram_lm_score"

  protected override def nullSafeEval(v: Any): Any =
    NgramLmKernel.score(v.asInstanceOf[UTF8String], tokenizerTag, n, table,
      totalTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagRef = ctx.addReferenceObj("tokTag", tokenizerTag, "java.lang.String")
    val cntRef = ctx.addReferenceObj("lmTable", table,
      "graft.functions.LmTable")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        |${ev.value} = graft.functions.NgramLmKernel.score($v, $tagRef,
        |  $n, $cntRef, ${totalTokens}L);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NgramLmScore =
    copy(child = newChild)
}

/** [[NgramLmScore]] fused with the token count: returns the primitive
  * long array `[Σ logprob micro, n_tokens]` from ONE tokenize pass —
  * the shape [[graft.operators.NgramLm.scoreWithNll]] unpacks. The
  * caller MUST alias this expression to its own column and consume the
  * alias: inlined at each `element_at` site, CollapseProject plus the
  * conditional NLL branches re-evaluate the kernel per reference and
  * the fusion wins nothing (measured — SCALE.md round 18); behind a
  * non-cheap multiply-referenced alias the projections stay split and
  * the kernel runs once per row.
  */
case class NgramLmScoreCount(child: Expression, tokenizerTag: String, n: Int,
    table: LmTable, totalTokens: Long)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (n < 1) TypeCheckResult.TypeCheckFailure(
        s"ngram_lm_score_count: order must be >= 1, got $n")
      else if (totalTokens <= 0) TypeCheckResult.TypeCheckFailure(
        s"ngram_lm_score_count: totalTokens must be > 0, got $totalTokens")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngram_lm_score_count requires a string input, got $t")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_lm_score_count"

  protected override def nullSafeEval(v: Any): Any =
    NgramLmKernel.scoreWithCount(v.asInstanceOf[UTF8String], tokenizerTag, n,
      table, totalTokens)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagRef = ctx.addReferenceObj("tokTag", tokenizerTag, "java.lang.String")
    val cntRef = ctx.addReferenceObj("lmTable", table,
      "graft.functions.LmTable")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        |${ev.value} = graft.functions.NgramLmKernel.scoreWithCount($v, $tagRef,
        |  $n, $cntRef, ${totalTokens}L);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): NgramLmScoreCount =
    copy(child = newChild)
}

object NgramLmScore {
  import org.apache.spark.sql.graft.ColumnBridge

  def ngramLmScore(text: Column, tokenizerTag: String, n: Int,
      table: LmTable, totalTokens: Long): Column =
    ColumnBridge.column(NgramLmScore(ColumnBridge.expression(text),
      tokenizerTag, n, table, totalTokens))

  def ngramLmScoreCount(text: Column, tokenizerTag: String, n: Int,
      table: LmTable, totalTokens: Long): Column =
    ColumnBridge.column(NgramLmScoreCount(ColumnBridge.expression(text),
      tokenizerTag, n, table, totalTokens))
}

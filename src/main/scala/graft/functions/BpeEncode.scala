package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row byte-pair-encoding kernel: pre-tokenize → per-word
  * greedy merge loop → subword tokens (or vocabulary ids), in ONE native
  * codegen'd call — the model-true token surface every public training
  * pipeline packs and budgets by (Sennrich et al. ACL'16; the merge
  * APPLICATION order matches the HuggingFace `tokenizers` BPE model:
  * repeatedly merge the single occurrence with the lowest
  * (merge-rank, position), recomputed after every merge — which is what
  * the priority-queue implementation computes, one pop at a time).
  *
  * Determinism is the whole point: the same (merges, vocab, tokenizer
  * tag) produce the same token stream on every engine, so the DuckDB
  * oracle re-runs the IDENTICAL loop as a recursive CTE over token
  * lists and hash-matches tokens, ids, and counts. No RNG, no
  * locale-sensitive operations (words come from the shared
  * [[MinHashSigKernels.tokens]] rules), and integer ranks only.
  *
  * The model rides the plan as ONE reference object ([[BpeTable]]) —
  * never a per-row literal rebuild (the r13 PqEncode lesson). Each task
  * deserializes its own copy, whose transient per-word memo cache makes
  * the amortized cost per repeated word a single hash lookup (real
  * corpora repeat words constantly; real tokenizers cache exactly this
  * way). The cache is bounded, task-private, and never serialized.
  */
object BpeKernel {

  /** Separator inside rank-map keys. Merge parts must never contain it —
    * [[graft.operators.Bpe.Model]] validates at model build.
    */
  val Sep = "\u0001"

  /** Bound on the per-task word→tokens memo (entries). */
  val CacheMax = 1 << 16

  /** Unknown-token id: [[graft.operators.Bpe.Model]] pins vocab(0) to
    * `<unk>`, so 0 is always the id of the unknown token.
    */
  val UnkId = 0L

  /** Split one word into code-point strings (surrogate-pair safe — a
    * non-BMP character is ONE base token, not two broken halves).
    */
  private def codePoints(word: String): Array[String] = {
    val out = new Array[String](word.codePointCount(0, word.length))
    var i = 0
    var k = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      out(k) = new String(Character.toChars(cp))
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** The greedy merge loop for one word: repeatedly find the pair with
    * the lowest rank (ties → leftmost occurrence), merge that ONE
    * occurrence, recompute. O(len²) pair scans worst case — words are short,
    * and the memo cache makes repeats free.
    */
  private def mergeWord(word: String,
      ranks: java.util.HashMap[String, Integer]): Array[String] = {
    var toks = codePoints(word)
    var done = toks.length <= 1
    while (!done) {
      var bestRank = Int.MaxValue
      var bestPos = -1
      var i = 0
      while (i < toks.length - 1) {
        val r = ranks.get(toks(i) + Sep + toks(i + 1))
        if (r != null && r.intValue() < bestRank) {
          bestRank = r.intValue()
          bestPos = i
        }
        i += 1
      }
      if (bestPos < 0) done = true
      else {
        val next = new Array[String](toks.length - 1)
        System.arraycopy(toks, 0, next, 0, bestPos)
        next(bestPos) = toks(bestPos) + toks(bestPos + 1)
        System.arraycopy(toks, bestPos + 2, next, bestPos + 1,
          toks.length - bestPos - 2)
        toks = next
        done = toks.length <= 1
      }
    }
    toks
  }

  /** BPE tokens of a word, memoized per task via the table's cache. */
  def wordTokens(word: String, table: BpeTable): Array[String] = {
    val cached = table.cache.get(word)
    if (cached != null) cached
    else {
      val out = mergeWord(word, table.ranks)
      if (table.cache.size < CacheMax) table.cache.put(word, out)
      out
    }
  }

  /** Full-document token stream: pre-tokenize by the tag's rule, then
    * concatenate each word's BPE tokens in order. Empty text → empty
    * array (a legal zero-token document, NOT null).
    */
  def encodeWords(text: UTF8String, tag: String,
      table: BpeTable): Array[Array[String]] = {
    val words = MinHashSigKernels.tokens(text, tag)
    val out = new Array[Array[String]](words.length)
    var i = 0
    while (i < words.length) {
      out(i) = wordTokens(words(i), table)
      i += 1
    }
    out
  }

  def tokens(text: UTF8String, tag: String, table: BpeTable): GenericArrayData = {
    val parts = encodeWords(text, tag, table)
    var n = 0
    var i = 0
    while (i < parts.length) { n += parts(i).length; i += 1 }
    val flat = new Array[Any](n)
    var k = 0
    i = 0
    while (i < parts.length) {
      val p = parts(i)
      var j = 0
      while (j < p.length) { flat(k) = UTF8String.fromString(p(j)); k += 1; j += 1 }
      i += 1
    }
    new GenericArrayData(flat)
  }

  def ids(text: UTF8String, tag: String,
      table: BpeTable): org.apache.spark.sql.catalyst.util.ArrayData = {
    val parts = encodeWords(text, tag, table)
    var n = 0
    var i = 0
    while (i < parts.length) { n += parts(i).length; i += 1 }
    val flat = new Array[Long](n)
    var k = 0
    i = 0
    while (i < parts.length) {
      val p = parts(i)
      var j = 0
      while (j < p.length) {
        val id = table.vocab.get(p(j))
        flat(k) = if (id == null) UnkId else id.longValue()
        k += 1
        j += 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(flat)
  }

  /** Token COUNT only — no per-token array materialization on the count
    * path (the packing/budgeting hot path needs just the number).
    */
  def count(text: UTF8String, tag: String, table: BpeTable): Long = {
    val parts = encodeWords(text, tag, table)
    var n = 0L
    var i = 0
    while (i < parts.length) { n += parts(i).length; i += 1 }
    n
  }
}

/** The model's executable form, shipped as one plan reference object:
  * rank lookup (`left`+SEP+`right` → merge index), vocabulary id lookup
  * (token → id), and a transient task-private word memo.
  */
final class BpeTable(
    val ranks: java.util.HashMap[String, Integer],
    val vocab: java.util.HashMap[String, java.lang.Long]) extends Serializable {
  @transient lazy val cache = new java.util.HashMap[String, Array[String]]()
}

abstract class BpeExpressionBase extends UnaryExpression {
  def tokenizerTag: String
  def table: BpeTable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got $t")
  }
}

/** `array<string>` of BPE tokens. */
case class BpeTokens(child: Expression, tokenizerTag: String, table: BpeTable)
    extends BpeExpressionBase {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_tokens"

  protected override def nullSafeEval(v: Any): Any =
    BpeKernel.tokens(v.asInstanceOf[UTF8String], tokenizerTag, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagRef = ctx.addReferenceObj("tokTag", tokenizerTag, "java.lang.String")
    val tabRef = ctx.addReferenceObj("bpeTable", table, "graft.functions.BpeTable")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BpeKernel.tokens($v, $tagRef, $tabRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

/** `array<bigint>` of vocabulary ids (unknown token → 0 = `<unk>`). */
case class BpeIds(child: Expression, tokenizerTag: String, table: BpeTable)
    extends BpeExpressionBase {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bpe_ids"

  protected override def nullSafeEval(v: Any): Any =
    BpeKernel.ids(v.asInstanceOf[UTF8String], tokenizerTag, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagRef = ctx.addReferenceObj("tokTag", tokenizerTag, "java.lang.String")
    val tabRef = ctx.addReferenceObj("bpeTable", table, "graft.functions.BpeTable")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BpeKernel.ids($v, $tagRef, $tabRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeIds =
    copy(child = newChild)
}

/** `bigint` token count — the packing/budget form; no token array built. */
case class BpeCount(child: Expression, tokenizerTag: String, table: BpeTable)
    extends BpeExpressionBase {

  override def dataType: DataType = LongType
  override def prettyName: String = "bpe_count"

  protected override def nullSafeEval(v: Any): Any =
    BpeKernel.count(v.asInstanceOf[UTF8String], tokenizerTag, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagRef = ctx.addReferenceObj("tokTag", tokenizerTag, "java.lang.String")
    val tabRef = ctx.addReferenceObj("bpeTable", table, "graft.functions.BpeTable")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.BpeKernel.count($v, $tagRef, $tabRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeCount =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row DSIR importance-weight kernel (Xie et al., "Data
  * Selection for Language Models via Importance Resampling", NeurIPS'23):
  * tokenize → hashed unigram+bigram buckets → Σ log-ratio, in ONE native
  * codegen'd call.
  *
  * The model is a bucketed log-likelihood-ratio table in integer
  * MICRO-UNITS (`lrMicro(b) = floor(1e6·(ln p_target(b) − ln p_raw(b)))`,
  * fitted once by [[graft.operators.Dsir.fit]]): integer per-gram
  * contributions make the per-doc sum order-independent, so the DuckDB
  * oracle's unnest+join+sum recompute hash-matches exactly (the q_bm25
  * micro-unit convention). The table rides the expression as a plan
  * REFERENCE object — never a per-row literal rebuild (the r13 PqEncode
  * lesson) and never a HOF fold (interpreted `CodegenFallback` on the hot
  * path, the retired-winnow lesson).
  *
  * Feature rule (must match the fit pass bit-for-bit): words by the
  * tokenizer tag's exact rule ([[MinHashSigKernels.tokens]] — the same
  * Java regexes Spark's column pipeline executes), grams = every word
  * plus every adjacent pair joined by one space, bucket =
  * [[Md5Prefix32]]-hash of the gram's UTF-8 bytes mod `buckets`. Zero
  * tokens → weight 0 (no grams, an empty sum — NOT null: an empty doc is
  * a legal corpus member with p_target/p_raw both uninformative).
  */
object DsirScoreKernel {
  def score(text: UTF8String, tag: String, buckets: Int,
      lrMicro: Array[Long]): Long = {
    val toks = MinHashSigKernels.tokens(text, tag)
    var sum = 0L
    var i = 0
    while (i < toks.length) {
      sum += lrMicro((Md5Prefix32.hash(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        % buckets).toInt)
      if (i + 1 < toks.length) {
        val bi = toks(i) + " " + toks(i + 1)
        sum += lrMicro((Md5Prefix32.hash(
          bi.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          % buckets).toInt)
      }
      i += 1
    }
    sum
  }
}

case class DsirScore(child: Expression, tokenizerTag: String, buckets: Int,
    lrMicro: Array[Long]) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (lrMicro.length == buckets) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"dsir_score: lrMicro has ${lrMicro.length} entries for $buckets buckets")
    case t => TypeCheckResult.TypeCheckFailure(
      s"dsir_score requires a string input, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "dsir_score"

  protected override def nullSafeEval(v: Any): Any =
    DsirScoreKernel.score(v.asInstanceOf[UTF8String], tokenizerTag, buckets,
      lrMicro)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagRef = ctx.addReferenceObj("tokTag", tokenizerTag, "java.lang.String")
    val lrRef = ctx.addReferenceObj("lrMicro", lrMicro, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        |${ev.value} = graft.functions.DsirScoreKernel.score($v, $tagRef,
        |  $buckets, $lrRef);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScore =
    copy(child = newChild)
}

object DsirScore {
  import org.apache.spark.sql.graft.ColumnBridge

  def dsirScore(text: Column, tokenizerTag: String, buckets: Int,
      lrMicro: Array[Long]): Column =
    ColumnBridge.column(DsirScore(ColumnBridge.expression(text), tokenizerTag,
      buckets, lrMicro))
}

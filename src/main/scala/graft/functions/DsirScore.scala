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

/** K-class variant: ONE tokenize+hash pass scores K hashed-gram linear
  * models at once (per-class biases seed the sums), returning the K
  * logits as a primitive long array. Each gram's bucket is computed
  * ONCE and charged to every class — K separate
  * [[DsirScoreKernel.score]] calls would re-tokenize and re-hash the
  * document K times. This is the fastText-style language-ID /
  * multi-label routing shape (CCNet's LID stage): the caller argmaxes
  * the array.
  *
  * `wFlat` is BUCKET-MAJOR (`wFlat(b*k + c)`): the K weights a gram
  * touches sit contiguous (~⌈K/8⌉ cache lines), so the inner class loop
  * streams — class-major would stride `buckets` longs apart and pay up
  * to K cache misses per gram once the matrix outgrows L2 (it does: the
  * matrix is K×buckets×8 bytes — ~100 MB at fastText scale, 200
  * languages × 2^16 buckets). Per the round-18 fusion lesson
  * ([[NgramLmScoreCount]]): alias the expression to its own column
  * before consuming it more than once.
  */
object DsirScoreMultiKernel {
  def scoreMulti(text: UTF8String, tag: String, buckets: Int, k: Int,
      wFlat: Array[Long],
      biasMicro: Array[Long]): org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = MinHashSigKernels.tokens(text, tag)
    val sums = java.util.Arrays.copyOf(biasMicro, k)
    var i = 0
    while (i < toks.length) {
      val o1 = (Md5Prefix32.hash(
        toks(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        % buckets).toInt * k
      var c = 0
      while (c < k) { sums(c) += wFlat(o1 + c); c += 1 }
      if (i + 1 < toks.length) {
        val bi = toks(i) + " " + toks(i + 1)
        val o2 = (Md5Prefix32.hash(
          bi.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          % buckets).toInt * k
        c = 0
        while (c < k) { sums(c) += wFlat(o2 + c); c += 1 }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(sums)
  }
}

case class DsirScoreMulti(child: Expression, tokenizerTag: String,
    buckets: Int, k: Int, wFlat: Array[Long], biasMicro: Array[Long])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType =>
      if (k < 1) TypeCheckResult.TypeCheckFailure(
        s"dsir_score_multi: k must be >= 1, got $k")
      else if (wFlat.length != k * buckets) TypeCheckResult.TypeCheckFailure(
        s"dsir_score_multi: wFlat has ${wFlat.length} entries for " +
          s"$k × $buckets")
      else if (biasMicro.length != k) TypeCheckResult.TypeCheckFailure(
        s"dsir_score_multi: ${biasMicro.length} biases for $k classes")
      else TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dsir_score_multi requires a string input, got $t")
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dsir_score_multi"

  protected override def nullSafeEval(v: Any): Any =
    DsirScoreMultiKernel.scoreMulti(v.asInstanceOf[UTF8String], tokenizerTag,
      buckets, k, wFlat, biasMicro)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagRef = ctx.addReferenceObj("tokTag", tokenizerTag, "java.lang.String")
    val wRef = ctx.addReferenceObj("wFlat", wFlat, "long[]")
    val bRef = ctx.addReferenceObj("biasMicro", biasMicro, "long[]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        |${ev.value} = graft.functions.DsirScoreMultiKernel.scoreMulti($v,
        |  $tagRef, $buckets, $k, $wRef, $bRef);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): DsirScoreMulti =
    copy(child = newChild)
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

  def dsirScoreMulti(text: Column, tokenizerTag: String, buckets: Int,
      k: Int, wFlat: Array[Long], biasMicro: Array[Long]): Column =
    ColumnBridge.column(DsirScoreMulti(ColumnBridge.expression(text),
      tokenizerTag, buckets, k, wFlat, biasMicro))
}

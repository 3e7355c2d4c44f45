package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-row token-frequency kernel: tokenize → per-distinct-term
  * counts + document length, in ONE native call — the
  * [[MinHashSigFull]] treatment for the inverted-index build.
  *
  * Value-exact twin of the explode/aggregate pipeline it replaces
  * (`explode(tokens)` → `groupBy(doc_id, dl, term).agg(count)`): a
  * document's (term, tf) multiset depends only on its own text, so the
  * whole postings computation becomes a MAP-SIDE PROJECTION — no
  * token-occurrence rows materialize, and the per-(doc, term) count
  * aggregation (one hash Exchange over every distinct pair in the
  * corpus) disappears from every index build/append/ingest.
  *
  * Output: `struct(dl BIGINT, tfs ARRAY<STRUCT<term STRING, tf BIGINT>>)`
  * — `dl` the total token count, `tfs` one entry per distinct term in
  * FIRST-OCCURRENCE order (deterministic per text; consumers explode it,
  * so order is semantically irrelevant). NULL text → NULL struct (the
  * explode pipeline's row-drops-out + null-length semantics, reproduced
  * by the caller's field extraction). Zero tokens → (0, []).
  *
  * Tokenization is [[MinHashSigKernels.tokens]] — THE one native mirror
  * of [[graft.operators.Tokenizer]]'s column rules (parity locked in
  * the kernel specs); this kernel must never fork its own.
  */
object TokenTfKernels {

  val EntryType: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false)))

  val OutType: StructType = StructType(Seq(
    StructField("dl", LongType, nullable = false),
    StructField("tfs", ArrayType(EntryType, containsNull = false),
      nullable = false)))

  def tokenTf(text: UTF8String, tag: String): InternalRow = {
    val toks = MinHashSigKernels.tokens(text, tag)
    val counts = new java.util.LinkedHashMap[String, java.lang.Long]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val prev = counts.get(t)
      counts.put(t, if (prev == null) 1L else prev.longValue + 1L)
      i += 1
    }
    val entries = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      entries(j) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue.longValue))
      j += 1
    }
    new GenericInternalRow(Array[Any](
      toks.length.toLong, new GenericArrayData(entries)))
  }
}

case class TokenTf(child: Expression, tokenizerTag: String)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"token_tf requires a string input, got $t")
  }

  override def dataType: DataType = TokenTfKernels.OutType
  override def prettyName: String = "token_tf"

  protected override def nullSafeEval(v: Any): Any =
    TokenTfKernels.tokenTf(v.asInstanceOf[UTF8String], tokenizerTag)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tagRef = ctx.addReferenceObj("tokTag", tokenizerTag, "java.lang.String")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        |${ev.value} = graft.functions.TokenTfKernels.tokenTf($v, $tagRef);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): TokenTf =
    copy(child = newChild)
}

object TokenTf {
  import org.apache.spark.sql.graft.ColumnBridge

  def tokenTf(text: Column, tokenizerTag: String): Column =
    ColumnBridge.column(TokenTf(ColumnBridge.expression(text), tokenizerTag))
}

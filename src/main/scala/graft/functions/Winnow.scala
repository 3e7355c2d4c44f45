package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing-fingerprint kernel (Schleimer et al. SIGMOD'03): the
  * whole per-row pipeline — md5-prefix hash of every character `k`-gram,
  * `w`-window minima, sorted distinct — in one tight JVM loop.
  *
  * Value-exact twin of the column formulation it replaced
  * (`transform(sequence(…), i => md5_prefix32(substr(text, i, k)))` +
  * per-window `array_min(slice(…))` + `array_sort(array_distinct(…))`,
  * locked by `OperatorsSpec`/the winnow oracles): same code-point
  * `substr` semantics (`UTF8String.substringSQL`), same md5-over-UTF-8
  * hashing, same first-4-bytes-as-unsigned value. Besides removing the
  * interpreted higher-order-function layers, the window pass drops from
  * O(len·w) (a `slice` copy + `array_min` per window) to O(len) via a
  * monotonic deque.
  */
object WinnowKernels {

  /** Sorted distinct window minima, or null when the text holds fewer
    * than `k` characters (no gram exists — the caller's filter contract).
    * Fewer than `w` grams: the whole doc is one window (winnowing's
    * natural degenerate case).
    */
  def fingerprints(text: UTF8String, k: Int, w: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = text.numChars()
    if (n < k) return null
    val nGrams = n - k + 1
    val hashes = new Array[Long](nGrams)
    var i = 0
    while (i < nGrams) {
      // 1-based code-point substring — Substring/substr's exact rule;
      // the hash is Md5Prefix32's own (THE one definition of the
      // first-4-digest-bytes value every oracle mirrors)
      hashes(i) = Md5Prefix32.hash(text.substringSQL(i + 1, k).getBytes)
      i += 1
    }
    val outN = if (nGrams >= w) nGrams - w + 1 else 1
    val mins = new Array[Long](outN)
    if (nGrams < w) {
      var m = hashes(0); var j = 1
      while (j < nGrams) { if (hashes(j) < m) m = hashes(j); j += 1 }
      mins(0) = m
    } else {
      // monotonic deque of indices: front = current window's minimum
      val dq = new Array[Int](nGrams)
      var head = 0; var tail = 0; var j = 0
      while (j < nGrams) {
        while (tail > head && hashes(dq(tail - 1)) >= hashes(j)) tail -= 1
        dq(tail) = j; tail += 1
        if (dq(head) <= j - w) head += 1
        if (j >= w - 1) mins(j - w + 1) = hashes(dq(head))
        j += 1
      }
    }
    java.util.Arrays.sort(mins)
    var distinct = 0
    var j = 0
    while (j < mins.length) {
      if (j == 0 || mins(j) != mins(j - 1)) { mins(distinct) = mins(j); distinct += 1 }
      j += 1
    }
    // primitive-backed (no per-element boxing on the hot path)
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(mins, distinct))
  }
}

case class WinnowFp(child: Expression, k: Int, w: Int)
    extends UnaryExpression {
  require(k >= 2 && w >= 1, s"winnow_fp: need k >= 2 and w >= 1, got k=$k w=$w")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"winnow_fp requires a string input, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true // text shorter than k
  override def prettyName: String = "winnow_fp"

  protected override def nullSafeEval(v: Any): Any =
    WinnowKernels.fingerprints(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        |${ev.value} = graft.functions.WinnowKernels.fingerprints($v, $k, $w);
        |${ev.isNull} = (${ev.value} == null);
      """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFp =
    copy(child = newChild)
}

object WinnowFp {
  import org.apache.spark.sql.graft.ColumnBridge

  def winnowFp(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFp(ColumnBridge.expression(text), k, w))
}

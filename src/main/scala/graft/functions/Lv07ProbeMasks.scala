package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Native Catalyst expression running the Lv'07 multi-probe sequence
  * generator ([[graft.operators.Similarity.probeMasks]] — min-heap over
  * flip-bit sets in global total-margin order) PER ROW, so the deep
  * multi-probe regime of `annJoinTopKMultiProbe` stays fully in-plan:
  * no driver collect of the query set, no literal qid → buckets map, and
  * therefore no query-count bound, no qid-uniqueness contract and no
  * double-evaluation hazard. Input: the per-bit |margin| array in BIT
  * order and the number of masks; output: flip masks (XOR against the
  * query's own bucket gives the probe sequence), exactly the single-query
  * form's order — the equivalence spec in `OperatorsSpec` rides on it.
  */
case class Lv07ProbeMasksExpr(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"lv07_probe_masks requires (array<double>, foldable int), got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "lv07_probe_masks"

  protected override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val n = a.numElements()
    val margins = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null // a null margin means a null query vec
      margins(i) = a.getDouble(i)
      i += 1
    }
    val masks = graft.operators.Similarity.probeMasks(
      scala.collection.immutable.ArraySeq.unsafeWrapArray(margins),
      r.asInstanceOf[Int])
    new GenericArrayData(masks.toArray)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Lv07ProbeMasks {
  /** `absMargins` (array&lt;double&gt;, bit order) → the first `count`
    * Lv'07 flip masks as an `array<int>` column.
    */
  def masksCol(absMargins: Column, count: Int): Column =
    ColumnBridge.column(Lv07ProbeMasksExpr(
      ColumnBridge.expression(absMargins), Literal(count)))
}

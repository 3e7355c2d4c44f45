package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType,
  LongType}

/** Bounded top-k ids by score as ONE aggregate: the buffer is a k-capped
  * heap of (score, id), so partial (map-side) aggregation reduces each
  * partition to at most k entries BEFORE the shuffle — a per-group top-k
  * whose shuffle is O(partitions × k) rows instead of the O(rows) a
  * window `row_number` ranking pays. This is the aggregation shape that
  * makes whole-sample ANN recall evaluation one job at 100 TB (see
  * [[graft.operators.Similarity.annRecallAtBatch]]).
  *
  * Ranking matches the repo's ANN convention exactly: score descending,
  * then id ascending on ties. Output: `array<long>` of the winning ids in
  * rank order. Null scores/ids are skipped.
  */
case class TopKIdsAgg(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.PriorityQueue[(Double, Long)]]
  with ImplicitCastInputTypes {

  // analysis-time contract: a float score or int id registered through
  // topk_ids coerces here instead of ClassCastException-ing on an executor
  // (Seq[DataType] conforms to the Seq[AbstractDataType] signature —
  // AbstractDataType itself is private[sql])
  override def inputTypes: Seq[DataType] =
    Seq(DoubleType, LongType, IntegerType)

  private lazy val k: Int = {
    val v = kExpr.eval(InternalRow.empty)
    require(v != null, "topk_ids k must be a literal")
    val n = v.asInstanceOf[Number].intValue()
    require(n >= 1, s"topk_ids k must be >= 1, got $n")
    n
  }

  // dequeue yields the WORST kept entry (lowest score, then highest id) so
  // a better candidate can evict it in O(log k)
  private def worstFirst: Ordering[(Double, Long)] =
    Ordering.by { case (s, i) => (-s, i) }

  override def createAggregationBuffer(): scala.collection.mutable.PriorityQueue[(Double, Long)] =
    scala.collection.mutable.PriorityQueue.empty(worstFirst)

  private def offer(buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      s: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      if (s > ws || (s == ws && i < wi)) { buf.dequeue(); buf.enqueue((s, i)) }
    }
  }

  override def update(buf: scala.collection.mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val sv = score.eval(input)
    val iv = id.eval(input)
    if (sv != null && iv != null)
      offer(buf, sv.asInstanceOf[Double], iv.asInstanceOf[Long])
    buf
  }

  override def merge(b1: scala.collection.mutable.PriorityQueue[(Double, Long)],
      b2: scala.collection.mutable.PriorityQueue[(Double, Long)]): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach { case (s, i) => offer(b1, s, i) }
    b1
  }

  override def eval(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Any =
    ArrayData.toArrayData(
      buf.toArray.sortBy { case (s, i) => (-s, i) }.map(_._2))

  override def serialize(buf: scala.collection.mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val entries = buf.toArray
    val bb = ByteBuffer.allocate(4 + 16 * entries.length)
    bb.putInt(entries.length)
    entries.foreach { case (s, i) => bb.putDouble(s); bb.putLong(i) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): scala.collection.mutable.PriorityQueue[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var j = 0
    while (j < n) { buf.enqueue((bb.getDouble, bb.getLong)); j += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id, kExpr)
  override def prettyName: String = "topk_ids"

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKIdsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKIdsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKIdsAgg =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

object TopKIdsAgg {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_ids", exprs => TopKIdsAgg(exprs(0), exprs(1), exprs(2)), "built-in")

  /** Aggregate Column: ids of the k highest scores, rank-ordered (requires
    * [[register]]).
    */
  def topkIds(score: Column, id: Column, k: Int): Column =
    call_function("topk_ids", score, id, lit(k))
}

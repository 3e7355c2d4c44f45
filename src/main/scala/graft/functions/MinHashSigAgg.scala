package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All-permutation MinHash signature as ONE aggregate: buffer = 32 running
  * minima of (a_j·h + b_j) mod P over the group's hash values. Replaces 32
  * separate `min()` aggregate columns — one buffer, one pass, a fraction of
  * the generated code — while producing bit-identical minima.
  *
  * The permutation constants are baked in from
  * [[graft.queries.TextQueries.perms]], so the DuckDB oracle SQL (generated
  * from the same seq) stays exact.
  */
case class MinHashSigAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val P: Long = graft.queries.TextQueries.P
  private val as: Array[Long] = graft.queries.TextQueries.perms.map(_._1).toArray
  private val bs: Array[Long] = graft.queries.TextQueries.perms.map(_._2).toArray
  private val n = as.length

  override def createAggregationBuffer(): Array[Long] = Array.fill(n)(P)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var j = 0
      while (j < n) {
        val x = (as(j) * h + bs(j)) % P
        if (x < buf(j)) buf(j) = x
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < n) { if (b2(j) < b1(j)) b1(j) = b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = ArrayData.toArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * n)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(n)(bb.getLong)
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "minhash_sig"

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashSigAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashSigAgg =
    copy(child = newChildren.head)
}

object MinHashSigAgg {
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSigAgg(exprs.head), "built-in")

  /** Aggregate Column producing array<long> of the 32 minima (requires
    * [[register]]).
    */
  def minhashSig(c: Column): Column = call_function("minhash_sig", c)
}

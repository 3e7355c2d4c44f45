package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Tight-loop kernels for the PQ codec expressions — one virtual call per
  * row from generated code, all hot loops plain JVM int/long arithmetic.
  * The math is the exact twin of [[graft.operators.Pq.quantizeUnitDriver]]
  * and the documented integer-L2 argmin / ADC-table contracts (PqSpec locks
  * both against driver brute force).
  */
object PqKernels {

  /** L2-normalize (index-ordered double sum, like fvec_dot), quantize to
    * the `scale` grid with floor(x+0.5), then per subspace the integer-L2
    * argmin codeword (tie → lowest code). Returns null for a ragged vector
    * (length ≠ subspaces·subDim) or a null element — malformed rows must
    * not get a quietly-wrong code.
    */
  def encode(vec: ArrayData, isDouble: Boolean,
      books: Array[Array[Array[Long]]], scale: Long): GenericArrayData = {
    val subspaces = books.length
    val subDim = books(0)(0).length
    val dim = subspaces * subDim
    if (vec.numElements() != dim) return null
    val xq = new Array[Long](dim)
    var ss = 0.0
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      val x = if (isDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      ss += x * x
      i += 1
    }
    val nrm = math.sqrt(ss)
    i = 0
    while (i < dim) {
      val x = if (isDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      xq(i) = if (nrm == 0.0) 0L else math.floor(x / nrm * scale + 0.5).toLong
      i += 1
    }
    val out = new Array[Int](subspaces)
    var s = 0
    while (s < subspaces) {
      val book = books(s)
      val off = s * subDim
      var bestCode = -1
      var bestD = Long.MaxValue
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var d = 0L
        var j = 0
        while (j < subDim) { val t = xq(off + j) - cw(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; bestCode = c }
        c += 1
      }
      out(s) = bestCode
      s += 1
    }
    new GenericArrayData(out)
  }

  /** RESIDUAL encode (the FAISS IVFADC recipe, Jégou TPAMI'11 §IV):
    * normalize + quantize exactly like [[encode]], then subtract the
    * row's coarse-cell quantized centroid BEFORE the per-subspace argmin
    * — the codebooks spend their bits on within-cell variance. Null for
    * ragged/null-element vectors or an unknown cell id (an index row
    * pointing at a centroid this codebook never saw must fail visibly).
    */
  def encodeRes(vec: ArrayData, isDouble: Boolean, cell: Int,
      cqByCell: Array[Array[Long]],
      books: Array[Array[Array[Long]]], scale: Long): GenericArrayData = {
    val subspaces = books.length
    val subDim = books(0)(0).length
    val dim = subspaces * subDim
    if (cell < 0 || cell >= cqByCell.length) return null
    val cq = cqByCell(cell)
    if (cq == null || cq.length != dim) return null
    if (vec.numElements() != dim) return null
    val xq = new Array[Long](dim)
    var ss = 0.0
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return null
      val x = if (isDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      ss += x * x
      i += 1
    }
    val nrm = math.sqrt(ss)
    i = 0
    while (i < dim) {
      val x = if (isDouble) vec.getDouble(i) else vec.getFloat(i).toDouble
      val q = if (nrm == 0.0) 0L else math.floor(x / nrm * scale + 0.5).toLong
      xq(i) = q - cq(i)
      i += 1
    }
    val out = new Array[Int](subspaces)
    var s = 0
    while (s < subspaces) {
      val book = books(s)
      val off = s * subDim
      var bestCode = -1
      var bestD = Long.MaxValue
      var c = 0
      while (c < book.length) {
        val cw = book(c)
        var d = 0L
        var j = 0
        while (j < subDim) { val t = xq(off + j) - cw(j); d += t * t; j += 1 }
        if (d < bestD) { bestD = d; bestCode = c }
        c += 1
      }
      out(s) = bestCode
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Integer-L2 argmin of one already-quantized subvector against the
    * codebook of subspace `sub` (tie → lowest code). Null for an unknown
    * subspace, a subvector of the wrong width, or a null element.
    */
  def assignSub(sub: Int, sv: ArrayData,
      books: Array[Array[Array[Long]]]): java.lang.Integer = {
    if (sub < 0 || sub >= books.length) return null
    val book = books(sub)
    val subDim = book(0).length
    if (sv.numElements() != subDim) return null
    val x = new Array[Long](subDim)
    var j = 0
    while (j < subDim) {
      if (sv.isNullAt(j)) return null
      x(j) = sv.getLong(j)
      j += 1
    }
    var bestCode = -1
    var bestD = Long.MaxValue
    var c = 0
    while (c < book.length) {
      val cw = book(c)
      var d = 0L
      j = 0
      while (j < subDim) { val t = x(j) - cw(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; bestCode = c }
      c += 1
    }
    java.lang.Integer.valueOf(bestCode)
  }

  /** Σ_s tables(s)(code_s) — exact BIGINT. Null for a ragged/null-element
    * code array or an out-of-range code id (never produced by [[encode]];
    * a corrupted index row must fail visibly downstream, not score 0).
    */
  def adc(code: ArrayData, tables: Array[Array[Long]]): java.lang.Long = {
    if (code.numElements() != tables.length) return null
    var sum = 0L
    var s = 0
    while (s < tables.length) {
      if (code.isNullAt(s)) return null
      val c = code.getInt(s)
      if (c < 0 || c >= tables(s).length) return null
      sum += tables(s)(c)
      s += 1
    }
    java.lang.Long.valueOf(sum)
  }
}

/** Batch-serving sibling of [[PqAdc]]: one reference object holds EVERY
  * query's ADC tables (`tables(qIdx)(sub)(code)`), and the row names which
  * query it is being scored for — the shape the per-query candidate join
  * produces. Same integer-exact sum, same null rules, plus null for an
  * unknown query index.
  */
case class PqAdcBatch(code: Expression, qIdx: Expression,
    tables: Array[Array[Array[Long]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = code
  override def right: Expression = qIdx

  override def checkInputDataTypes(): TypeCheckResult =
    (code.dataType, qIdx.dataType) match {
      case (ArrayType(IntegerType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_batch requires (array<int>, int), got $l and $r")
    }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc_batch"

  protected override def nullSafeEval(c: Any, q: Any): Any = {
    val qi = q.asInstanceOf[Int]
    if (qi < 0 || qi >= tables.length) null
    else PqKernels.adc(c.asInstanceOf[ArrayData], tables(qi))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tablesRef = ctx.addReferenceObj("adcTables3", tables, "long[][][]")
    val res = ctx.freshName("res")
    nullSafeCodeGen(ctx, ev, (c, q) => {
      s"""
        |java.lang.Long $res = ($q < 0 || $q >= $tablesRef.length)
        |  ? null : graft.functions.PqKernels.adc($c, $tablesRef[$q]);
        |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.longValue(); }
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAdcBatch =
    copy(code = newLeft, qIdx = newRight)
}

/** Native PQ encoder: float/double vector → `array<int>` of per-subspace
  * code ids. The codebooks ride as ONE plan reference object (not a
  * 16×256×4-literal expression tree — the higher-order-function
  * formulation rebuilt that literal per row and was ~1000× slower), and
  * the generated code is a single kernel call, so the scan stays inside
  * whole-stage codegen.
  */
case class PqEncode(child: Expression, books: Array[Array[Array[Long]]],
    scale: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires an array<float|double> input, got $t")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true // ragged / null-element input
  override def prettyName: String = "pq_encode"

  private def isDouble: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  protected override def nullSafeEval(v: Any): Any =
    PqKernels.encode(v.asInstanceOf[ArrayData], isDouble, books, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "long[][][]")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        |${ev.value} = graft.functions.PqKernels.encode(
        |  $v, $isDouble, $booksRef, ${scale}L);
        |${ev.isNull} = (${ev.value} == null);
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

/** Native RESIDUAL PQ encoder ([[PqKernels.encodeRes]]): (vector,
  * coarse-cell id) → `array<int>` code ids against residual-trained
  * codebooks. The per-cell quantized centroids and the codebooks each
  * ride as one plan reference object, so the encode scan stays a single
  * whole-stage-codegen'd kernel call per row, like [[PqEncode]].
  */
case class PqEncodeRes(vec: Expression, cell: Expression,
    cqByCell: Array[Array[Long]], books: Array[Array[Array[Long]]],
    scale: Long)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = vec
  override def right: Expression = cell

  override def checkInputDataTypes(): TypeCheckResult =
    (vec.dataType, cell.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_encode_res requires (array<float|double>, int), got $l and $r")
    }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "pq_encode_res"

  private def isDouble: Boolean =
    vec.dataType.asInstanceOf[ArrayType].elementType == DoubleType

  protected override def nullSafeEval(v: Any, c: Any): Any =
    PqKernels.encodeRes(v.asInstanceOf[ArrayData], isDouble,
      c.asInstanceOf[Int], cqByCell, books, scale)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cqRef = ctx.addReferenceObj("pqCellCq", cqByCell, "long[][]")
    val booksRef = ctx.addReferenceObj("pqBooks", books, "long[][][]")
    nullSafeCodeGen(ctx, ev, (v, c) => {
      s"""
        |${ev.value} = graft.functions.PqKernels.encodeRes(
        |  $v, $isDouble, $c, $cqRef, $booksRef, ${scale}L);
        |${ev.isNull} = (${ev.value} == null);
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncodeRes =
    copy(vec = newLeft, cell = newRight)
}

/** Native ADC scorer: `array<int>` PQ code → exact BIGINT Σ table lookups.
  * The per-query tables ride as one reference object; scoring a row is
  * `subspaces` array reads inside whole-stage codegen.
  */
case class PqAdc(child: Expression, tables: Array[Array[Long]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_adc requires an array<int> input, got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_adc"

  protected override def nullSafeEval(v: Any): Any =
    PqKernels.adc(v.asInstanceOf[ArrayData], tables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val tablesRef = ctx.addReferenceObj("adcTables", tables, "long[][]")
    val res = ctx.freshName("res")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
        |java.lang.Long $res = graft.functions.PqKernels.adc($v, $tablesRef);
        |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.longValue(); }
      """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqAdc =
    copy(child = newChild)
}

/** Per-(subspace, quantized-subvector) code assignment — the training-loop
  * sibling of [[PqEncode]] (training explodes rows into subspace rows, so
  * the subspace id is a COLUMN here). Same kernel math, same tie rule.
  */
case class PqAssignSub(sub: Expression, sv: Expression,
    books: Array[Array[Array[Long]]])
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def left: Expression = sub
  override def right: Expression = sv

  override def checkInputDataTypes(): TypeCheckResult =
    (sub.dataType, sv.dataType) match {
      case (IntegerType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_assign_sub requires (int, array<bigint>), got $l and $r")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "pq_assign_sub"

  protected override def nullSafeEval(s: Any, v: Any): Any =
    PqKernels.assignSub(s.asInstanceOf[Int], v.asInstanceOf[ArrayData], books)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val booksRef = ctx.addReferenceObj("pqBooks", books, "long[][][]")
    val res = ctx.freshName("res")
    nullSafeCodeGen(ctx, ev, (s, v) => {
      s"""
        |java.lang.Integer $res = graft.functions.PqKernels.assignSub($s, $v, $booksRef);
        |if ($res == null) { ${ev.isNull} = true; } else { ${ev.value} = $res.intValue(); }
      """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqAssignSub =
    copy(sub = newLeft, sv = newRight)
}

object PqCodec {
  import org.apache.spark.sql.graft.ColumnBridge

  def pqEncode(vec: Column, books: Array[Array[Array[Long]]], scale: Long): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(vec), books, scale))

  def pqEncodeRes(vec: Column, cell: Column, cqByCell: Array[Array[Long]],
      books: Array[Array[Array[Long]]], scale: Long): Column =
    ColumnBridge.column(PqEncodeRes(ColumnBridge.expression(vec),
      ColumnBridge.expression(cell), cqByCell, books, scale))

  def pqAdc(code: Column, tables: Array[Array[Long]]): Column =
    ColumnBridge.column(PqAdc(ColumnBridge.expression(code), tables))

  def pqAssignSub(sub: Column, sv: Column, books: Array[Array[Array[Long]]]): Column =
    ColumnBridge.column(PqAssignSub(
      ColumnBridge.expression(sub), ColumnBridge.expression(sv), books))

  def pqAdcBatch(code: Column, qIdx: Column,
      tables: Array[Array[Array[Long]]]): Column =
    ColumnBridge.column(PqAdcBatch(
      ColumnBridge.expression(code), ColumnBridge.expression(qIdx), tables))
}

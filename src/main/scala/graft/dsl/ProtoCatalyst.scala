package graft.dsl

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import ProtobufCore._

/** Direct wire ⇄ Catalyst bridge for [[ProtobufCore]] — the upgrade of the
  * executable serde path from `udf(bytes → canonical JSON) → from_json`
  * to a single Catalyst expression that parses the protobuf wire bytes
  * straight into an `InternalRow` (and back), with NO per-row JSON render
  * or parse. Semantics are locked IDENTICAL to the JSON leg by
  * `ProtobufCorePropertySpec` (random schemas/values: equal decoded
  * structs, byte-identical encodes), including the deliberate
  * canonicalizations the JSON leg performs:
  *
  *  - strings decode through `new String(bytes, UTF_8)` (invalid UTF-8
  *    replaced, as the JSON leg does), not raw-byte `UTF8String`;
  *  - float/double NaN payload bits canonicalize to the quiet NaN
  *    (`from_json` and `UnsafeRow` both do this);
  *  - unknown enum numbers decode to their decimal string;
  *  - map duplicate keys: last entry wins, first occurrence keeps its
  *    position (Jackson `ObjectNode`/`LinkedHashMap` semantics);
  *  - oneof members evict their group siblings (last-set-wins);
  *  - absent fields are null; a field TAG seen with zero packed elements
  *    is an EMPTY array (matching `"f":[]` through `from_json`).
  *
  * Encode is stricter than the JSON leg in exactly one place: a null
  * element inside a repeated field raises an error instead of silently
  * encoding proto3 defaults (the JSON leg's Jackson `asInt()` on a
  * `NullNode` would write 0). Decoded structs never contain null array
  * elements, so the divergence is unreachable for round trips.
  *
  * Measured (local[8], 200k rows of a 6-field message with a repeated
  * field, a map and a nested message, min of 4, after hoisting the
  * per-row ordinal/oneof scaffolding into PMessage lazy vals and the
  * [[ProtoCatalyst.MsgEncodePlan]]): decode 252 ms native vs ~390 ms
  * JSON leg (~1.5×), full decode→encode round trip 295 ms vs 559 ms
  * (~1.9×) — on top of removing the per-row JSON text allocation
  * entirely.
  */
object ProtoCatalyst {

  // ---- decode: wire bytes -> InternalRow ---------------------------------

  private def canonF(f: Float): Float = if (f != f) Float.NaN else f
  private def canonD(d: Double): Double = if (d != d) Double.NaN else d

  private def scalarValue(t: PType, r: Reader): Any = t match {
    case PInt32    => r.readVarint().toInt
    case PInt64    => r.readVarint()
    case PSInt32   => zigzagDecode(r.readVarint()).toInt
    case PSInt64   => zigzagDecode(r.readVarint())
    case PUInt32   => r.readVarint() & 0xffffffffL
    case PUInt64   => r.readVarint() // raw two's-complement bits
    case PFixed32  => r.readFixed32().toLong & 0xffffffffL
    case PFixed64  => r.readFixed64() // raw two's-complement bits
    case PSFixed32 => r.readFixed32()
    case PSFixed64 => r.readFixed64()
    case PBool     => r.readVarint() != 0L
    case PDouble   => canonD(java.lang.Double.longBitsToDouble(r.readFixed64()))
    case PFloat    => canonF(java.lang.Float.intBitsToFloat(r.readFixed32()))
    case e: PEnum  =>
      val n = r.readVarint().toInt
      UTF8String.fromString(e.byNumber.getOrElse(n, n.toString))
    case _         => throw new IllegalStateException(s"not a scalar: $t")
  }

  /** proto3 default for an absent map entry value, as a Catalyst value —
    * the direct analog of the JSON leg's `defaultValueNode` after
    * `from_json` (message default = all-null row, not null). With
    * `keepUnknown` the declared message struct carries the trailing
    * `$unknown` field at EVERY depth ([[sparkSchema]] recurses it), so
    * the default row must be one slot wider too.
    */
  private def defaultCatalystValue(t: PType, keepUnknown: Boolean): Any = t match {
    case PInt32 | PSInt32 | PSFixed32 => 0
    case PInt64 | PSInt64 | PUInt32 | PUInt64 | PFixed32 | PFixed64 |
         PSFixed64 => 0L
    case PBool   => false
    case PDouble => 0.0d
    case PFloat  => 0.0f
    case PString => UTF8String.EMPTY_UTF8
    case PBytes  => Array.emptyByteArray
    case e: PEnum => UTF8String.fromString(e.byNumber.getOrElse(0, "0"))
    case m: PMessage => new GenericInternalRowOf(
      m.fields.length + (if (keepUnknown) 1 else 0))
    case other   => throw new IllegalStateException(s"bad map value type $other")
  }

  // tiny alias so the default above reads clearly
  private final class GenericInternalRowOf(n: Int)
    extends org.apache.spark.sql.catalyst.expressions.GenericInternalRow(n)

  /** Decode one length-delimited or scalar map VALUE positioned at `r`. */
  private def mapValue(t: PType, wt: Int, r: Reader, keepUnknown: Boolean): Any =
    t match {
      case m: PMessage =>
        require(wt == 2, s"message value needs wire type 2, got $wt")
        decodeRow(m, r.readDelimited(), keepUnknown)
      case PString =>
        require(wt == 2, s"string value needs wire type 2, got $wt")
        UTF8String.fromString(new String(r.readDelimited().bytes(), UTF_8))
      case PBytes =>
        require(wt == 2, s"bytes value needs wire type 2, got $wt")
        r.readDelimited().bytes()
      case scalar =>
        require(wt == wireTypeOf(scalar),
          s"expected wire type ${wireTypeOf(scalar)}, got $wt")
        scalarValue(scalar, r)
    }

  /** Decode a single map entry message into (keyString, catalystValue). */
  private def decodeMapEntryRow(m: PMap, r: Reader,
      keepUnknown: Boolean): (String, Any) = {
    var key: String = null
    var value: Any = null
    var valueSet = false
    while (r.hasMore) {
      val tag = r.readVarint()
      val number = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      number match {
        case 1 =>
          require(wt == wireTypeOf(m.key),
            s"map key: expected wire type ${wireTypeOf(m.key)}, got $wt")
          key = keyToString(m.key, r)
        case 2 => value = mapValue(m.value, wt, r, keepUnknown); valueSet = true
        case _ => r.skip(wt)
      }
    }
    (if (key == null) defaultKeyString(m.key) else key,
     if (!valueSet) defaultCatalystValue(m.value, keepUnknown) else value)
  }

  private[dsl] def decodeRow(msg: PMessage, r: Reader,
      keepUnknown: Boolean): InternalRow = {
    val n = msg.fields.length
    val values = new Array[Any](n + (if (keepUnknown) 1 else 0))
    // field ordinals come precomputed off the PMessage (lazy, once per
    // message node per JVM); repeated fields get a buffer slot, maps a
    // LinkedHashMap slot (last-wins with first-occurrence position, the
    // Jackson ObjectNode semantics the JSON leg has)
    val ordinal = msg.ordinalByNumber
    var unknown: scala.collection.mutable.ArrayBuffer[InternalRow] = null
    while (r.hasMore) {
      val tagStart = r.pos
      val tag = r.readVarint()
      val number = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      msg.byNumber.get(number) match {
        case None =>
          r.skip(wt)
          // span copy + buffer only when the schema will carry it; a
          // narrow keepUnknown=false reader pays just the skip
          if (keepUnknown) {
            if (unknown == null)
              unknown = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
            unknown += InternalRow(number, r.spanFrom(tagStart))
          }
        case Some(f) =>
          val i = ordinal(f.number)
          def buffer(): scala.collection.mutable.ArrayBuffer[Any] =
            values(i) match {
              case b: scala.collection.mutable.ArrayBuffer[Any @unchecked] => b
              case _ =>
                val b = scala.collection.mutable.ArrayBuffer.empty[Any]
                values(i) = b; b
            }
          def mapAcc(): scala.collection.mutable.LinkedHashMap[String, Any] =
            values(i) match {
              case m: scala.collection.mutable.LinkedHashMap[String @unchecked, Any @unchecked] => m
              case _ =>
                val m = scala.collection.mutable.LinkedHashMap.empty[String, Any]
                values(i) = m; m
            }
          def setSingular(v: Any): Unit = {
            if (f.oneof.isDefined)
              msg.oneofSiblingOrdinals.getOrElse(i, Array.emptyIntArray)
                .foreach(values(_) = null)
            values(i) = v
          }
          f.ptype match {
            case m: PMap =>
              require(wt == 2,
                s"field ${f.name}: map entry needs wire type 2, got $wt")
              val (k, v) = decodeMapEntryRow(m, r.readDelimited(), keepUnknown)
              mapAcc().update(k, v) // replace keeps first-insert position
            case m: PMessage =>
              require(wt == 2,
                s"field ${f.name}: message needs wire type 2, got $wt")
              val sub = decodeRow(m, r.readDelimited(), keepUnknown)
              if (f.repeated) buffer() += sub else setSingular(sub)
            case PString =>
              require(wt == 2,
                s"field ${f.name}: string needs wire type 2, got $wt")
              val s = UTF8String.fromString(
                new String(r.readDelimited().bytes(), UTF_8))
              if (f.repeated) buffer() += s else setSingular(s)
            case PBytes =>
              require(wt == 2,
                s"field ${f.name}: bytes needs wire type 2, got $wt")
              val b = r.readDelimited().bytes()
              if (f.repeated) buffer() += b else setSingular(b)
            case scalar =>
              if (f.repeated && wt == 2 && wireTypeOf(scalar) != 2) { // packed
                val sub = r.readDelimited()
                val buf = buffer() // tag seen: empty payload = EMPTY array
                while (sub.hasMore) buf += scalarValue(scalar, sub)
              } else {
                require(wt == wireTypeOf(scalar),
                  s"field ${f.name}: expected wire type ${wireTypeOf(scalar)}, got $wt")
                if (f.repeated) buffer() += scalarValue(scalar, r)
                else setSingular(scalarValue(scalar, r))
              }
          }
      }
    }
    // finalize accumulator slots into Catalyst containers
    var i = 0
    while (i < n) {
      values(i) match {
        case b: scala.collection.mutable.ArrayBuffer[Any @unchecked] =>
          values(i) = new GenericArrayData(b.toArray)
        case m: scala.collection.mutable.LinkedHashMap[String @unchecked, Any @unchecked] =>
          values(i) = ArrayBasedMapData(
            m.keysIterator.map(UTF8String.fromString).toArray[Any],
            m.valuesIterator.toArray[Any])
        case _ => ()
      }
      i += 1
    }
    if (keepUnknown && unknown != null)
      values(n) = new GenericArrayData(unknown.toArray[Any])
    InternalRow.fromSeq(scala.collection.immutable.ArraySeq.unsafeWrapArray(values))
  }

  def decode(payload: Array[Byte], msg: PMessage,
      keepUnknown: Boolean): InternalRow =
    if (payload == null) null
    else decodeRow(msg, new Reader(payload), keepUnknown)

  // ---- encode: InternalRow -> wire bytes ---------------------------------

  private def encodeScalarValue(t: PType, v: Any, w: Writer): Unit = t match {
    case PInt32    => w.writeVarint(v.asInstanceOf[Int].toLong)
    case PInt64    => w.writeVarint(v.asInstanceOf[Long])
    // the & mask on sint32 mirrors the JSON leg exactly (encodeScalar)
    case PSInt32   => w.writeVarint(zigzagEncode(v.asInstanceOf[Int].toLong) & 0xffffffffL)
    case PSInt64   => w.writeVarint(zigzagEncode(v.asInstanceOf[Long]))
    case PUInt32   => w.writeVarint(v.asInstanceOf[Long] & 0xffffffffL)
    case PUInt64   => w.writeVarint(v.asInstanceOf[Long])
    case PFixed32  => w.writeFixed32((v.asInstanceOf[Long] & 0xffffffffL).toInt)
    case PFixed64  => w.writeFixed64(v.asInstanceOf[Long])
    case PSFixed32 => w.writeFixed32(v.asInstanceOf[Int])
    case PSFixed64 => w.writeFixed64(v.asInstanceOf[Long])
    case PBool     => w.writeVarint(if (v.asInstanceOf[Boolean]) 1L else 0L)
    case PDouble   => w.writeFixed64(
      java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
    case PFloat    => w.writeFixed32(
      java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
    case e: PEnum  =>
      val s = v.asInstanceOf[UTF8String].toString
      val num = e.byName.getOrElse(s,
        try s.toInt catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"unknown enum symbol '$s' (expected one of ${e.symbols.map(_._1)})")
        })
      w.writeVarint(num.toLong)
    case _         => throw new IllegalStateException(s"not a scalar: $t")
  }

  /** Per-(message, input struct) encode plan — name → ordinal binding,
    * oneof member ordinals, nested plans, number-sorted emit order — built
    * ONCE per expression (the [[AvroCatalyst]] converter-tree approach),
    * so rows encode with no per-row map/group/closure building. The only
    * per-row sort left is the unknown-field interleave, and it runs only
    * for rows that actually carry unknowns.
    */
  private[dsl] final class MsgEncodePlan(msg: PMessage, schema: StructType) {
    private val byName: Map[String, Int] = schema.fieldNames.zipWithIndex.toMap
    // oneof groups with the (member name, ordinal) pairs present in the
    // struct — the >1-set check is per row, the scaffolding is not
    private val oneofGroups: Array[(String, Array[(String, Int)])] =
      msg.fields.filter(_.oneof.isDefined).groupBy(_.oneof.get).toArray
        .sortBy(_._1)
        .map { case (g, ms) =>
          (g, ms.flatMap(m => byName.get(m.name).map(m.name -> _)).toArray)
        }
    private final case class Bound(f: PField, ord: Int, dt: DataType,
        sub: MsgEncodePlan)
    // declared fields present in the struct, ascending field NUMBER — the
    // canonical emit order when no unknown spans interleave
    private val bound: Array[Bound] = msg.fields.toArray.flatMap { f =>
      byName.get(f.name).map { i =>
        val dt = schema.fields(i).dataType
        val sub = f.ptype match {
          case m: PMessage =>
            val st = (if (f.repeated) dt.asInstanceOf[ArrayType].elementType
                      else dt).asInstanceOf[StructType]
            new MsgEncodePlan(m, st)
          case PMap(_, m: PMessage) =>
            new MsgEncodePlan(m,
              dt.asInstanceOf[MapType].valueType.asInstanceOf[StructType])
          case _ => null
        }
        Bound(f, i, dt, sub)
      }
    }.sortBy(_.f.number)
    private val unknownOrd: Int = byName.getOrElse(UnknownFieldName, -1)

    private def encodeMapEntry(m: PMap, key: String, value: Any,
        valueType: DataType, sub: MsgEncodePlan, number: Int,
        w: Writer): Unit = {
      val inner = new Writer
      writeKeyString(m.key, key, inner)
      m.value match {
        case _: PMessage =>
          val body = new Writer
          sub.encode(value.asInstanceOf[InternalRow], body)
          inner.writeTag(2, 2); inner.writeDelimited(body.out.toByteArray)
        case PString =>
          inner.writeTag(2, 2)
          inner.writeDelimited(
            value.asInstanceOf[UTF8String].toString.getBytes(UTF_8))
        case PBytes =>
          inner.writeTag(2, 2)
          inner.writeDelimited(value.asInstanceOf[Array[Byte]])
        case scalar =>
          inner.writeTag(2, wireTypeOf(scalar))
          encodeScalarValue(scalar, value, inner)
      }
      w.writeTag(number, 2); w.writeDelimited(inner.out.toByteArray)
    }

    private def emitKnown(b: Bound, row: InternalRow, w: Writer): Unit = {
      val f = b.f; val i = b.ord; val dt = b.dt
      f.ptype match {
        case m: PMap =>
          val vt = dt.asInstanceOf[MapType].valueType
          val md = row.getMap(i)
          val keys = md.keyArray(); val vals = md.valueArray()
          var j = 0
          while (j < md.numElements()) {
            // null map values skipped, mirroring the JSON leg's guard
            if (!vals.isNullAt(j))
              encodeMapEntry(m, keys.getUTF8String(j).toString,
                vals.get(j, vt), vt, b.sub, f.number, w)
            j += 1
          }
        case _: PMessage =>
          val st = (if (f.repeated) dt.asInstanceOf[ArrayType].elementType
                    else dt).asInstanceOf[StructType]
          def one(v: InternalRow): Unit = {
            val inner = new Writer
            b.sub.encode(v, inner)
            w.writeTag(f.number, 2); w.writeDelimited(inner.out.toByteArray)
          }
          if (f.repeated) {
            val a = row.getArray(i)
            var j = 0
            while (j < a.numElements()) {
              require(!a.isNullAt(j), s"null element in repeated ${f.name}")
              one(a.getStruct(j, st.length)); j += 1
            }
          } else one(row.getStruct(i, st.length))
        case PString =>
          def one(v: UTF8String): Unit = {
            w.writeTag(f.number, 2)
            w.writeDelimited(v.toString.getBytes(UTF_8))
          }
          if (f.repeated) {
            val a = row.getArray(i)
            var j = 0
            while (j < a.numElements()) {
              require(!a.isNullAt(j), s"null element in repeated ${f.name}")
              one(a.getUTF8String(j)); j += 1
            }
          } else one(row.getUTF8String(i))
        case PBytes =>
          def one(v: Array[Byte]): Unit = {
            w.writeTag(f.number, 2); w.writeDelimited(v)
          }
          if (f.repeated) {
            val a = row.getArray(i)
            var j = 0
            while (j < a.numElements()) {
              require(!a.isNullAt(j), s"null element in repeated ${f.name}")
              one(a.getBinary(j)); j += 1
            }
          } else one(row.getBinary(i))
        case scalar =>
          val et = if (f.repeated) dt.asInstanceOf[ArrayType].elementType else dt
          if (f.repeated) { // packed, the proto3 default
            val a = row.getArray(i)
            val inner = new Writer
            var j = 0
            while (j < a.numElements()) {
              require(!a.isNullAt(j), s"null element in repeated ${f.name}")
              encodeScalarValue(scalar, a.get(j, et), inner); j += 1
            }
            w.writeTag(f.number, 2); w.writeDelimited(inner.out.toByteArray)
          } else {
            w.writeTag(f.number, wireTypeOf(scalar))
            encodeScalarValue(scalar, row.get(i, et), w)
          }
      }
    }

    def encode(row: InternalRow, w: Writer): Unit = {
      // oneof contract, as on the JSON leg: >1 set member fails loudly
      var gi = 0
      while (gi < oneofGroups.length) {
        val (group, members) = oneofGroups(gi)
        var set = 0; var names: List[String] = Nil
        members.foreach { case (nm, i) =>
          if (!row.isNullAt(i)) { set += 1; names = nm :: names }
        }
        require(set <= 1,
          s"oneof '$group': ${names.reverse.mkString(", ")} are all set")
        gi += 1
      }
      val hasUnknown = unknownOrd >= 0 && !row.isNullAt(unknownOrd)
      if (!hasUnknown) {
        // the common shape: emit straight in field-number order
        var i = 0
        while (i < bound.length) {
          val b = bound(i)
          if (!row.isNullAt(b.ord)) emitKnown(b, row, w)
          i += 1
        }
      } else {
        // interleave carried unknown spans by number; stable sort keeps
        // repeated unknown occurrences of one number in decode order (a
        // number can never be both known and unknown)
        val emits = scala.collection.mutable.ArrayBuffer.empty[(Int, () => Unit)]
        bound.foreach { b =>
          if (!row.isNullAt(b.ord))
            emits += (b.f.number -> (() => emitKnown(b, row, w)))
        }
        val a = row.getArray(unknownOrd)
        var j = 0
        while (j < a.numElements()) {
          val u = a.getStruct(j, 2)
          val num = u.getInt(0)
          val raw = u.getBinary(1)
          emits += (num -> (() => w.out.write(raw, 0, raw.length)))
          j += 1
        }
        emits.sortBy(_._1).foreach(_._2())
      }
    }
  }

  /** One-shot encode (tests / non-hot callers): builds the plan per call —
    * [[ProtoEncodeExpr]] holds one plan per expression instead.
    */
  def encode(row: InternalRow, msg: PMessage, schema: StructType): Array[Byte] =
    if (row == null) null
    else {
      val w = new Writer
      new MsgEncodePlan(msg, schema).encode(row, w)
      w.out.toByteArray
    }
}

/** `binary → struct` protobuf decode as a single Catalyst expression. */
case class ProtoDecodeExpr(child: Expression, msg: ProtobufCore.PMessage,
    keepUnknown: Boolean) extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"proto_decode requires a binary input, got $other")
  }

  override lazy val dataType: DataType = sparkSchema(msg, keepUnknown)
  override def nullable: Boolean = true
  override def prettyName: String = "proto_decode"

  protected override def nullSafeEval(input: Any): Any =
    ProtoCatalyst.decodeRow(msg,
      new ProtobufCore.Reader(input.asInstanceOf[Array[Byte]]), keepUnknown)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `struct → binary` protobuf encode as a single Catalyst expression.
  * The input struct is matched to the message BY FIELD NAME (missing
  * fields encode as absent, like the JSON leg); each present field's
  * Catalyst type must be exactly the type [[ProtobufCore.sparkSchema]]
  * declares for it.
  */
case class ProtoEncodeExpr(child: Expression, msg: ProtobufCore.PMessage)
    extends UnaryExpression with CodegenFallback {

  // a struct is accepted when every field NAME it shares with the message
  // carries exactly the declared Catalyst type — with or without the
  // $unknown carrier, at any nesting depth (decodes with keepUnknown on
  // and off are both valid inputs); extra names are ignored, like the
  // JSON leg
  private def mismatches(m: ProtobufCore.PMessage, st: StructType,
      path: String): Seq[String] = {
    def ok(declared: DataType, actual: DataType): Boolean =
      org.apache.spark.sql.types.DataType
        .equalsStructurally(declared, actual, ignoreNullability = true)
    st.fields.toSeq.flatMap { f =>
      val at = s"$path${f.name}"
      if (f.name == UnknownFieldName) {
        if (ok(unknownSparkType, f.dataType)) Nil
        else Seq(s"$at: expected ${unknownSparkType.sql}, got ${f.dataType.sql}")
      } else m.fields.find(_.name == f.name) match {
        case None => Nil
        case Some(pf) =>
          def walk(pt: ProtobufCore.PType, dt: DataType,
              where: String): Seq[String] = (pt, dt) match {
            case (sub: ProtobufCore.PMessage, sdt: StructType) =>
              mismatches(sub, sdt, s"$where.")
            case (ProtobufCore.PMap(_, v), MapType(StringType, vt, _)) =>
              walk(v, vt, where)
            case _ =>
              val declared = sparkSchema(
                ProtobufCore.PMessage(Seq(ProtobufCore.PField(1, "x", pt))),
                keepUnknown = false).fields.head.dataType
              if (ok(declared, dt)) Nil
              else Seq(s"$where: expected ${declared.sql}, got ${dt.sql}")
          }
          (pf.ptype, f.dataType) match {
            case (pt, ArrayType(et, _)) if pf.repeated => walk(pt, et, at)
            case (pt, dt) if !pf.repeated => walk(pt, dt, at)
            case (_, dt) => Seq(s"$at: expected an array, got ${dt.sql}")
          }
      }
    }
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case st: StructType =>
      val bad = mismatches(msg, st, "")
      if (bad.isEmpty) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"proto_encode input struct does not match the message: " +
          bad.mkString("; "))
    case other => TypeCheckResult.TypeCheckFailure(
      s"proto_encode requires a struct input, got $other")
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "proto_encode"

  // plan built once per expression (per executor after deserialization),
  // not per row
  @transient private lazy val plan = new ProtoCatalyst.MsgEncodePlan(
    msg, child.dataType.asInstanceOf[StructType])

  protected override def nullSafeEval(input: Any): Any = {
    val w = new ProtobufCore.Writer
    plan.encode(input.asInstanceOf[InternalRow], w)
    w.out.toByteArray
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Body of an SR-protobuf frame: skips [magic][schema id][index varints]
  * and returns the protobuf payload bytes.
  */
case class SrProtoStripExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sr_proto_strip requires a binary input, got $other")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "sr_proto_strip"
  protected override def nullSafeEval(input: Any): Any =
    ProtobufCore.parseIndexList(input.asInstanceOf[Array[Byte]])._2.bytes()
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Message-index list of an SR-protobuf frame (`[0]` when the frame uses
  * the optimized single-byte form).
  */
case class SrProtoIndexesExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sr_proto_indexes requires a binary input, got $other")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "sr_proto_indexes"
  protected override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      ProtobufCore.parseIndexList(input.asInstanceOf[Array[Byte]])._1.toArray)
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

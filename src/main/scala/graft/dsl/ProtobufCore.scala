package graft.dsl

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Protobuf value serde with NO protobuf dependency — the reference's
  * `SchemaProtobufSerDes<T>` body (`serdes/Streamiz.Kafka.Net.
  * SchemaRegistry.SerDes.Protobuf/SchemaProtobufSerDes.cs`) made executable
  * in-container by implementing the (publicly documented) protobuf wire
  * format directly: varint / zigzag / fixed32 / fixed64 / length-delimited
  * field encoding, packed repeated scalars, nested messages, and the
  * Confluent SR protobuf frame (magic byte + schema id + message-index
  * list).
  *
  * [[Serdes.protobufDe]]/[[Serdes.protobufSer]] (the spark-protobuf
  * expressions) stay the preferred cluster path — codegen'd, descriptor
  * files, full proto3 semantics. This core path covers the serde-boundary
  * domain a streaming pipeline actually moves — all scalar kinds (varint,
  * zigzag, unsigned, fixed, sfixed), strings, bytes, enums (symbol strings
  * via [[PEnum]], or raw ints via `PInt32`), repeated fields, nested
  * messages, `map<K,V>`, oneof — and bridges into
  * Catalyst natively since round 9 ([[ProtoDecodeExpr]]/
  * [[ProtoEncodeExpr]]: wire bytes ⇄ `InternalRow` in one expression;
  * the original `binary → canonical JSON → from_json(struct)` leg
  * survives as [[protoDeJson]]/[[protoSerJson]] for differential
  * testing), so the full wire round-trip runs and is tested anywhere
  * Spark runs.
  *
  * Schemas are declared as [[PMessage]] trees (the descriptor analog; field
  * NUMBERS are the wire contract, names only shape the Catalyst struct).
  * Divergences from canonical protobuf JSON, chosen so `from_json` parses
  * directly: 64-bit ints render as JSON numbers (not strings) and bytes as
  * base64 strings (which Spark's JSON reader maps onto `binary`). Unknown
  * fields are skipped on decode (proto3 rule); absent fields decode to
  * null (no proto3 zero-default materialization — a KTable tombstone must
  * stay distinguishable from an explicit zero). Encoding is canonical:
  * fields in number order, repeated scalars packed, null/absent skipped.
  */
object ProtobufCore extends Serializable {

  /** Field value types. `PInt32`/`PInt64` are varint (enums ride as
    * `PInt32`); `PSInt32`/`PSInt64` are zigzag (proto `sint*`);
    * `PUInt32`/`PUInt64` are unsigned varint — `uint32` widens to a
    * non-negative Long, `uint64` keeps its raw two's-complement bits in a
    * Long (the protobuf-java / spark-protobuf convention: 2^64-1 reads as
    * -1L); `PFixed32`/`PFixed64` are unsigned fixed-width (same widening /
    * raw-bits rule); `PSFixed32`/`PSFixed64` are signed fixed-width;
    * `PDouble`/`PFloat` are fixed-width floats; `PString`/`PBytes`/
    * `PMessage` are length-delimited.
    *
    * `PMap` is proto `map<K,V>`: on the wire a repeated nested message
    * (field 1 = key, field 2 = value, never packed); in Catalyst a
    * `MapType(StringType, V)` — canonical protobuf JSON renders ALL map
    * keys as strings (and unsigned keys as unsigned decimal), and the
    * declared key PType losslessly restores the wire bytes on encode.
    */
  sealed trait PType extends Serializable
  case object PInt32 extends PType
  case object PInt64 extends PType
  case object PSInt32 extends PType
  case object PSInt64 extends PType
  case object PUInt32 extends PType
  case object PUInt64 extends PType
  case object PFixed32 extends PType
  case object PFixed64 extends PType
  case object PSFixed32 extends PType
  case object PSFixed64 extends PType
  case object PBool extends PType
  case object PDouble extends PType
  case object PFloat extends PType
  case object PString extends PType
  case object PBytes extends PType
  /** Proto enum with its descriptor's (symbol, number) pairs: decodes to
    * the symbol STRING (canonical protobuf JSON; `StringType` in Catalyst),
    * with unknown numbers surfacing as the bare number — proto3 keeps
    * unknown enum values — and encoding accepting either form. Without a
    * declared PEnum, enums still ride as `PInt32` numbers.
    */
  final case class PEnum(symbols: Seq[(String, Int)]) extends PType {
    require(symbols.nonEmpty, "enum needs at least one symbol")
    require(symbols.map(_._1).distinct.length == symbols.length,
      "duplicate enum symbol")
    require(symbols.map(_._2).distinct.length == symbols.length,
      "duplicate enum number")
    @transient lazy val byNumber: Map[Int, String] =
      symbols.map { case (s, n) => n -> s }.toMap
    @transient lazy val byName: Map[String, Int] = symbols.toMap
  }

  final case class PMap(key: PType, value: PType) extends PType {
    require(key match {
      case PInt32 | PInt64 | PSInt32 | PSInt64 | PUInt32 | PUInt64 |
           PFixed32 | PFixed64 | PSFixed32 | PSFixed64 | PBool | PString => true
      case _ => false
    }, s"map key must be an integral/bool/string scalar, got $key")
    require(value match {
      case _: PMap => false
      case _ => true
    }, "map values cannot be maps (protobuf rule)")
  }
  final case class PMessage(fields: Seq[PField]) extends PType {
    require(fields.map(_.number).distinct.length == fields.length,
      "duplicate field numbers")
    require(fields.map(_.name).distinct.length == fields.length,
      "duplicate field names")
    fields.filter(_.oneof.isDefined).foreach { f =>
      require(!f.repeated, s"oneof member ${f.name} cannot be repeated")
      require(!f.ptype.isInstanceOf[PMap],
        s"oneof member ${f.name} cannot be a map")
    }
    @transient lazy val byNumber: Map[Int, PField] =
      fields.map(f => f.number -> f).toMap
    /** Other members of the same oneof group (empty for non-oneof fields). */
    @transient lazy val oneofSiblings: Map[String, Seq[String]] =
      fields.filter(_.oneof.isDefined).groupBy(_.oneof.get).values.flatMap {
        group => group.map(f => f.name -> group.map(_.name).filter(_ != f.name))
      }.toMap
    /** Field ordinal (declaration index) by field number — hoisted here so
      * the native decode path pays zero per-row map building.
      */
    @transient lazy val ordinalByNumber: Map[Int, Int] =
      fields.zipWithIndex.map { case (f, i) => f.number -> i }.toMap
    /** Oneof sibling ORDINALS per member ordinal (decode eviction). */
    @transient lazy val oneofSiblingOrdinals: Map[Int, Array[Int]] = {
      val idx = fields.zipWithIndex.toMap
      oneofSiblings.map { case (name, sibs) =>
        idx(fields.find(_.name == name).get) ->
          sibs.map(s => idx(fields.find(_.name == s).get)).toArray
      }
    }
  }
  /** `oneof` names the proto oneof group the field belongs to: members
    * share presence — decoding applies last-set-wins across the group,
    * encoding rejects a tree with more than one member set.
    */
  final case class PField(number: Int, name: String, ptype: PType,
      repeated: Boolean = false, oneof: Option[String] = None) {
    require(number >= 1, s"field numbers start at 1, got $number")
    require(!(repeated && ptype.isInstanceOf[PMap]),
      s"map field $name cannot be repeated (the entry list IS the map)")
  }

  private def sparkTypeOf(t: PType, keepUnknown: Boolean): DataType = t match {
    case PInt32 | PSInt32 | PSFixed32 => IntegerType
    case PInt64 | PSInt64 | PSFixed64 => LongType
    // uint32/fixed32 widen losslessly; uint64/fixed64 keep raw long bits
    case PUInt32 | PUInt64 | PFixed32 | PFixed64 => LongType
    case PBool            => BooleanType
    case PDouble          => DoubleType
    case PFloat           => FloatType
    case PString          => StringType
    case PBytes           => BinaryType
    case _: PEnum         => StringType // symbol names (unknowns as digits)
    case PMap(_, v)       => MapType(StringType, sparkTypeOf(v, keepUnknown))
    // keepUnknown recurses: a wider writer can add fields at any depth
    case m: PMessage      => sparkSchema(m, keepUnknown)
  }

  /** Hidden field carrying unrecognized wire fields through decode →
    * encode — the analog of protobuf-java's `UnknownFieldSet`, which the
    * reference inherits via its protobuf serdes. Each entry is the
    * VERBATIM tag+payload byte span (`num` = field number for canonical
    * ordering on re-encode). `$` cannot occur in a .proto identifier, so
    * the name can never collide with a declared field.
    */
  val UnknownFieldName = "$unknown"

  private[dsl] val unknownSparkType: DataType = ArrayType(StructType(Seq(
    StructField("num", IntegerType, nullable = true),
    StructField("raw", BinaryType, nullable = true))))

  /** The Catalyst struct a message decodes to (give this to `from_json`).
    * With `keepUnknown`, appends the [[UnknownFieldName]] field so
    * wider-writer fields survive a decode→encode round trip through a
    * DataFrame column (they are captured in the JSON either way; the
    * schema decides whether the struct carries them).
    */
  def sparkSchema(msg: PMessage, keepUnknown: Boolean = false): StructType = {
    val base = StructType(msg.fields.map { f =>
      val b = sparkTypeOf(f.ptype, keepUnknown)
      StructField(f.name,
        if (f.repeated) ArrayType(b) else b, nullable = true)
    })
    if (keepUnknown)
      StructType(base.fields :+
        StructField(UnknownFieldName, unknownSparkType, nullable = true))
    else base
  }

  // ---- wire-format primitives (protobuf encoding spec) -------------------

  private[dsl] final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
    def this(buf: Array[Byte]) = this(buf, 0, buf.length)
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0; var res = 0L
      while (shift < 64) {
        require(pos < end, "truncated varint")
        val b = buf(pos); pos += 1
        res |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return res
        shift += 7
      }
      throw new IllegalArgumentException("varint longer than 10 bytes")
    }
    def readFixed32(): Int = {
      require(pos + 4 <= end, "truncated fixed32")
      val v = (buf(pos) & 0xff) | (buf(pos + 1) & 0xff) << 8 |
        (buf(pos + 2) & 0xff) << 16 | (buf(pos + 3) & 0xff) << 24
      pos += 4; v
    }
    def readFixed64(): Long = {
      var v = 0L; var i = 0
      require(pos + 8 <= end, "truncated fixed64")
      while (i < 8) { v |= (buf(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def readDelimited(): Reader = {
      val len = readVarint().toInt
      // long arithmetic: pos + len overflows Int for a crafted 5-byte
      // varint length and would sail past this check into a negative pos
      require(len >= 0 && pos.toLong + len <= end, s"bad delimited length $len")
      val r = new Reader(buf, pos, pos + len)
      pos += len; r
    }
    def bytes(): Array[Byte] = java.util.Arrays.copyOfRange(buf, pos, end)
    /** Verbatim byte span from `start` to the current position — how
      * unknown fields are carried: tag + payload exactly as read, so
      * re-encode is byte-identical even for non-minimal varints.
      */
    def spanFrom(start: Int): Array[Byte] =
      java.util.Arrays.copyOfRange(buf, start, pos)
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => readFixed64()
      case 2 => readDelimited()
      case 5 => readFixed32()
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private[dsl] final class Writer {
    val out = new ByteArrayOutputStream()
    def writeVarint(v0: Long): Unit = {
      var v = v0
      while ((v & ~0x7fL) != 0) { out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7 }
      out.write(v.toInt)
    }
    def writeTag(number: Int, wireType: Int): Unit =
      writeVarint((number.toLong << 3) | wireType)
    def writeFixed32(v: Int): Unit = {
      out.write(v & 0xff); out.write((v >>> 8) & 0xff)
      out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
    }
    def writeFixed64(v: Long): Unit = {
      var i = 0
      while (i < 8) { out.write(((v >>> (8 * i)) & 0xff).toInt); i += 1 }
    }
    def writeDelimited(b: Array[Byte]): Unit = { writeVarint(b.length); out.write(b) }
  }

  private[dsl] def zigzagDecode(n: Long): Long = (n >>> 1) ^ -(n & 1)
  private[dsl] def zigzagEncode(n: Long): Long = (n << 1) ^ (n >> 63)

  private[dsl] def wireTypeOf(t: PType): Int = t match {
    case PInt32 | PInt64 | PSInt32 | PSInt64 | PUInt32 | PUInt64 | PBool |
         _: PEnum => 0
    case PDouble | PFixed64 | PSFixed64 => 1
    case PFloat | PFixed32 | PSFixed32 => 5
    case PString | PBytes | _: PMessage | _: PMap => 2
  }

  // ---- decode: wire bytes -> Jackson tree --------------------------------

  @transient private lazy val mapper = new ObjectMapper()

  private def scalarNode(t: PType, r: Reader, node: ObjectNode, name: String): Unit =
    t match {
      case PInt32    => node.put(name, r.readVarint().toInt)
      case PInt64    => node.put(name, r.readVarint())
      case PSInt32   => node.put(name, zigzagDecode(r.readVarint()).toInt)
      case PSInt64   => node.put(name, zigzagDecode(r.readVarint()))
      case PUInt32   => node.put(name, r.readVarint() & 0xffffffffL)
      case PUInt64   => node.put(name, r.readVarint()) // raw two's-complement
      case PFixed32  => node.put(name, r.readFixed32().toLong & 0xffffffffL)
      case PFixed64  => node.put(name, r.readFixed64()) // raw two's-complement
      case PSFixed32 => node.put(name, r.readFixed32())
      case PSFixed64 => node.put(name, r.readFixed64())
      case PBool     => node.put(name, r.readVarint() != 0L)
      case PDouble   => node.put(name, java.lang.Double.longBitsToDouble(r.readFixed64()))
      case PFloat    => node.put(name, java.lang.Float.intBitsToFloat(r.readFixed32()))
      case e: PEnum  =>
        val n = r.readVarint().toInt
        e.byNumber.get(n) match {
          case Some(sym) => node.put(name, sym)
          case None => node.put(name, n) // proto3 keeps unknown enum values
        }
      case _         => throw new IllegalStateException(s"not a scalar: $t")
    }

  private def scalarArrayAdd(t: PType, r: Reader, arr: ArrayNode): Unit = t match {
    case PInt32    => arr.add(r.readVarint().toInt)
    case PInt64    => arr.add(r.readVarint())
    case PSInt32   => arr.add(zigzagDecode(r.readVarint()).toInt)
    case PSInt64   => arr.add(zigzagDecode(r.readVarint()))
    case PUInt32   => arr.add(r.readVarint() & 0xffffffffL)
    case PUInt64   => arr.add(r.readVarint())
    case PFixed32  => arr.add(r.readFixed32().toLong & 0xffffffffL)
    case PFixed64  => arr.add(r.readFixed64())
    case PSFixed32 => arr.add(r.readFixed32())
    case PSFixed64 => arr.add(r.readFixed64())
    case PBool     => arr.add(r.readVarint() != 0L)
    case PDouble   => arr.add(java.lang.Double.longBitsToDouble(r.readFixed64()))
    case PFloat    => arr.add(java.lang.Float.intBitsToFloat(r.readFixed32()))
    case e: PEnum  =>
      val n = r.readVarint().toInt
      e.byNumber.get(n) match {
        case Some(sym) => arr.add(sym)
        case None => arr.add(n)
      }
    case _         => throw new IllegalStateException(s"not a scalar: $t")
  }

  // ---- map<K,V> entry plumbing -------------------------------------------
  // Wire: each entry is a nested message {1: key, 2: value}. Keys render as
  // JSON-object member names: canonical protobuf JSON stringifies all map
  // keys, with unsigned 64-bit keys in unsigned decimal.

  private[dsl] def keyToString(t: PType, r: Reader): String = t match {
    case PString            => new String(r.readDelimited().bytes(), UTF_8)
    case PInt32             => r.readVarint().toInt.toString
    case PInt64             => r.readVarint().toString
    case PSInt32            => zigzagDecode(r.readVarint()).toInt.toString
    case PSInt64            => zigzagDecode(r.readVarint()).toString
    case PUInt32            => (r.readVarint() & 0xffffffffL).toString
    case PUInt64            => java.lang.Long.toUnsignedString(r.readVarint())
    case PFixed32           => (r.readFixed32().toLong & 0xffffffffL).toString
    case PFixed64           => java.lang.Long.toUnsignedString(r.readFixed64())
    case PSFixed32          => r.readFixed32().toString
    case PSFixed64          => r.readFixed64().toString
    case PBool              => (r.readVarint() != 0L).toString
    case other              => throw new IllegalStateException(s"bad map key type $other")
  }

  private[dsl] def writeKeyString(t: PType, s: String, w: Writer): Unit = {
    w.writeTag(1, wireTypeOf(t))
    t match {
      case PString   => w.writeDelimited(s.getBytes(UTF_8))
      case PInt32    => w.writeVarint(s.toInt.toLong)
      case PInt64    => w.writeVarint(s.toLong)
      case PSInt32   => w.writeVarint(zigzagEncode(s.toInt.toLong) & 0xffffffffL)
      case PSInt64   => w.writeVarint(zigzagEncode(s.toLong))
      case PUInt32   => w.writeVarint(s.toLong & 0xffffffffL)
      case PUInt64   => w.writeVarint(java.lang.Long.parseUnsignedLong(s))
      case PFixed32  => w.writeFixed32((s.toLong & 0xffffffffL).toInt)
      case PFixed64  => w.writeFixed64(java.lang.Long.parseUnsignedLong(s))
      case PSFixed32 => w.writeFixed32(s.toInt)
      case PSFixed64 => w.writeFixed64(s.toLong)
      case PBool     => w.writeVarint(if (s.toBoolean) 1L else 0L)
      case other     => throw new IllegalStateException(s"bad map key type $other")
    }
  }

  /** proto3 default for an absent map entry key (rendered as a string). */
  private[dsl] def defaultKeyString(t: PType): String = t match {
    case PString => ""
    case PBool   => "false"
    case _       => "0"
  }

  /** proto3 default for an absent map entry value, as a Jackson node. */
  private def defaultValueNode(t: PType): JsonNode = t match {
    case PInt32 | PSInt32 | PSFixed32 => mapper.getNodeFactory.numberNode(0)
    case PInt64 | PSInt64 | PUInt32 | PUInt64 | PFixed32 | PFixed64 |
         PSFixed64 => mapper.getNodeFactory.numberNode(0L)
    case PBool   => mapper.getNodeFactory.booleanNode(false)
    case PDouble => mapper.getNodeFactory.numberNode(0.0d)
    case PFloat  => mapper.getNodeFactory.numberNode(0.0f)
    case PString => mapper.getNodeFactory.textNode("")
    case PBytes  => mapper.getNodeFactory.textNode("")
    case e: PEnum => e.byNumber.get(0) // proto3 default enum = number 0
      .map[JsonNode](mapper.getNodeFactory.textNode)
      .getOrElse(mapper.getNodeFactory.numberNode(0))
    case _: PMessage => mapper.createObjectNode()
    case other   => throw new IllegalStateException(s"bad map value type $other")
  }

  /** Decode one length-delimited value of type `t` positioned at `r`. */
  private def valueToNode(t: PType, wt: Int, r: Reader): JsonNode = t match {
    case m: PMessage =>
      require(wt == 2, s"message value needs wire type 2, got $wt"); decodeTree(m, r.readDelimited())
    case PString =>
      require(wt == 2, s"string value needs wire type 2, got $wt")
      mapper.getNodeFactory.textNode(new String(r.readDelimited().bytes(), UTF_8))
    case PBytes =>
      require(wt == 2, s"bytes value needs wire type 2, got $wt")
      mapper.getNodeFactory.textNode(
        java.util.Base64.getEncoder.encodeToString(r.readDelimited().bytes()))
    case scalar =>
      require(wt == wireTypeOf(scalar),
        s"expected wire type ${wireTypeOf(scalar)}, got $wt")
      val tmp = mapper.createArrayNode()
      scalarArrayAdd(scalar, r, tmp)
      tmp.get(0)
  }

  /** Decode a single map entry message into (keyString, valueNode). */
  private def decodeMapEntry(m: PMap, r: Reader): (String, JsonNode) = {
    var key: String = null
    var value: JsonNode = null
    while (r.hasMore) {
      val tag = r.readVarint()
      val number = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      number match {
        case 1 =>
          require(wt == wireTypeOf(m.key),
            s"map key: expected wire type ${wireTypeOf(m.key)}, got $wt")
          key = keyToString(m.key, r)
        case 2 => value = valueToNode(m.value, wt, r)
        case _ => r.skip(wt) // unknown entry field: skip like any message
      }
    }
    // spec: an entry may omit key and/or value -> proto3 defaults
    (if (key == null) defaultKeyString(m.key) else key,
     if (value == null) defaultValueNode(m.value) else value)
  }

  private def encodeMapEntry(m: PMap, key: String, value: JsonNode,
      number: Int, w: Writer): Unit = {
    val inner = new Writer
    writeKeyString(m.key, key, inner)
    m.value match {
      case sub: PMessage =>
        val body = new Writer
        encodeTree(sub, value, body)
        inner.writeTag(2, 2); inner.writeDelimited(body.out.toByteArray)
      case PString =>
        inner.writeTag(2, 2); inner.writeDelimited(value.asText().getBytes(UTF_8))
      case PBytes =>
        inner.writeTag(2, 2)
        inner.writeDelimited(java.util.Base64.getDecoder.decode(value.asText()))
      case scalar =>
        inner.writeTag(2, wireTypeOf(scalar)); encodeScalar(scalar, value, inner)
    }
    w.writeTag(number, 2); w.writeDelimited(inner.out.toByteArray)
  }

  private def decodeTree(msg: PMessage, r: Reader): ObjectNode = {
    val node = mapper.createObjectNode()
    var unknown: ArrayNode = null
    def arrayFor(f: PField): ArrayNode = node.get(f.name) match {
      case a: ArrayNode => a
      case _ => val a = mapper.createArrayNode(); node.set(f.name, a); a
    }
    while (r.hasMore) {
      val tagStart = r.pos
      val tag = r.readVarint()
      val number = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      msg.byNumber.get(number) match {
        case None =>
          // unknown field: skip for the typed tree (proto3 rule), but
          // keep the verbatim tag+payload span so encode can splice it
          // back — protobuf-java's UnknownFieldSet behavior
          r.skip(wt)
          if (unknown == null) unknown = mapper.createArrayNode()
          val u = unknown.addObject()
          u.put("num", number)
          u.put("raw", java.util.Base64.getEncoder
            .encodeToString(r.spanFrom(tagStart)))
          ()
        case Some(f) => f.ptype match {
          case m: PMap =>
            require(wt == 2, s"field ${f.name}: map entry needs wire type 2, got $wt")
            val (k, v) = decodeMapEntry(m, r.readDelimited())
            val obj = node.get(f.name) match {
              case o: ObjectNode => o
              case _ => val o = mapper.createObjectNode(); node.set(f.name, o); o
            }
            obj.set(k, v) // duplicate key: last entry wins (protobuf rule)
            ()
          case m: PMessage =>
            require(wt == 2, s"field ${f.name}: message needs wire type 2, got $wt")
            val sub = decodeTree(m, r.readDelimited())
            if (f.repeated) arrayFor(f).add(sub)
            else { dropOneofSiblings(msg, f, node); node.set(f.name, sub) }
          case PString =>
            require(wt == 2, s"field ${f.name}: string needs wire type 2, got $wt")
            val s = new String(r.readDelimited().bytes(), UTF_8)
            if (f.repeated) arrayFor(f).add(s)
            else { dropOneofSiblings(msg, f, node); node.put(f.name, s) }
          case PBytes =>
            require(wt == 2, s"field ${f.name}: bytes needs wire type 2, got $wt")
            val b = r.readDelimited().bytes()
            // base64: what Spark's JSON reader maps onto BinaryType
            val b64 = java.util.Base64.getEncoder.encodeToString(b)
            if (f.repeated) arrayFor(f).add(b64)
            else { dropOneofSiblings(msg, f, node); node.put(f.name, b64) }
          case scalar =>
            if (f.repeated && wt == 2 && wireTypeOf(scalar) != 2) { // packed
              val sub = r.readDelimited()
              val arr = arrayFor(f)
              while (sub.hasMore) scalarArrayAdd(scalar, sub, arr)
            } else {
              require(wt == wireTypeOf(scalar),
                s"field ${f.name}: expected wire type ${wireTypeOf(scalar)}, got $wt")
              if (f.repeated) scalarArrayAdd(scalar, r, arrayFor(f))
              else { // last one wins; oneof members evict the group
                dropOneofSiblings(msg, f, node)
                scalarNode(scalar, r, node, f.name)
              }
            }
        }
      }
    }
    if (unknown != null) node.set(UnknownFieldName, unknown)
    node
  }

  /** Oneof last-set-wins: setting a member clears its group siblings. */
  private def dropOneofSiblings(msg: PMessage, f: PField, node: ObjectNode): Unit =
    if (f.oneof.isDefined)
      msg.oneofSiblings.getOrElse(f.name, Nil).foreach(node.remove)

  /** Binary protobuf body → canonical-JSON text (null passes through). */
  def decodeToJson(payload: Array[Byte], msg: PMessage): String =
    if (payload == null) null
    else mapper.writeValueAsString(decodeTree(msg, new Reader(payload)))

  // ---- encode: Jackson tree -> wire bytes --------------------------------

  private def encodeScalar(t: PType, v: JsonNode, w: Writer): Unit = t match {
    case PInt32    => w.writeVarint(v.asInt().toLong)
    case PInt64    => w.writeVarint(v.asLong())
    case PSInt32   => w.writeVarint(zigzagEncode(v.asInt().toLong) & 0xffffffffL)
    case PSInt64   => w.writeVarint(zigzagEncode(v.asLong()))
    case PUInt32   => w.writeVarint(v.asLong() & 0xffffffffL)
    case PUInt64   => w.writeVarint(v.asLong()) // raw two's-complement bits
    case PFixed32  => w.writeFixed32((v.asLong() & 0xffffffffL).toInt)
    case PFixed64  => w.writeFixed64(v.asLong())
    case PSFixed32 => w.writeFixed32(v.asInt())
    case PSFixed64 => w.writeFixed64(v.asLong())
    case PBool     => w.writeVarint(if (v.asBoolean()) 1L else 0L)
    case PDouble   => w.writeFixed64(java.lang.Double.doubleToLongBits(v.asDouble()))
    case PFloat    => w.writeFixed32(java.lang.Float.floatToIntBits(v.asDouble().toFloat))
    case e: PEnum  =>
      val num =
        if (v.isTextual)
          e.byName.getOrElse(v.asText(),
            // a digits-only string is an unknown number that crossed a
            // StringType column
            try v.asText().toInt catch {
              case _: NumberFormatException => throw new IllegalArgumentException(
                s"unknown enum symbol '${v.asText()}' (expected one of ${e.symbols.map(_._1)})")
            })
        else v.asInt()
      w.writeVarint(num.toLong)
    case _         => throw new IllegalStateException(s"not a scalar: $t")
  }

  private def encodeTree(msg: PMessage, node: JsonNode, w: Writer): Unit = {
    // oneof contract: reject trees with >1 member of a group set (a decoded
    // tree can never have this; a user-built one failing loudly beats
    // silently dropping a field)
    msg.fields.filter(_.oneof.isDefined).groupBy(_.oneof.get).foreach {
      case (group, members) =>
        val set = members.filter(m => {
          val v = node.get(m.name); v != null && !v.isNull
        })
        require(set.length <= 1,
          s"oneof '$group': ${set.map(_.name).mkString(", ")} are all set")
    }
    // canonical order: ascending field number across KNOWN fields and
    // carried unknown spans alike — identical bytes to a writer whose
    // schema declared the unknown numbers (protobuf-java emits unknowns
    // after known fields; interleaving by number is strictly more
    // faithful to the canonical wider-schema encoding, and a number can
    // never be both known and unknown). Absent/null fields skipped.
    def emitKnown(f: PField, v: JsonNode): Unit =
      f.ptype match {
        case m: PMap =>
          // entries in JSON-object order (= decode order for a decoded
          // tree, so the canonical fixpoint holds); key+value always
          // written explicitly. Entries whose VALUE is null are skipped,
          // mirroring the v.isNull guard on singular fields — a Catalyst
          // MapType with valueContainsNull renders them as 'k':null,
          // which has no protobuf encoding (PString would otherwise
          // write the literal "null", PBytes would base64-garble it,
          // scalars would silently become 0/false)
          v.fields().forEachRemaining { e =>
            if (!e.getValue.isNull)
              encodeMapEntry(m, e.getKey, e.getValue, f.number, w)
          }
        case m: PMessage =>
          def one(sub: JsonNode): Unit = {
            val inner = new Writer
            encodeTree(m, sub, inner)
            w.writeTag(f.number, 2); w.writeDelimited(inner.out.toByteArray)
          }
          if (f.repeated) v.forEach(one(_)) else one(v)
        case PString =>
          def one(sub: JsonNode): Unit = {
            w.writeTag(f.number, 2); w.writeDelimited(sub.asText().getBytes(UTF_8))
          }
          if (f.repeated) v.forEach(one(_)) else one(v)
        case PBytes =>
          def one(sub: JsonNode): Unit = {
            w.writeTag(f.number, 2)
            w.writeDelimited(java.util.Base64.getDecoder.decode(sub.asText()))
          }
          if (f.repeated) v.forEach(one(_)) else one(v)
        case scalar =>
          if (f.repeated) { // packed, the proto3 default
            val inner = new Writer
            v.forEach(encodeScalar(scalar, _, inner))
            w.writeTag(f.number, 2); w.writeDelimited(inner.out.toByteArray)
          } else { w.writeTag(f.number, wireTypeOf(scalar)); encodeScalar(scalar, v, w) }
      }
    val emits = scala.collection.mutable.ArrayBuffer.empty[(Int, () => Unit)]
    msg.fields.foreach { f =>
      val v = node.get(f.name)
      if (v != null && !v.isNull) emits += (f.number -> (() => emitKnown(f, v)))
    }
    node.get(UnknownFieldName) match {
      case a: ArrayNode => a.forEach { u =>
        val raw = java.util.Base64.getDecoder.decode(u.get("raw").asText())
        emits += (u.get("num").asInt() ->
          (() => w.out.write(raw, 0, raw.length)))
      }
      case _ => ()
    }
    // stable sort: repeated unknown occurrences of one number keep their
    // decode order
    emits.sortBy(_._1).foreach(_._2())
  }

  /** Canonical-JSON text → binary protobuf body (null passes through). */
  def encodeFromJson(json: String, msg: PMessage): Array[Byte] =
    if (json == null) null
    else {
      val w = new Writer
      encodeTree(msg, mapper.readTree(json), w)
      w.out.toByteArray
    }

  // ---- Catalyst bridge ----------------------------------------------------

  /** Decode a binary protobuf column to a typed struct column.
    * `keepUnknown` carries wider-writer fields in the hidden
    * [[UnknownFieldName]] struct field so [[protoSer]] can splice them
    * back byte-identically.
    *
    * Runs as a single native expression ([[ProtoDecodeExpr]]): wire bytes
    * parse straight into the Catalyst struct, no per-row JSON hop. The
    * JSON leg ([[protoDeJson]]) remains as the differential-testing
    * reference; `ProtobufCorePropertySpec` locks the two identical.
    */
  def protoDe(c: Column, msg: PMessage, keepUnknown: Boolean = false): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(
      ProtoDecodeExpr(ColumnBridge.expression(c), msg, keepUnknown))
  }

  /** Encode a struct column to a binary protobuf column (native
    * [[ProtoEncodeExpr]], no JSON hop; [[protoSerJson]] is the reference
    * leg).
    */
  def protoSer(c: Column, msg: PMessage): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(ProtoEncodeExpr(ColumnBridge.expression(c), msg))
  }

  /** The original `udf(decodeToJson) → from_json` decode leg — kept as the
    * independently-implemented reference for differential testing against
    * [[protoDe]]'s native expression.
    */
  def protoDeJson(c: Column, msg: PMessage, keepUnknown: Boolean = false): Column = {
    val de = udf((b: Array[Byte]) => decodeToJson(b, msg))
    from_json(de(c), sparkSchema(msg, keepUnknown))
  }

  /** The original `to_json → udf(encodeFromJson)` encode leg (reference
    * for differential testing against [[protoSer]]).
    */
  def protoSerJson(c: Column, msg: PMessage): Column = {
    val ser = udf((j: String) => encodeFromJson(j, msg))
    ser(to_json(c))
  }

  // ---- Confluent SR protobuf frame ---------------------------------------
  // [magic 0x00][4-byte BE schema id][message-index varint list][body].
  // The index list locates the message within the .proto file: varint count
  // then count varint indexes, with the common [0] case optimized to the
  // single byte 0x00 (Confluent wire-format spec; the reference's
  // SchemaProtobufSerDes delegates exactly this to ProtobufSerializer).

  // Kafka's ByteUtils varints (count AND indexes) are zigzag-encoded
  private def indexListBytes(indexes: Seq[Int]): Array[Byte] = {
    val w = new Writer
    if (indexes == Seq(0)) w.writeVarint(0L)
    else {
      w.writeVarint(zigzagEncode(indexes.length.toLong))
      indexes.foreach(i => w.writeVarint(zigzagEncode(i.toLong)))
    }
    w.out.toByteArray
  }

  /** Frame a protobuf body with the SR protobuf header. */
  def srProtoFrame(c: Column, schemaId: Int, indexes: Seq[Int] = Seq(0)): Column =
    Serdes.srFrame(concat(lit(indexListBytes(indexes)), c), schemaId)

  /** Parse the SR protobuf frame header: message indexes plus a Reader
    * positioned at the protobuf body. The ONE place the frame contract
    * lives — both frame expressions ride it. The count bound keeps a
    * corrupt frame failing loudly (a zigzag count ≥ 2^31 would otherwise
    * truncate through `.toInt` into a silently wrong/empty index list);
    * real index lists are proto nesting depths, single digits.
    */
  private[dsl] def parseIndexList(b: Array[Byte]): (Seq[Int], Reader) = {
    require(b.length >= 6 && b(0) == 0, "not an SR protobuf frame")
    val r = new Reader(b, 5, b.length)
    val count = zigzagDecode(r.readVarint())
    require(count >= 0 && count <= 0xFFFF,
      s"implausible SR message-index count $count — corrupt frame")
    val idx =
      if (count == 0L) Seq(0) // the optimized single-byte [0] form
      else Seq.fill(count.toInt)(zigzagDecode(r.readVarint()).toInt)
    (idx, r)
  }

  /** Body of an SR-protobuf-framed column (drops header + index list).
    * Native expression ([[SrProtoStripExpr]]) — per-record in an SR
    * pipeline, so no UDF hop.
    */
  def srProtoStrip(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SrProtoStripExpr(ColumnBridge.expression(c)))
  }

  /** Message indexes of an SR-protobuf-framed column (e.g. `[0]`). */
  def srProtoIndexes(c: Column): Column = {
    import org.apache.spark.sql.graft.ColumnBridge
    ColumnBridge.column(SrProtoIndexesExpr(ColumnBridge.expression(c)))
  }
}

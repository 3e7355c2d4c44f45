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
  * subset a streaming pipeline actually moves — scalars, strings, bytes,
  * enums-as-ints, repeated fields, nested messages — and bridges into
  * Catalyst the same way [[AvroCore]] does: `binary → canonical JSON →
  * from_json(struct)` and back, so the full wire round-trip runs and is
  * tested anywhere Spark runs.
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
    * `PInt32`); `PSInt32`/`PSInt64` are zigzag (proto `sint*`); `PDouble`/
    * `PFloat` are fixed-width; `PString`/`PBytes`/`PMessage` are
    * length-delimited.
    */
  sealed trait PType extends Serializable
  case object PInt32 extends PType
  case object PInt64 extends PType
  case object PSInt32 extends PType
  case object PSInt64 extends PType
  case object PBool extends PType
  case object PDouble extends PType
  case object PFloat extends PType
  case object PString extends PType
  case object PBytes extends PType
  final case class PMessage(fields: Seq[PField]) extends PType {
    require(fields.map(_.number).distinct.length == fields.length,
      "duplicate field numbers")
    require(fields.map(_.name).distinct.length == fields.length,
      "duplicate field names")
    @transient lazy val byNumber: Map[Int, PField] =
      fields.map(f => f.number -> f).toMap
  }
  final case class PField(number: Int, name: String, ptype: PType,
      repeated: Boolean = false) {
    require(number >= 1, s"field numbers start at 1, got $number")
  }

  /** The Catalyst struct a message decodes to (give this to `from_json`). */
  def sparkSchema(msg: PMessage): StructType =
    StructType(msg.fields.map { f =>
      val base = f.ptype match {
        case PInt32 | PSInt32 => IntegerType
        case PInt64 | PSInt64 => LongType
        case PBool            => BooleanType
        case PDouble          => DoubleType
        case PFloat           => FloatType
        case PString          => StringType
        case PBytes           => BinaryType
        case m: PMessage      => sparkSchema(m)
      }
      StructField(f.name,
        if (f.repeated) ArrayType(base) else base, nullable = true)
    })

  // ---- wire-format primitives (protobuf encoding spec) -------------------

  private final class Reader(buf: Array[Byte], var pos: Int, val end: Int) {
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
      require(len >= 0 && pos + len <= end, s"bad delimited length $len")
      val r = new Reader(buf, pos, pos + len)
      pos += len; r
    }
    def bytes(): Array[Byte] = java.util.Arrays.copyOfRange(buf, pos, end)
    def skip(wireType: Int): Unit = wireType match {
      case 0 => readVarint()
      case 1 => readFixed64()
      case 2 => readDelimited()
      case 5 => readFixed32()
      case w => throw new IllegalArgumentException(s"unsupported wire type $w")
    }
  }

  private final class Writer {
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

  private def zigzagDecode(n: Long): Long = (n >>> 1) ^ -(n & 1)
  private def zigzagEncode(n: Long): Long = (n << 1) ^ (n >> 63)

  private def wireTypeOf(t: PType): Int = t match {
    case PInt32 | PInt64 | PSInt32 | PSInt64 | PBool => 0
    case PDouble => 1
    case PFloat => 5
    case PString | PBytes | _: PMessage => 2
  }

  // ---- decode: wire bytes -> Jackson tree --------------------------------

  @transient private lazy val mapper = new ObjectMapper()

  private def scalarNode(t: PType, r: Reader, node: ObjectNode, name: String): Unit =
    t match {
      case PInt32   => node.put(name, r.readVarint().toInt)
      case PInt64   => node.put(name, r.readVarint())
      case PSInt32  => node.put(name, zigzagDecode(r.readVarint()).toInt)
      case PSInt64  => node.put(name, zigzagDecode(r.readVarint()))
      case PBool    => node.put(name, r.readVarint() != 0L)
      case PDouble  => node.put(name, java.lang.Double.longBitsToDouble(r.readFixed64()))
      case PFloat   => node.put(name, java.lang.Float.intBitsToFloat(r.readFixed32()))
      case _        => throw new IllegalStateException(s"not a scalar: $t")
    }

  private def scalarArrayAdd(t: PType, r: Reader, arr: ArrayNode): Unit = t match {
    case PInt32   => arr.add(r.readVarint().toInt)
    case PInt64   => arr.add(r.readVarint())
    case PSInt32  => arr.add(zigzagDecode(r.readVarint()).toInt)
    case PSInt64  => arr.add(zigzagDecode(r.readVarint()))
    case PBool    => arr.add(r.readVarint() != 0L)
    case PDouble  => arr.add(java.lang.Double.longBitsToDouble(r.readFixed64()))
    case PFloat   => arr.add(java.lang.Float.intBitsToFloat(r.readFixed32()))
    case _        => throw new IllegalStateException(s"not a scalar: $t")
  }

  private def decodeTree(msg: PMessage, r: Reader): ObjectNode = {
    val node = mapper.createObjectNode()
    def arrayFor(f: PField): ArrayNode = node.get(f.name) match {
      case a: ArrayNode => a
      case _ => val a = mapper.createArrayNode(); node.set(f.name, a); a
    }
    while (r.hasMore) {
      val tag = r.readVarint()
      val number = (tag >>> 3).toInt
      val wt = (tag & 7).toInt
      msg.byNumber.get(number) match {
        case None => r.skip(wt) // unknown field: proto3 skip rule
        case Some(f) => f.ptype match {
          case m: PMessage =>
            require(wt == 2, s"field ${f.name}: message needs wire type 2, got $wt")
            val sub = decodeTree(m, r.readDelimited())
            if (f.repeated) arrayFor(f).add(sub) else node.set(f.name, sub)
          case PString =>
            require(wt == 2, s"field ${f.name}: string needs wire type 2, got $wt")
            val s = new String(r.readDelimited().bytes(), UTF_8)
            if (f.repeated) arrayFor(f).add(s) else node.put(f.name, s)
          case PBytes =>
            require(wt == 2, s"field ${f.name}: bytes needs wire type 2, got $wt")
            val b = r.readDelimited().bytes()
            // base64: what Spark's JSON reader maps onto BinaryType
            val b64 = java.util.Base64.getEncoder.encodeToString(b)
            if (f.repeated) arrayFor(f).add(b64) else node.put(f.name, b64)
          case scalar =>
            if (f.repeated && wt == 2) { // packed (proto3 default)
              val sub = r.readDelimited()
              val arr = arrayFor(f)
              while (sub.hasMore) scalarArrayAdd(scalar, sub, arr)
            } else {
              require(wt == wireTypeOf(scalar),
                s"field ${f.name}: expected wire type ${wireTypeOf(scalar)}, got $wt")
              if (f.repeated) scalarArrayAdd(scalar, r, arrayFor(f))
              else scalarNode(scalar, r, node, f.name) // last one wins
            }
        }
      }
    }
    node
  }

  /** Binary protobuf body → canonical-JSON text (null passes through). */
  def decodeToJson(payload: Array[Byte], msg: PMessage): String =
    if (payload == null) null
    else mapper.writeValueAsString(decodeTree(msg, new Reader(payload)))

  // ---- encode: Jackson tree -> wire bytes --------------------------------

  private def encodeScalar(t: PType, v: JsonNode, w: Writer): Unit = t match {
    case PInt32   => w.writeVarint(v.asInt().toLong)
    case PInt64   => w.writeVarint(v.asLong())
    case PSInt32  => w.writeVarint(zigzagEncode(v.asInt().toLong) & 0xffffffffL)
    case PSInt64  => w.writeVarint(zigzagEncode(v.asLong()))
    case PBool    => w.writeVarint(if (v.asBoolean()) 1L else 0L)
    case PDouble  => w.writeFixed64(java.lang.Double.doubleToLongBits(v.asDouble()))
    case PFloat   => w.writeFixed32(java.lang.Float.floatToIntBits(v.asDouble().toFloat))
    case _        => throw new IllegalStateException(s"not a scalar: $t")
  }

  private def encodeTree(msg: PMessage, node: JsonNode, w: Writer): Unit = {
    // canonical order: ascending field number; absent/null fields skipped
    msg.fields.sortBy(_.number).foreach { f =>
      val v = node.get(f.name)
      if (v != null && !v.isNull) f.ptype match {
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
    }
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

  /** Decode a binary protobuf column to a typed struct column. */
  def protoDe(c: Column, msg: PMessage): Column = {
    val de = udf((b: Array[Byte]) => decodeToJson(b, msg))
    from_json(de(c), sparkSchema(msg))
  }

  /** Encode a struct column to a binary protobuf column. */
  def protoSer(c: Column, msg: PMessage): Column = {
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

  /** Body of an SR-protobuf-framed column (drops header + index list). */
  def srProtoStrip(c: Column): Column = {
    val strip = udf { (b: Array[Byte]) =>
      if (b == null) null
      else {
        require(b.length >= 6 && b(0) == 0, "not an SR protobuf frame")
        val r = new Reader(b, 5, b.length)
        val count = zigzagDecode(r.readVarint())
        var i = 0L
        while (i < count) { r.readVarint(); i += 1 }
        r.bytes()
      }
    }
    strip(c)
  }

  /** Message indexes of an SR-protobuf-framed column (e.g. `[0]`). */
  def srProtoIndexes(c: Column): Column = {
    val idx = udf { (b: Array[Byte]) =>
      if (b == null) null
      else {
        require(b.length >= 6 && b(0) == 0, "not an SR protobuf frame")
        val r = new Reader(b, 5, b.length)
        val count = zigzagDecode(r.readVarint())
        if (count == 0L) Seq(0)
        else (0L until count).map(_ => zigzagDecode(r.readVarint()).toInt)
      }
    }
    idx(c)
  }
}

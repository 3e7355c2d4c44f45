package graft.dsl

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.scalatest.funsuite.AnyFunSuite

import ProtobufCore._

/** Shared random schema/value generators — also the draw source for
  * `ProtoCatalystParitySpec`'s differential lock of the native expressions
  * against this spec's JSON leg.
  */
private[dsl] object ProtoGen {

  val mapper = new ObjectMapper()

  def randScalar(rnd: scala.util.Random): PType =
    rnd.nextInt(14) match {
      case 0  => PInt32
      case 1  => PInt64
      case 2  => PSInt32
      case 3  => PSInt64
      case 4  => PBool
      case 5  => PDouble
      case 6  => PFloat
      case 7  => PString
      case 8  => PUInt32
      case 9  => PUInt64
      case 10 => PFixed32
      case 11 => PFixed64
      case 12 => PSFixed32
      case 13 => PSFixed64
    }

  def randKeyType(rnd: scala.util.Random): PType =
    rnd.nextInt(8) match {
      case 0 => PInt32
      case 1 => PInt64
      case 2 => PSInt64
      case 3 => PUInt32
      case 4 => PUInt64
      case 5 => PFixed64
      case 6 => PBool
      case 7 => PString
    }

  def randMessage(rnd: scala.util.Random, depth: Int): PMessage = {
    val nFields = 1 + rnd.nextInt(5)
    PMessage((0 until nFields).map { i =>
      val t = rnd.nextInt(13) match {
        case 8 => PBytes
        case 9 if depth < 2 => randMessage(rnd, depth + 1)
        case 10 => // map<K,V>: value is any non-map type
          val v = rnd.nextInt(5) match {
            case 0 => PBytes
            case 1 if depth < 2 => randMessage(rnd, depth + 1)
            case 2 => PEnum(Seq("A" -> 0, "B" -> 1, "C" -> 5))
            case _ => randScalar(rnd)
          }
          PMap(randKeyType(rnd), v)
        case 11 => PEnum(Seq("A" -> 0, "B" -> 1, "C" -> 5))
        case _ => randScalar(rnd)
      }
      val isMap = t.isInstanceOf[PMap]
      val repeated = !isMap && rnd.nextInt(4) == 0
      // singular non-map fields sometimes share a oneof group
      val oneof = if (!isMap && !repeated && rnd.nextInt(4) == 0)
        Some(s"g${rnd.nextInt(2)}") else None
      // skip some field numbers like evolving schemas do
      PField(i * 2 + 1 + rnd.nextInt(2), s"f$i", t, repeated, oneof)
    })
  }

  /** A random map key rendered the way the decoder renders it. */
  def randKeyString(rnd: scala.util.Random, t: PType): String = t match {
    case PString => rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString
    case PBool   => rnd.nextBoolean().toString
    case PInt32  => rnd.nextInt().toString
    case PUInt32 => (rnd.nextLong() & 0xffffffffL).toString
    case PUInt64 | PFixed64 => java.lang.Long.toUnsignedString(rnd.nextLong())
    case _       => rnd.nextLong().toString
  }

  /** Value node of exactly the Jackson node types the decoder produces. */
  def randValue(rnd: scala.util.Random, msg: PMessage): ObjectNode = {
    val node = mapper.createObjectNode()
    val setGroups = scala.collection.mutable.Set.empty[String]
    def randLeaf(t: PType): com.fasterxml.jackson.databind.JsonNode = {
      val nf = mapper.getNodeFactory
      t match {
        case PInt32 | PSInt32 | PSFixed32 => nf.numberNode(rnd.nextInt())
        case PInt64 | PSInt64 | PSFixed64 => nf.numberNode(rnd.nextLong())
        case PUInt32 | PFixed32 => nf.numberNode(rnd.nextLong() & 0xffffffffL)
        case PUInt64 | PFixed64 => nf.numberNode(rnd.nextLong()) // raw bits
        case PBool   => nf.booleanNode(rnd.nextBoolean())
        case PDouble => nf.numberNode(rnd.nextDouble() * 1e6 - 5e5)
        case PFloat  => nf.numberNode(rnd.nextFloat() * 100 - 50)
        case PString =>
          nf.textNode(rnd.alphanumeric.take(rnd.nextInt(12)).mkString + "é☃")
        case PBytes =>
          val b = new Array[Byte](rnd.nextInt(16)); rnd.nextBytes(b)
          nf.textNode(java.util.Base64.getEncoder.encodeToString(b))
        case e: PEnum =>
          if (rnd.nextInt(4) == 0) nf.numberNode(100 + rnd.nextInt(50)) // unknown
          else nf.textNode(e.symbols(rnd.nextInt(e.symbols.length))._1)
        case m: PMessage => randValue(rnd, m)
        case m: PMap => throw new IllegalStateException(s"map leaf: $m")
      }
    }
    msg.fields.foreach { f =>
      def one(): Unit = f.ptype match {
        case m: PMap =>
          val obj = mapper.createObjectNode()
          (0 until rnd.nextInt(4)).foreach { _ =>
            obj.set[com.fasterxml.jackson.databind.JsonNode](
              randKeyString(rnd, m.key), randLeaf(m.value))
          }
          // empty map encodes to nothing = decodes absent, like empty arrays
          if (obj.size() > 0) { node.set(f.name, obj); () }
        case t =>
          val v = randLeaf(t)
          if (f.repeated) { node.withArray(f.name).add(v); () }
          else { node.set[com.fasterxml.jackson.databind.JsonNode](f.name, v); () }
      }
      val oneofBlocked = f.oneof.exists(setGroups.contains)
      if (oneofBlocked || rnd.nextInt(5) == 0) () // absent (or group taken)
      else {
        f.oneof.foreach(setGroups += _)
        if (f.repeated) (0 until rnd.nextInt(4)).foreach(_ => one()) else one()
      }
    }
    // drop empty arrays: an empty repeated field encodes to nothing and
    // decodes as absent, which is the same logical value
    val it = node.fields()
    val empties = scala.collection.mutable.ArrayBuffer.empty[String]
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue.isArray && e.getValue.isEmpty) empties += e.getKey
    }
    empties.foreach(node.remove)
    node
  }
}

/** Randomized round-trip lock for the hand-rolled protobuf wire codec:
  * for random schemas (all scalar kinds — varint, zigzag, unsigned,
  * fixed, sfixed — doubles/floats, strings, bytes, repeated fields,
  * nested messages, map&lt;K,V&gt;, oneof groups) and random values,
  *
  *   value-tree → encodeFromJson → decodeToJson → the same value-tree
  *
  * structurally, and the re-encode of the decode is byte-identical (the
  * canonical-encoding fixpoint). 200 schema/value draws per run,
  * deterministic seed.
  */
class ProtobufCorePropertySpec extends AnyFunSuite {
  import ProtoGen._

  test("malformed bytes fail cleanly: decode throws, never hangs or misparses") {
    // directed case random fuzz never finds: a 5-byte varint length of
    // Int.MaxValue whose bound check would overflow Int arithmetic into a
    // negative reader position (ArrayIndexOutOfBoundsException) instead of
    // the clean require failure
    val overflow = Array(0x0a, 0xff, 0xff, 0xff, 0xff, 0x07).map(_.toByte)
    val nested = PMessage(Seq(PField(1, "f", PMessage(Seq(PField(1, "x", PInt32))))))
    intercept[IllegalArgumentException] { decodeToJson(overflow, nested) }

    val rnd = new scala.util.Random(7)
    (1 to 300).foreach { i =>
      val msg = randMessage(rnd, 0)
      val junk = new Array[Byte](rnd.nextInt(48)); rnd.nextBytes(junk)
      try { decodeToJson(junk, msg); () } // short junk CAN be a valid message
      catch {
        case _: IllegalArgumentException => () // truncation / wire mismatch
        case e: Throwable =>
          fail(s"draw $i: junk bytes must raise IllegalArgumentException, got " +
            s"${e.getClass.getName}: ${e.getMessage}")
      }
    }
    // truncating VALID encodings mid-stream must also fail cleanly (or
    // decode a prefix of fields — protobuf is self-delimiting per field)
    (1 to 100).foreach { i =>
      val msg = randMessage(rnd, 0)
      val bytes = encodeFromJson(
        mapper.writeValueAsString(randValue(rnd, msg)), msg)
      if (bytes.nonEmpty) {
        val cut = java.util.Arrays.copyOf(bytes, rnd.nextInt(bytes.length))
        try { decodeToJson(cut, msg); () }
        catch {
          case _: IllegalArgumentException => ()
          case e: Throwable =>
            fail(s"draw $i: truncated bytes must raise " +
              s"IllegalArgumentException, got ${e.getClass.getName}")
        }
      }
    }
  }

  test("wider-writer unknown fields round-trip byte-identically through a narrow reader") {
    // recursively drop ~a third of the fields (at any nesting depth, incl.
    // map value messages) to build the narrow READER schema; everything
    // the wide WRITER emitted must survive decode(narrow) -> encode(narrow)
    // via the $unknown carrier, byte for byte
    def narrowOf(rnd: scala.util.Random, m: PMessage): PMessage =
      PMessage(m.fields.filter(_ => rnd.nextInt(3) > 0).map { f =>
        f.ptype match {
          case sub: PMessage => f.copy(ptype = narrowOf(rnd, sub))
          case PMap(k, sub: PMessage) => f.copy(ptype = PMap(k, narrowOf(rnd, sub)))
          case _ => f
        }
      })
    val rnd = new scala.util.Random(47)
    var sawUnknown = 0
    (1 to 200).foreach { i =>
      val wide = randMessage(rnd, 0)
      val narrow = narrowOf(rnd, wide)
      val tree = randValue(rnd, wide)
      val bytes = encodeFromJson(mapper.writeValueAsString(tree), wide)
      val json = decodeToJson(bytes, narrow)
      if (json.contains("\"$unknown\"")) sawUnknown += 1
      assert(encodeFromJson(json, narrow).toSeq === bytes.toSeq,
        s"draw $i: narrow re-encode not byte-identical\nwide=$wide\n" +
          s"narrow=$narrow\ndecoded=$json")
      // and the narrow decode of the re-encode is a fixpoint too
      assert(mapper.readTree(decodeToJson(bytes, narrow)) === mapper.readTree(json))
    }
    assert(sawUnknown > 50, s"only $sawUnknown draws exercised unknown capture")
  }

  test("null map values are skipped on encode, mirroring singular null fields") {
    val msg = PMessage(Seq(PField(1, "m", PMap(PString, PString)),
      PField(2, "s", PString)))
    val bytes = encodeFromJson("""{"m":{"a":null,"b":"x"},"s":"y"}""", msg)
    assert(mapper.readTree(decodeToJson(bytes, msg)) ===
      mapper.readTree("""{"m":{"b":"x"},"s":"y"}"""))
    // all-null map encodes to nothing -> decodes absent
    val empty = encodeFromJson("""{"m":{"a":null}}""", msg)
    assert(empty.isEmpty)
  }

  test("random schemas and values: tree -> bytes -> tree, and bytes are a fixpoint") {
    val rnd = new scala.util.Random(31)
    (1 to 200).foreach { i =>
      val msg = randMessage(rnd, 0)
      val tree = randValue(rnd, msg)
      val json1 = mapper.writeValueAsString(tree)
      val bytes = encodeFromJson(json1, msg)
      val json2 = decodeToJson(bytes, msg)
      // compare PARSED trees: parsing normalizes number node types
      // (FloatNode vs DoubleNode render identically but differ in equals)
      assert(mapper.readTree(json2) === mapper.readTree(json1),
        s"draw $i: decode mismatch\nschema=$msg\nin =$json1\nout=$json2")
      assert(encodeFromJson(json2, msg).toSeq === bytes.toSeq,
        s"draw $i: re-encode not byte-identical for $json2")
    }
  }
}

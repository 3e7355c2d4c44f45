package graft.dsl

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode
import org.scalatest.funsuite.AnyFunSuite

import ProtobufCore._

/** Randomized round-trip lock for the hand-rolled protobuf wire codec:
  * for random schemas (scalars, zigzag ints, doubles/floats, strings,
  * bytes, repeated fields, nested messages) and random values,
  *
  *   value-tree → encodeFromJson → decodeToJson → the same value-tree
  *
  * structurally, and the re-encode of the decode is byte-identical (the
  * canonical-encoding fixpoint). 200 schema/value draws per run,
  * deterministic seed.
  */
class ProtobufCorePropertySpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  private def randScalar(rnd: scala.util.Random): PType =
    rnd.nextInt(8) match {
      case 0 => PInt32
      case 1 => PInt64
      case 2 => PSInt32
      case 3 => PSInt64
      case 4 => PBool
      case 5 => PDouble
      case 6 => PFloat
      case 7 => PString
    }

  private def randMessage(rnd: scala.util.Random, depth: Int): PMessage = {
    val nFields = 1 + rnd.nextInt(5)
    PMessage((0 until nFields).map { i =>
      val t = rnd.nextInt(10) match {
        case 8 => PBytes
        case 9 if depth < 2 => randMessage(rnd, depth + 1)
        case _ => randScalar(rnd)
      }
      // skip some field numbers like evolving schemas do
      PField(i * 2 + 1 + rnd.nextInt(2), s"f$i", t, repeated = rnd.nextInt(4) == 0)
    })
  }

  /** Value node of exactly the Jackson node types the decoder produces. */
  private def randValue(rnd: scala.util.Random, msg: PMessage): ObjectNode = {
    val node = mapper.createObjectNode()
    msg.fields.foreach { f =>
      def one(): Unit = f.ptype match {
        case PInt32 | PSInt32 =>
          if (f.repeated) node.withArray(f.name).add(rnd.nextInt())
          else node.put(f.name, rnd.nextInt())
        case PInt64 | PSInt64 =>
          if (f.repeated) node.withArray(f.name).add(rnd.nextLong())
          else node.put(f.name, rnd.nextLong())
        case PBool =>
          if (f.repeated) node.withArray(f.name).add(rnd.nextBoolean())
          else node.put(f.name, rnd.nextBoolean())
        case PDouble =>
          val v = rnd.nextDouble() * 1e6 - 5e5
          if (f.repeated) node.withArray(f.name).add(v) else node.put(f.name, v)
        case PFloat =>
          val v = rnd.nextFloat() * 100 - 50
          if (f.repeated) node.withArray(f.name).add(v) else node.put(f.name, v)
        case PString =>
          val v = rnd.alphanumeric.take(rnd.nextInt(12)).mkString + "é☃" // non-ascii
          if (f.repeated) node.withArray(f.name).add(v) else node.put(f.name, v)
        case PBytes =>
          val b = new Array[Byte](rnd.nextInt(16)); rnd.nextBytes(b)
          val b64 = java.util.Base64.getEncoder.encodeToString(b)
          if (f.repeated) node.withArray(f.name).add(b64) else node.put(f.name, b64)
        case m: PMessage =>
          val sub = randValue(rnd, m)
          if (f.repeated) { node.withArray(f.name).add(sub); () }
          else { node.set[com.fasterxml.jackson.databind.JsonNode](f.name, sub); () }
      }
      if (rnd.nextInt(5) == 0) () // absent field (proto3 default) — skipped
      else if (f.repeated) (0 until rnd.nextInt(4)).foreach(_ => one())
      else one()
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

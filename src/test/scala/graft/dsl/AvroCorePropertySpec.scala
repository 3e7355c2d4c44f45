package graft.dsl

import java.nio.ByteBuffer

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.scalatest.funsuite.AnyFunSuite

/** Randomized round-trip lock for the AvroCore JSON bridge AGAINST THE
  * AVRO LIBRARY as the independent reference implementation: for random
  * schemas (primitives, bytes/fixed, enums, arrays, maps, nested records,
  * nullable unions, multi-branch unions, and the logical types decimal/
  * date/timestamp-millis/timestamp-micros/uuid) and random library-built
  * records,
  *
  *   library-encode → AvroCore.decodeToJson → AvroCore.encodeFromJson →
  *   library-decode
  *
  * must reproduce the original record structurally. 150 schema/record
  * draws, deterministic seed.
  */
/** Shared random Avro schema/record generators — also the draw source
  * for `AvroCatalystParitySpec`'s differential lock of the native
  * expressions against the JSON leg.
  */
private[dsl] object AvroGen {

  private var nameCounter = 0
  def freshName(): String = synchronized { nameCounter += 1; s"T$nameCounter" }

  def randSchema(rnd: scala.util.Random, depth: Int): Schema = {
    def primitive(): Schema = Schema.create(rnd.nextInt(7) match {
      case 0 => Schema.Type.BOOLEAN
      case 1 => Schema.Type.INT
      case 2 => Schema.Type.LONG
      case 3 => Schema.Type.FLOAT
      case 4 => Schema.Type.DOUBLE
      case 5 => Schema.Type.STRING
      case 6 => Schema.Type.BYTES
    })
    rnd.nextInt(11) match {
      case 0 => Schema.createEnum(freshName(), null, null, Seq("A", "B", "C").asJava)
      case 1 => Schema.createFixed(freshName(), null, null, 4)
      case 10 => // logical types on their base schemas
        rnd.nextInt(10) match {
          case 0 => org.apache.avro.LogicalTypes.decimal(9, 2)
            .addToSchema(Schema.create(Schema.Type.BYTES))
          case 1 => org.apache.avro.LogicalTypes.decimal(11, 3)
            .addToSchema(Schema.createFixed(freshName(), null, null, 5))
          case 2 => org.apache.avro.LogicalTypes.date()
            .addToSchema(Schema.create(Schema.Type.INT))
          case 3 => org.apache.avro.LogicalTypes.timestampMillis()
            .addToSchema(Schema.create(Schema.Type.LONG))
          case 4 => org.apache.avro.LogicalTypes.timestampMicros()
            .addToSchema(Schema.create(Schema.Type.LONG))
          case 5 => org.apache.avro.LogicalTypes.uuid()
            .addToSchema(Schema.create(Schema.Type.STRING))
          case 6 => org.apache.avro.LogicalTypes.localTimestampMillis()
            .addToSchema(Schema.create(Schema.Type.LONG))
          case 7 => org.apache.avro.LogicalTypes.localTimestampMicros()
            .addToSchema(Schema.create(Schema.Type.LONG))
          case 8 => org.apache.avro.LogicalTypes.timeMillis()
            .addToSchema(Schema.create(Schema.Type.INT))
          case 9 => org.apache.avro.LogicalTypes.timeMicros()
            .addToSchema(Schema.create(Schema.Type.LONG))
        }
      case 2 => Schema.createArray(primitive())
      case 3 => Schema.createMap(primitive())
      case 4 => // nullable union
        Schema.createUnion(Schema.create(Schema.Type.NULL), primitive())
      case 5 => // multi-branch union (distinct branch types); sometimes a
        // named record branch, whose label is its FULL name
        if (depth < 2 && rnd.nextBoolean())
          Schema.createUnion(Schema.create(Schema.Type.NULL),
            Schema.create(Schema.Type.STRING), randRecord(rnd, depth + 1))
        else
          Schema.createUnion(Schema.create(Schema.Type.NULL),
            Schema.create(Schema.Type.STRING), Schema.create(Schema.Type.LONG))
      case 6 if depth < 2 => randRecord(rnd, depth + 1)
      case _ => primitive()
    }
  }

  def randRecord(rnd: scala.util.Random, depth: Int): Schema = {
    val fields = (0 until 1 + rnd.nextInt(4)).map { i =>
      new Schema.Field(s"f$i", randSchema(rnd, depth), null, null)
    }
    Schema.createRecord(freshName(), null, "graft.test", false, fields.asJava)
  }

  private def decimalUnscaled(rnd: scala.util.Random, s: Schema): Long = {
    val p = s.getLogicalType
      .asInstanceOf[org.apache.avro.LogicalTypes.Decimal].getPrecision
    val bound = math.min(math.pow(10, p.toDouble).toLong, Int.MaxValue.toLong)
    rnd.nextLong() % bound // in (-bound, bound): at most p digits
  }

  def randValue(rnd: scala.util.Random, s: Schema): AnyRef =
    Option(s.getLogicalType).map(_.getName).getOrElse("") match {
      // decimals: CANONICAL unscaled bytes (minimal two's complement for
      // bytes, sign-extended-to-size for fixed) — the form our encoder
      // emits, so the library-record compare is well-defined. Unscaled
      // values stay within the declared PRECISION (the avro spec contract;
      // a 10-digit unscaled in a decimal(9,_) is an invalid value — the
      // native expressions reject those loudly, see the directed test)
      case "decimal" if s.getType == Schema.Type.BYTES =>
        ByteBuffer.wrap(java.math.BigInteger.valueOf(
          decimalUnscaled(rnd, s)).toByteArray)
      case "decimal" =>
        val v = java.math.BigInteger.valueOf(decimalUnscaled(rnd, s))
        val raw = v.toByteArray
        val out = Array.fill[Byte](s.getFixedSize)(
          if (v.signum() < 0) (-1).toByte else 0.toByte)
        System.arraycopy(raw, 0, out, s.getFixedSize - raw.length, raw.length)
        new GenericData.Fixed(s, out)
      // bounded so the ISO renders stay in 4-digit-year parse range
      case "date" =>
        java.lang.Integer.valueOf(rnd.nextInt(3000000) - 1500000)
      case "timestamp-millis" | "local-timestamp-millis" =>
        java.lang.Long.valueOf(rnd.nextLong() % 4102444800000L)
      case "timestamp-micros" | "local-timestamp-micros" =>
        java.lang.Long.valueOf(rnd.nextLong() % 4102444800000000L)
      case "time-millis" => // non-negative millis of day
        java.lang.Integer.valueOf(rnd.nextInt(86400000))
      case "time-micros" => // non-negative micros of day
        java.lang.Long.valueOf(Math.floorMod(rnd.nextLong(), 86400000000L))
      case _ => randBaseValue(rnd, s) // uuid rides its string base
    }

  def randBaseValue(rnd: scala.util.Random, s: Schema): AnyRef = s.getType match {
    case Schema.Type.BOOLEAN => java.lang.Boolean.valueOf(rnd.nextBoolean())
    case Schema.Type.INT     => java.lang.Integer.valueOf(rnd.nextInt())
    case Schema.Type.LONG    => java.lang.Long.valueOf(rnd.nextLong())
    case Schema.Type.FLOAT   => java.lang.Float.valueOf(rnd.nextFloat() * 100 - 50)
    case Schema.Type.DOUBLE  => java.lang.Double.valueOf(rnd.nextDouble() * 1e6 - 5e5)
    case Schema.Type.STRING  =>
      new org.apache.avro.util.Utf8(rnd.alphanumeric.take(rnd.nextInt(10)).mkString + "é☃")
    case Schema.Type.BYTES   =>
      val b = new Array[Byte](rnd.nextInt(8)); rnd.nextBytes(b); ByteBuffer.wrap(b)
    case Schema.Type.FIXED   =>
      val b = new Array[Byte](s.getFixedSize); rnd.nextBytes(b)
      new GenericData.Fixed(s, b)
    case Schema.Type.ENUM    =>
      new GenericData.EnumSymbol(s, s.getEnumSymbols.get(rnd.nextInt(s.getEnumSymbols.size())))
    case Schema.Type.ARRAY   =>
      val out = new java.util.ArrayList[AnyRef]()
      (0 until rnd.nextInt(4)).foreach(_ => out.add(randValue(rnd, s.getElementType)))
      out
    case Schema.Type.MAP     =>
      val out = new java.util.HashMap[String, AnyRef]()
      (0 until rnd.nextInt(4)).foreach(i =>
        out.put(s"k$i", randValue(rnd, s.getValueType)))
      out
    case Schema.Type.UNION   =>
      val branches = s.getTypes.asScala
      val b = branches(rnd.nextInt(branches.size))
      if (b.getType == Schema.Type.NULL) null else randValue(rnd, b)
    case Schema.Type.RECORD  =>
      val rec = new GenericData.Record(s)
      s.getFields.asScala.foreach(f => rec.put(f.pos(), randValue(rnd, f.schema())))
      rec
    case t => throw new IllegalStateException(s"unexpected $t")
  }

}

class AvroCorePropertySpec extends AnyFunSuite {
  import AvroGen._

  test("random schemas: library bytes -> JSON bridge -> library record, structurally equal") {
    val rnd = new scala.util.Random(41)
    (1 to 150).foreach { i =>
      val schema = randRecord(rnd, 0)
      val rec = randValue(rnd, schema).asInstanceOf[GenericRecord]
      // producer: the avro LIBRARY writes the bytes
      val out = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
      enc.flush()
      val bytes1 = out.toByteArray
      // bridge: decode to canonical JSON, re-encode to binary
      val json = AvroCore.decodeToJson(bytes1, schema.toString)
      val bytes2 = AvroCore.encodeFromJson(json, schema.toString)
      // consumer: the avro LIBRARY reads our bytes back
      val rec2 = new GenericDatumReader[GenericRecord](schema)
        .read(null, DecoderFactory.get().binaryDecoder(bytes2, null))
      // Record.equals delegates to GenericData's equals-mode compare
      // (maps compared by equality, not order)
      assert(rec2 === rec,
        s"draw $i: record mismatch\nschema=$schema\njson=$json\nin =$rec\nout=$rec2")
    }
  }
}

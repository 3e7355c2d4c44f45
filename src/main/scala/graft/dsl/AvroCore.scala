package graft.dsl

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Avro value serde on the CORE Avro library (`org.apache.avro`, which ships
  * with Spark itself) — the reference's `SchemaAvroSerDes<T>` body
  * (`serdes/Streamiz.Kafka.Net.SchemaRegistry.SerDes.Avro/
  * SchemaAvroSerDes.cs:15`) without the spark-avro module.
  *
  * [[Serdes.avroDe]]/[[Serdes.avroSer]] (the spark-avro `from_avro`/
  * `to_avro` expressions) stay the preferred cluster path — codegen'd,
  * no JSON hop. This core path produces and consumes the SAME binary Avro
  * bytes through the library's JSON encoding as a bridge into Catalyst
  * (`binary → Avro JSON → from_json(struct)` and back), so the full
  * wire-format round-trip — including the schema-registry frame
  * ([[Serdes.srFrame]]/[[Serdes.srStrip]]) — is executable and tested
  * anywhere Spark runs, connector jar or not.
  *
  * Schemas and datum readers/writers are cached per executor (keyed by the
  * schema JSON); encoders and byte buffers are allocated per row (they are
  * not thread-safe). The per-row cost is one decode + one JSON render. Use
  * on the serde BOUNDARY only — once decoded, stay in Catalyst structs.
  *
  * Supported Avro types through the JSON bridge: records of primitives,
  * nested records, arrays, and maps — the shapes `from_json` parses
  * directly. Avro UNIONS are NOT bridged (Avro JSON wraps them as
  * `{"type": value}`, which `from_json` cannot unwrap) — use the spark-avro
  * expressions for union-typed schemas.
  */
object AvroCore extends Serializable {

  // per-JVM (executor) cache keyed by schema JSON: Schema parsing is the
  // expensive part; the datum reader/writer pair rides along because both
  // are thread-safe after construction (GenericDatumReader keeps its
  // ResolvingDecoder in a static ThreadLocal; GenericDatumWriter is
  // stateless beyond the schema). Encoders/decoders and output buffers are
  // NOT thread-safe and stay per-row.
  private final case class Serde(schema: Schema,
      reader: GenericDatumReader[GenericRecord],
      writer: GenericDatumWriter[GenericRecord])
  @transient private lazy val serdes =
    new java.util.concurrent.ConcurrentHashMap[String, Serde]()
  private def serdeOf(json: String): Serde =
    serdes.computeIfAbsent(json, { j =>
      val s = new Schema.Parser().parse(j)
      Serde(s, new GenericDatumReader[GenericRecord](s),
        new GenericDatumWriter[GenericRecord](s))
    })

  /** Binary Avro body → the record as Avro-JSON text (null passes through). */
  def decodeToJson(payload: Array[Byte], schemaJson: String): String = {
    if (payload == null) return null
    val sd = serdeOf(schemaJson)
    val rec = sd.reader.read(null, DecoderFactory.get().binaryDecoder(payload, null))
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().jsonEncoder(sd.schema, out)
    sd.writer.write(rec, enc)
    enc.flush()
    out.toString("UTF-8")
  }

  /** Avro-JSON text → binary Avro body (null passes through). */
  def encodeFromJson(json: String, schemaJson: String): Array[Byte] = {
    if (json == null) return null
    val sd = serdeOf(schemaJson)
    val rec = sd.reader.read(null, DecoderFactory.get().jsonDecoder(sd.schema, json))
    val out = new ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    sd.writer.write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  /** Decode a binary Avro column to a typed struct column.
    * `sparkSchema` mirrors the Avro record's fields (names must match;
    * Avro-JSON field encodings of primitives parse as their Spark types).
    */
  def avroDe(c: Column, avroSchemaJson: String, sparkSchema: StructType): Column = {
    val de = udf((b: Array[Byte]) => decodeToJson(b, avroSchemaJson))
    from_json(de(c), sparkSchema)
  }

  /** Encode a struct column to a binary Avro column against the schema. */
  def avroSer(c: Column, avroSchemaJson: String): Column = {
    val ser = udf((j: String) => encodeFromJson(j, avroSchemaJson))
    ser(to_json(c))
  }
}

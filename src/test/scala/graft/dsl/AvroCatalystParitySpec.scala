package graft.dsl

import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential lock of the native Avro expressions
  * ([[AvroDecodeExpr]]/[[AvroEncodeExpr]], the `avroDe`/`avroSer` path)
  * against the JSON leg (`avroDeJson`/`avroSerJson`) over [[AvroGen]]'s
  * random schema/record draws, through a real DataFrame plan:
  *
  *  - decoded structs render to identical JSON;
  *  - the native encode equals the JSON leg's encode byte for byte;
  *  - the avro LIBRARY reads the native encode back into a record
  *    structurally equal to the original (the same closure
  *    `AvroCorePropertySpec` locks for the JSON leg).
  */
class AvroCatalystParitySpec extends SparkSpec {
  import AvroGen._

  test("native decode/encode ≡ JSON leg on random schemas, through a DataFrame") {
    val rnd = new scala.util.Random(59)
    (1 to 3).foreach { batch =>
      val draws = (1 to 40).map { _ =>
        val schema = randRecord(rnd, 0)
        val rec = randValue(rnd, schema).asInstanceOf[GenericRecord]
        val out = new java.io.ByteArrayOutputStream()
        val enc = EncoderFactory.get().binaryEncoder(out, null)
        new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
        enc.flush()
        (schema, rec, out.toByteArray)
      }
      val cols: Seq[Column] = draws.zipWithIndex.flatMap { case ((schema, _, bytes), i) =>
        val sj = schema.toString
        val b = lit(bytes)
        val direct = AvroCore.avroDe(b, sj)
        val viaJson = AvroCore.avroDeJson(b, sj)
        Seq(
          (to_json(direct) <=> to_json(viaJson)).as(s"dec_$i"),
          AvroCore.avroSer(direct, sj).as(s"encN_$i"),
          AvroCore.avroSerJson(viaJson, sj).as(s"encJ_$i"))
      }
      val row = spark.range(1).select(cols: _*).head()
      draws.zipWithIndex.foreach { case ((schema, rec, bytes), i) =>
        assert(row.getBoolean(3 * i),
          s"batch $batch draw $i: decoded structs differ\nschema=$schema")
        val encN = row.getAs[Array[Byte]](3 * i + 1)
        val encJ = row.getAs[Array[Byte]](3 * i + 2)
        assert(encN.toSeq === encJ.toSeq,
          s"batch $batch draw $i: native vs JSON-leg encode differ\nschema=$schema")
        val rec2 = new GenericDatumReader[GenericRecord](schema)
          .read(null, DecoderFactory.get().binaryDecoder(encN, null))
        assert(rec2 === rec,
          s"batch $batch draw $i: library read-back mismatch\nschema=$schema" +
            s"\nin =$rec\nout=$rec2\nbytes=${bytes.toSeq}")
      }
    }
  }

  test("null payload decodes to null; custom compatible schema routes via JSON leg") {
    val schema = AvroGen.randRecord(new scala.util.Random(3), 0)
    val sj = schema.toString
    val df = spark.range(1).select(
      AvroCore.avroDe(lit(null).cast("binary"), sj).as("nul"))
    assert(df.head().isNullAt(0))
    // a hand-written (equal) schema still runs; sanity only
    val derived = AvroCore.sparkSchemaFor(sj)
    val df2 = spark.range(1).select(
      AvroCore.avroDe(lit(null).cast("binary"), sj, derived).as("nul"))
    assert(df2.head().isNullAt(0))
  }

  test("native decode fails LOUDLY on a precision-violating decimal (JSON leg nulls it)") {
    // decimal(4,1) carrying a 5-digit unscaled value is invalid per the
    // avro spec; from_json's permissive parse silently nulls it — the
    // native expression raises instead, which is the behavior we WANT on
    // corrupt data. This test pins the divergence deliberately.
    val sj = """{"type":"record","name":"D","fields":[{"name":"d","type":
      {"type":"bytes","logicalType":"decimal","precision":4,"scale":1}}]}"""
    val bad = {
      val schema = new org.apache.avro.Schema.Parser().parse(sj)
      val rec = new org.apache.avro.generic.GenericData.Record(schema)
      rec.put(0, java.nio.ByteBuffer.wrap(
        java.math.BigInteger.valueOf(99999L).toByteArray))
      val out = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
      enc.flush()
      out.toByteArray
    }
    val err = intercept[Exception] {
      spark.range(1).select(AvroCore.avroDe(lit(bad), sj)).head()
    }
    assert(err.getMessage.contains("Decimal(4, 1)") ||
      err.getCause != null, s"unexpected: $err")
  }

  test("timeAsTime: time-millis/micros decode to TIME(6) and round-trip (native-only)") {
    // the JSON leg cannot express this at all (from_json rejects TIME);
    // the lock here is against the avro LIBRARY: library-written bytes ->
    // native TIME decode -> native encode -> byte-identical, and the
    // collected value is the right java.time.LocalTime. TIME is behind
    // Spark 4.1's own experimental gate — avroDeTime requires it on
    // (collect/encoders reject TIME otherwise)
    spark.conf.set("spark.sql.timeType.enabled", "true")
    try {
    val sj = """{"type":"record","name":"T","fields":[
      {"name":"tm","type":{"type":"int","logicalType":"time-millis"}},
      {"name":"tu","type":{"type":"long","logicalType":"time-micros"}}]}"""
    val schema = new org.apache.avro.Schema.Parser().parse(sj)
    val rec = new org.apache.avro.generic.GenericData.Record(schema)
    rec.put(0, 45296789)            // 12:34:56.789
    rec.put(1, 45296789123L)        // 12:34:56.789123
    val out = new java.io.ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    val bytes = out.toByteArray

    val row = spark.range(1).select(
      AvroCore.avroDeTime(lit(bytes), sj).as("m"),
      AvroCore.avroSerTime(AvroCore.avroDeTime(lit(bytes), sj), sj).as("rt"),
      AvroCore.avroDe(lit(bytes), sj).as("base")).head()
    val m = row.getStruct(0)
    assert(m.getAs[java.time.LocalTime]("tm") ===
      java.time.LocalTime.of(12, 34, 56, 789000000))
    assert(m.getAs[java.time.LocalTime]("tu") ===
      java.time.LocalTime.of(12, 34, 56, 789123000))
    assert(row.getAs[Array[Byte]](1).toSeq === bytes.toSeq,
      "TIME round trip must be byte-identical")
    // the default mapping stays int/long (spark-avro convention, JSON-leg
    // parity): same bytes, base-typed struct
    val base = row.getStruct(2)
    assert(base.getInt(0) === 45296789 && base.getLong(1) === 45296789123L)
    } finally spark.conf.unset("spark.sql.timeType.enabled")
  }

  test("encode rejects a struct whose field types do not match the schema") {
    val sj = """{"type":"record","name":"R","fields":[
      {"name":"a","type":"long"}]}"""
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).select(
        AvroCore.avroSer(struct(lit("not a long").as("a")), sj)).head()
    }
    assert(err.getMessage.contains("avro_encode"))
  }
}

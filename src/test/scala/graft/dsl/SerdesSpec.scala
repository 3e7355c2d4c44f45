package graft.dsl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Serde layer (`ISerDes<T>` pairs → column transforms). */
class SerdesSpec extends SparkSpec {
  import spark.implicits._

  test("string/long/double serdes round-trip through binary columns") {
    val df = Seq(("k1", 42L, 2.5d)).toDF("s", "l", "d")
      .select(
        Serdes.stringDe(Serdes.stringSer(col("s"))).as("s"),
        Serdes.longDe(Serdes.stringSer(col("l").cast("string"))).as("l"),
        Serdes.doubleDe(Serdes.stringSer(col("d").cast("string"))).as("d"))
    assert(df.as[(String, Long, Double)].head() === (("k1", 42L, 2.5d)))
  }

  test("json serde round-trips a struct through binary") {
    val schema = StructType(Seq(
      StructField("a", IntegerType), StructField("b", StringType)))
    val df = Seq((1, "x")).toDF("a", "b")
      .select(Serdes.jsonSer(struct(col("a"), col("b"))).as("raw"))
      .select(Serdes.jsonDe(col("raw"), schema).as("v"))
      .select(col("v.a"), col("v.b"))
    assert(df.as[(Int, String)].head() === ((1, "x")))
  }

  test("schema-registry wire format round-trips: frame -> id/magic/strip") {
    val payload = "hello".getBytes("UTF-8")
    val df = Seq(Tuple1(payload)).toDF("body")
      .select(Serdes.srFrame(col("body"), schemaId = 0x01020304).as("framed"))
      .select(
        Serdes.srIsFramed(col("framed")).as("ok"),
        Serdes.srSchemaId(col("framed")).as("id"),
        Serdes.srStrip(col("framed")).as("body"))
    val (ok, id, body) = df.as[(Boolean, Int, Array[Byte])].head()
    assert(ok)
    assert(id === 0x01020304)
    assert(body.toSeq === payload.toSeq)
  }

  test("schema-registry framing detects an unframed payload") {
    val df = Seq(Tuple1("x".getBytes("UTF-8"))).toDF("body")
      .select(Serdes.srIsFramed(col("body")).as("ok"))
    assert(!df.as[Boolean].head())
  }

  test("protobuf serde columns construct against a real descriptor set") {
    // hand-encoded FileDescriptorSet for: message Msg { optional int32 a = 1; }
    // (protobuf wire format, all lengths < 128 so no multi-byte varints)
    def lenDelim(field: Int, body: Array[Byte]): Array[Byte] =
      Array(((field << 3) | 2).toByte, body.length.toByte) ++ body
    def varint(field: Int, v: Int): Array[Byte] =
      Array((field << 3).toByte, v.toByte)
    val fieldA = lenDelim(1, "a".getBytes) ++ varint(3, 1) ++
      varint(4, 1) ++ varint(5, 5) // name=a number=1 label=OPTIONAL type=INT32
    val msg = lenDelim(1, "Msg".getBytes) ++ lenDelim(2, fieldA)
    val file = lenDelim(1, "msg.proto".getBytes) ++ lenDelim(4, msg)
    val set = lenDelim(1, file)
    val descPath = java.nio.file.Files.createTempFile("graft_msg", ".desc")
    java.nio.file.Files.write(descPath, set)

    val ser = Serdes.protobufSer(struct(lit(1).as("a")), "Msg", descPath.toString)
    val de = Serdes.protobufDe(col("raw"), "Msg", descPath.toString)
    assert(ser.toString.contains("to_protobuf") && de.toString.contains("from_protobuf"))
  }

  test("protobuf core serde: SR-framed wire bytes round-trip through typed columns") {
    import ProtobufCore._
    val msg = PMessage(Seq(
      PField(1, "id", PInt64),
      PField(2, "name", PString),
      PField(3, "score", PDouble),
      PField(4, "flags", PInt32, repeated = true),
      PField(5, "ok", PBool),
      PField(6, "delta", PSInt32),
      PField(7, "payload", PBytes),
      PField(8, "tags", PString, repeated = true),
      PField(9, "inner", PMessage(Seq(
        PField(1, "x", PInt32), PField(2, "s", PString))))))

    // producer side: HAND-ENCODED bytes straight from the published wire
    // format (tags, varints, zigzag, packed, nested) — independent of our
    // Writer, so this is external ground truth, like the Avro test's
    // library-produced bytes
    val body: Array[Byte] = (
      Seq(0x08, 0x96, 0x01) ++                    // id    = varint 150
      Seq(0x12, 0x05) ++ "alpha".getBytes.map(_.toInt) ++ // name = "alpha"
      Seq(0x19, 0, 0, 0, 0, 0, 0, 0xf8, 0x3f) ++  // score = 1.5 (LE fixed64)
      Seq(0x22, 0x03, 0x03, 0x8e, 0x02) ++        // flags = packed [3, 270]
      Seq(0x28, 0x01) ++                          // ok    = true
      Seq(0x30, 0x03) ++                          // delta = sint32 -2 (zigzag 3)
      Seq(0x3a, 0x02, 0xde, 0xad) ++              // payload = 0xDEAD
      Seq(0x42, 0x01, 'a'.toInt) ++               // tags  = ["a",
      Seq(0x42, 0x01, 'b'.toInt) ++               //          "b"]
      Seq(0x4a, 0x05, 0x08, 0x07, 0x12, 0x01, 'z'.toInt) // inner = {x:7, s:"z"}
    ).map(_.toByte).toArray

    // canonical re-encode of the decode must reproduce the bytes exactly
    assert(encodeFromJson(decodeToJson(body, msg), msg).toSeq === body.toSeq)

    // full column path: SR protobuf frame (magic + schema id + index list)
    // -> strip -> typed struct fields
    val framed = Seq(Tuple1(body)).toDF("body")
      .select(srProtoFrame(col("body"), schemaId = 9).as("raw"))
    val r = framed.select(
        Serdes.srSchemaId(col("raw")).as("sid"),
        srProtoIndexes(col("raw")).as("idx"),
        protoDe(srProtoStrip(col("raw")), msg).as("m"))
      .select(col("sid"), col("idx"), col("m.id"), col("m.name"), col("m.score"),
        col("m.flags"), col("m.ok"), col("m.delta"), col("m.payload"),
        col("m.tags"), col("m.inner.x"), col("m.inner.s"))
      .collect().head
    assert(r.getInt(0) === 9)
    assert(r.getSeq[Int](1) === Seq(0))
    assert(r.getLong(2) === 150L)
    assert(r.getString(3) === "alpha")
    assert(r.getDouble(4) === 1.5)
    assert(r.getSeq[Int](5) === Seq(3, 270))
    assert(r.getBoolean(6) === true)
    assert(r.getInt(7) === -2)
    assert(r.getAs[Array[Byte]](8).toSeq === Seq(0xde.toByte, 0xad.toByte))
    assert(r.getSeq[String](9) === Seq("a", "b"))
    assert(r.getInt(10) === 7)
    assert(r.getString(11) === "z")

    // reverse leg: struct -> protoSer bytes are the canonical encoding
    val reenc = Seq((150L, "alpha")).toDF("id", "name")
      .select(protoSer(struct(col("id"), col("name")),
        PMessage(Seq(PField(1, "id", PInt64), PField(2, "name", PString)))).as("bin"))
      .collect().head.getAs[Array[Byte]]("bin")
    assert(reenc.toSeq ===
      (Seq(0x08, 0x96, 0x01, 0x12, 0x05).map(_.toByte) ++ "alpha".getBytes).toSeq)
  }

  test("protobuf core serde: maps, oneof, unsigned and fixed types decode to Catalyst") {
    import ProtobufCore._
    val msg = PMessage(Seq(
      PField(1, "attrs", PMap(PString, PInt32)),
      PField(2, "names", PMap(PInt64, PString)),
      PField(3, "u32", PUInt32),
      PField(4, "u64", PUInt64),
      PField(5, "sf32", PSFixed32),
      PField(6, "sf64", PSFixed64),
      PField(7, "fx32", PFixed32),
      PField(8, "fx64", PFixed64),
      PField(9, "s", PString, oneof = Some("choice")),
      PField(10, "n", PInt32, oneof = Some("choice")),
      PField(11, "color", PEnum(Seq("RED" -> 0, "GREEN" -> 2, "BLUE" -> 5))),
      PField(12, "shade", PEnum(Seq("RED" -> 0, "GREEN" -> 2)))))

    // hand-encoded wire bytes (external ground truth, like the test above)
    val body: Array[Byte] = (
      Seq(0x0a, 0x05, 0x0a, 0x01, 'k'.toInt, 0x10, 0x07) ++     // attrs["k"]=7
      Seq(0x0a, 0x07, 0x0a, 0x02, 'k'.toInt, 'k'.toInt,
          0x10, 0xac, 0x02) ++                                  // attrs["kk"]=300
      Seq(0x12, 0x08, 0x08, 0x05, 0x12, 0x04) ++
        "five".getBytes.map(_.toInt) ++                         // names[5]="five"
      Seq(0x18, 0xff, 0xff, 0xff, 0xff, 0x0f) ++                // u32 = 2^32-1
      Seq(0x20, 0xff, 0xff, 0xff, 0xff, 0xff,
          0xff, 0xff, 0xff, 0xff, 0x01) ++                      // u64 = 2^64-1
      Seq(0x2d, 0xfe, 0xff, 0xff, 0xff) ++                      // sf32 = -2
      Seq(0x31, 0xfd, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff) ++ // sf64 = -3
      Seq(0x3d, 0xfe, 0xff, 0xff, 0xff) ++                      // fx32 = 2^32-2
      Seq(0x41, 0xfe, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff, 0xff) ++ // fx64 = 2^64-2
      Seq(0x4a, 0x01, 'x'.toInt) ++                             // s = "x" (oneof)
      Seq(0x50, 0x09) ++                                        // n = 9: evicts s
      Seq(0x58, 0x05) ++                                        // color = BLUE
      Seq(0x60, 0x07)                                           // shade = unknown 7
    ).map(_.toByte).toArray

    val schema = sparkSchema(msg)
    assert(schema("attrs").dataType ===
      org.apache.spark.sql.types.MapType(
        org.apache.spark.sql.types.StringType,
        org.apache.spark.sql.types.IntegerType))
    assert(schema("u64").dataType === org.apache.spark.sql.types.LongType)

    val r = Seq(Tuple1(body)).toDF("raw")
      .select(protoDe(col("raw"), msg).as("m")).select("m.*")
      .collect().head
    assert(r.getAs[Map[String, Int]]("attrs") === Map("k" -> 7, "kk" -> 300))
    assert(r.getAs[Map[String, String]]("names") === Map("5" -> "five"))
    assert(r.getAs[Long]("u32") === 4294967295L)
    assert(r.getAs[Long]("u64") === -1L)      // 2^64-1 as raw long bits
    assert(r.getAs[Int]("sf32") === -2)
    assert(r.getAs[Long]("sf64") === -3L)
    assert(r.getAs[Long]("fx32") === 4294967294L)
    assert(r.getAs[Long]("fx64") === -2L)     // 2^64-2 as raw long bits
    assert(r.isNullAt(r.fieldIndex("s")))     // oneof: last-set (n) wins
    assert(r.getAs[Int]("n") === 9)
    assert(r.getAs[String]("color") === "BLUE") // enum -> symbol string
    assert(r.getAs[String]("shade") === "7")    // unknown number kept (proto3)

    // the DECODED tree is in canonical form: its re-encode is a fixpoint
    // (the raw body itself is not — it set both oneof members)
    val bytes2 = encodeFromJson(decodeToJson(body, msg), msg)
    assert(encodeFromJson(decodeToJson(bytes2, msg), msg).toSeq === bytes2.toSeq)

    // struct -> wire: a Spark map column encodes as map entry messages
    val mapBytes = spark.range(1)
      .select(protoSer(struct(map(lit("a"), lit(1)).as("attrs")),
        PMessage(Seq(PField(1, "attrs", PMap(PString, PInt32))))).as("bin"))
      .collect().head.getAs[Array[Byte]]("bin")
    assert(mapBytes.toSeq ===
      Seq(0x0a, 0x05, 0x0a, 0x01, 'a'.toInt, 0x10, 0x01).map(_.toByte).toSeq)

    // encoding a tree with two oneof members set fails loudly
    val ex = intercept[IllegalArgumentException] {
      encodeFromJson("""{"s":"x","n":1}""", msg)
    }
    assert(ex.getMessage.contains("oneof"))
  }

  test("protobuf core serde: unpacked repeated scalars and repeated messages decode") {
    import ProtobufCore._
    val msg = PMessage(Seq(
      PField(1, "xs", PInt32, repeated = true),
      PField(2, "ms", PMessage(Seq(PField(1, "v", PInt32))), repeated = true)))
    // proto2-style writer: repeated int32 UNPACKED (one tag per element)
    // interleaved with repeated nested messages
    val body = Array(
      0x08, 0x01,             // xs += 1 (unpacked varint)
      0x12, 0x02, 0x08, 0x07, // ms += {v: 7}
      0x08, 0x02,             // xs += 2
      0x12, 0x02, 0x08, 0x09, // ms += {v: 9}
      0x08, 0x03              // xs += 3
    ).map(_.toByte)
    assert(decodeToJson(body, msg) === """{"xs":[1,2,3],"ms":[{"v":7},{"v":9}]}""")
    // our canonical re-encode packs the scalars; decoding THAT again must
    // produce the same logical value (packed and unpacked are wire-equal)
    val reenc = encodeFromJson(decodeToJson(body, msg), msg)
    assert(decodeToJson(reenc, msg) === """{"xs":[1,2,3],"ms":[{"v":7},{"v":9}]}""")
    // and the re-encode is the packed canonical form
    assert(reenc.toSeq === Array(
      0x0a, 0x03, 0x01, 0x02, 0x03,  // xs packed
      0x12, 0x02, 0x08, 0x07,
      0x12, 0x02, 0x08, 0x09).map(_.toByte).toSeq)
    // empty message: no fields set -> zero bytes, decodes to {}
    assert(encodeFromJson("""{}""", msg).length === 0)
    assert(decodeToJson(Array.emptyByteArray, msg) === "{}")
  }

  test("protobuf core serde: unknown fields skip, negatives and multi-index frames survive") {
    import ProtobufCore._
    val msg = PMessage(Seq(PField(1, "a", PInt32)))
    // unknown field 15 (varint) + unknown field 16 (length-delim) around a=5
    val withUnknown = Array(
      0x78, 0x2a,                   // field 15 varint 42 (unknown -> skipped)
      0x08, 0x05,                   // a = 5
      0x82.toByte, 0x01, 0x02, 0x61, 0x62 // field 16 len-delim "ab" (unknown)
    ).map(_.toByte)
    // typed fields skip the unknowns; the verbatim spans ride $unknown
    val decoded = decodeToJson(withUnknown, msg)
    assert(decoded.startsWith("""{"a":5,"$unknown":"""))
    // splice-back re-encode is byte-identical, in canonical number order
    // (known a=5 first, then fields 15 and 16)
    assert(encodeFromJson(decoded, msg).toSeq ===
      (Array(0x08, 0x05, 0x78, 0x2a, 0x82.toByte, 0x01, 0x02, 0x61, 0x62)
        .map(_.toByte)).toSeq)

    // Catalyst leg: protoDe(keepUnknown) carries them through a DataFrame
    // column and protoSer splices them back
    val reenc = Seq(Tuple1(withUnknown)).toDF("raw")
      .select(protoSer(protoDe(col("raw"), msg, keepUnknown = true), msg)
        .as("out"))
      .collect().head.getAs[Array[Byte]]("out")
    assert(reenc.toSeq ===
      (Array(0x08, 0x05, 0x78, 0x2a, 0x82.toByte, 0x01, 0x02, 0x61, 0x62)
        .map(_.toByte)).toSeq)
    // without keepUnknown the typed schema drops them (proto3 skip rule)
    val dropped = Seq(Tuple1(withUnknown)).toDF("raw")
      .select(protoSer(protoDe(col("raw"), msg), msg).as("out"))
      .collect().head.getAs[Array[Byte]]("out")
    assert(dropped.toSeq === Array[Byte](0x08, 0x05).toSeq)

    // negative int32: 10-byte sign-extended varint both directions
    val neg = encodeFromJson("""{"a":-1}""", msg)
    assert(neg.length === 11) // 1 tag byte + 10 varint bytes
    assert(decodeToJson(neg, msg) === """{"a":-1}""")

    // non-default message-index list round-trips (zigzag varints)
    val framed = Seq(Tuple1(Array[Byte](0x08, 0x05))).toDF("body")
      .select(srProtoFrame(col("body"), schemaId = 3, indexes = Seq(1, 2)).as("raw"))
    val row = framed.select(
        Serdes.srSchemaId(col("raw")).as("sid"),
        srProtoIndexes(col("raw")).as("idx"),
        protoDe(srProtoStrip(col("raw")), msg).as("m"))
      .select(col("sid"), col("idx"), col("m.a")).collect().head
    assert(row.getInt(0) === 3)
    assert(row.getSeq[Int](1) === Seq(1, 2))
    assert(row.getInt(2) === 5)
  }

  test("time-windowed serde round-trips and matches the reference byte layout") {
    import spark.implicits._
    val df = Seq(("test", 10000L), ("k2", 0L)).toDF("k", "start")
      .withColumn("framed", Serdes.windowedSer(Serdes.stringSer(col("k")), col("start")))
      .withColumn("stored", Serdes.windowedStoreSer(Serdes.stringSer(col("k")), col("start"), 7))
    val rows = df.select(
      col("framed"),
      Serdes.stringDe(Serdes.windowedKeyBytes(col("framed"))).as("k2"),
      Serdes.windowedStartMs(col("framed")).as("s2"),
      Serdes.stringDe(Serdes.windowedStoreKeyBytes(col("stored"))).as("k3"),
      Serdes.windowedStoreStartMs(col("stored")).as("s3"),
      Serdes.windowedStoreSeq(col("stored")).as("seq"))
      .collect()

    // round-trip both formats
    assert(rows.map(r => (r.getString(1), r.getLong(2))).toSeq ===
      Seq(("test", 10000L), ("k2", 0L)))
    assert(rows.map(r => (r.getString(3), r.getLong(4), r.getInt(5))).toSeq ===
      Seq(("test", 10000L, 7), ("k2", 0L, 7)))

    // byte-level layout = reference WindowKeyHelper.ToBinary: key bytes then
    // the 8-byte big-endian start (10000 = 0x2710)
    val framed = rows.find(_.getString(1) == "test").get.getAs[Array[Byte]](0)
    assert(framed === "test".getBytes("UTF-8") ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0x27, 0x10))
  }

  test("avro serde columns construct against a JSON Avro schema (evaluation is a cluster concern)") {
    val avroSchema =
      """{"type":"record","name":"r","fields":[
        |{"name":"a","type":"int"},{"name":"b","type":"string"}]}""".stripMargin
    // construct-only: the spark-avro expression impl is a deploy-time dep
    val ser = Serdes.avroSer(struct(lit(1).as("a"), lit("x").as("b")))
    val de = Serdes.avroDe(col("raw"), avroSchema)
    assert(ser.toString.contains("to_avro") && de.toString.contains("from_avro"))
  }

  test("avro core serde: SR-framed binary Avro round-trips through typed columns") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.{DecoderFactory, EncoderFactory}
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

    val avroSchema =
      """{"type":"record","name":"evt","fields":[
        |{"name":"id","type":"long"},{"name":"name","type":"string"}]}""".stripMargin
    val schema = new Schema.Parser().parse(avroSchema)
    val sparkSchema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))

    // producer side, simulated with the avro LIBRARY (not our code): binary
    // records framed with the Confluent wire header for schema id 7
    def produce(id: Long, name: String): Array[Byte] = {
      val rec = new GenericData.Record(schema)
      rec.put("id", id); rec.put("name", name)
      val out = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
      enc.flush()
      out.toByteArray
    }
    val framed = Seq(produce(1L, "alpha"), produce(2L, "beta"))
      .toDF("body")
      .select(Serdes.srFrame(col("body"), schemaId = 7).as("raw"))

    // consumer side: strip the frame, decode, read typed fields
    val decoded = framed.select(
      Serdes.srSchemaId(col("raw")).as("sid"),
      AvroCore.avroDe(Serdes.srStrip(col("raw")), avroSchema, sparkSchema).as("r"))
    val rows = decoded.select(col("sid"), col("r.id"), col("r.name"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sortBy(_._2)
    assert(rows.toSeq === Seq((7, 1L, "alpha"), (7, 2L, "beta")))

    // reverse leg: our encoder's bytes decode with the plain avro library
    val reencoded = Seq((3L, "gamma")).toDF("id", "name")
      .select(AvroCore.avroSer(struct(col("id"), col("name")), avroSchema).as("bin"))
      .collect().head.getAs[Array[Byte]]("bin")
    val back = new GenericDatumReader[GenericRecord](schema)
      .read(null, DecoderFactory.get().binaryDecoder(reencoded, null))
    assert(back.get("id") === 3L && back.get("name").toString === "gamma")
  }

  test("avro core serde: union-typed fields round-trip as structs of optionals") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.{DecoderFactory, EncoderFactory}

    // the VERDICT-prescribed shape: a ["null","string","long"] union plus a
    // plain nullable ["null","double"] (must flatten, not wrap)
    val avroSchema =
      """{"type":"record","name":"u_test","fields":[
        |{"name":"id","type":"long"},
        |{"name":"u","type":["null","string","long"]},
        |{"name":"opt","type":["null","double"]}]}""".stripMargin
    val schema = new Schema.Parser().parse(avroSchema)

    // derived Catalyst schema: multi-branch union -> struct of optionals
    // keyed by branch label; nullable union -> plain nullable type
    val derived = AvroCore.sparkSchemaFor(avroSchema)
    assert(derived("u").dataType.simpleString === "struct<string:string,long:bigint>")
    assert(derived("opt").dataType.simpleString === "double")

    // producer side: the avro LIBRARY writes the binary records
    def produce(id: Long, u: Any, opt: Any): Array[Byte] = {
      val rec = new GenericData.Record(schema)
      rec.put("id", id); rec.put("u", u); rec.put("opt", opt)
      val out = new java.io.ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
      enc.flush()
      out.toByteArray
    }
    val bodies = Seq(
      produce(1L, new org.apache.avro.util.Utf8("alpha"), 2.5),
      produce(2L, java.lang.Long.valueOf(99L), null),
      produce(3L, null, null))
    val decoded = bodies.toDF("body")
      .select(AvroCore.avroDe(col("body"), avroSchema).as("r"))
      .select(col("r.id"), col("r.u.string").as("us"), col("r.u.long").as("ul"),
        col("r.opt"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)),
        Option(r.get(3)))).sortBy(_._1)
    assert(decoded.toSeq === Seq(
      (1L, Some("alpha"), None, Some(2.5)),
      (2L, None, Some(99L), None),
      (3L, None, None, None)))

    // reverse leg: our encoder's union bytes decode with the plain avro
    // library, both branch shapes and the null
    def reenc(id: Long, us: Option[String], ul: Option[Long], opt: Option[Double]) =
      Seq((id, us, ul, opt)).toDF("id", "us", "ul", "opt")
        .select(AvroCore.avroSer(struct(col("id"),
          struct(col("us").as("string"), col("ul").as("long")).as("u"),
          col("opt")), avroSchema).as("bin"))
        .collect().head.getAs[Array[Byte]]("bin")
    def readBack(b: Array[Byte]): GenericRecord =
      new GenericDatumReader[GenericRecord](schema)
        .read(null, DecoderFactory.get().binaryDecoder(b, null))
    val r1 = readBack(reenc(7L, Some("beta"), None, Some(0.5)))
    assert(r1.get("id") === 7L && r1.get("u").toString === "beta" &&
      r1.get("opt") === 0.5)
    val r2 = readBack(reenc(8L, None, Some(123L), None))
    assert(r2.get("u") === 123L && r2.get("opt") === null)
    // struct-typed u with both branches null = the union's null branch
    val r3 = readBack(reenc(9L, None, None, None))
    assert(r3.get("u") === null)
  }

  test("avro core serde: nested records and arrays survive the JSON bridge") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.EncoderFactory
    import org.apache.spark.sql.types._

    val avroSchema =
      """{"type":"record","name":"doc","fields":[
        |{"name":"id","type":"long"},
        |{"name":"meta","type":{"type":"record","name":"meta","fields":[
        |  {"name":"lang","type":"string"},{"name":"score","type":"double"}]}},
        |{"name":"tags","type":{"type":"array","items":"string"}}]}""".stripMargin
    val schema = new Schema.Parser().parse(avroSchema)
    val sparkSchema = StructType(Seq(
      StructField("id", LongType),
      StructField("meta", StructType(Seq(
        StructField("lang", StringType), StructField("score", DoubleType)))),
      StructField("tags", ArrayType(StringType))))

    val meta = new GenericData.Record(schema.getField("meta").schema())
    meta.put("lang", "en"); meta.put("score", 0.75)
    val rec = new GenericData.Record(schema)
    rec.put("id", 9L); rec.put("meta", meta)
    rec.put("tags", java.util.Arrays.asList("a", "b"))
    val out = new java.io.ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()

    val row = Seq(out.toByteArray).toDF("bin")
      .select(AvroCore.avroDe(col("bin"), avroSchema, sparkSchema).as("r"))
      .select(col("r.id"), col("r.meta.lang"), col("r.meta.score"), col("r.tags"))
      .collect().head
    assert(row.getLong(0) === 9L)
    assert(row.getString(1) === "en" && row.getDouble(2) === 0.75)
    assert(row.getSeq[String](3) === Seq("a", "b"))
  }

  test("avro core serde: logical types map to Decimal/Date/Timestamp columns") {
    import org.apache.avro.Schema
    import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
    import org.apache.avro.io.{DecoderFactory, EncoderFactory}
    import org.apache.spark.sql.types._

    val avroSchema =
      """{"type":"record","name":"lt","fields":[
        |{"name":"price","type":{"type":"bytes","logicalType":"decimal","precision":9,"scale":2}},
        |{"name":"fprice","type":{"type":"fixed","name":"d5","size":5,"logicalType":"decimal","precision":11,"scale":3}},
        |{"name":"day","type":{"type":"int","logicalType":"date"}},
        |{"name":"ts_ms","type":{"type":"long","logicalType":"timestamp-millis"}},
        |{"name":"ts_us","type":{"type":"long","logicalType":"timestamp-micros"}},
        |{"name":"uid","type":{"type":"string","logicalType":"uuid"}},
        |{"name":"lt_ms","type":{"type":"long","logicalType":"local-timestamp-millis"}},
        |{"name":"lt_us","type":{"type":"long","logicalType":"local-timestamp-micros"}},
        |{"name":"t_us","type":{"type":"long","logicalType":"time-micros"}},
        |{"name":"opt_ts","type":["null",{"type":"long","logicalType":"timestamp-millis"}]}]}""".stripMargin
    val schema = new Schema.Parser().parse(avroSchema)

    // the derived Catalyst schema carries the logical types
    val derived = AvroCore.sparkSchemaFor(avroSchema)
    assert(derived("price").dataType === DecimalType(9, 2))
    assert(derived("fprice").dataType === DecimalType(11, 3))
    assert(derived("day").dataType === DateType)
    assert(derived("ts_ms").dataType === TimestampType)
    assert(derived("ts_us").dataType === TimestampType)
    assert(derived("uid").dataType === StringType)
    assert(derived("lt_ms").dataType === TimestampNTZType)
    assert(derived("lt_us").dataType === TimestampNTZType)
    // time-of-day rides its base long (the spark-avro convention)
    assert(derived("t_us").dataType === LongType)
    assert(derived("opt_ts").dataType === TimestampType) // nullable union flattens

    // producer side: the avro LIBRARY writes raw base values (unscaled
    // bytes / epoch days / epoch millis+micros) — external ground truth
    val msUs = 1614834367089L                     // 2021-03-04T05:06:07.089Z
    val usUs = 1614834367089123L                  // ...07.089123Z
    val rec = new GenericData.Record(schema)
    rec.put("price", java.nio.ByteBuffer.wrap(
      java.math.BigInteger.valueOf(123456L).toByteArray))          // 1234.56
    val neg = java.math.BigInteger.valueOf(-7125L).toByteArray     // -7.125
    val padded = Array.fill[Byte](5)(-1)
    System.arraycopy(neg, 0, padded, 5 - neg.length, neg.length)
    rec.put("fprice",
      new GenericData.Fixed(schema.getField("fprice").schema(), padded))
    rec.put("day", java.time.LocalDate.of(2021, 3, 4).toEpochDay.toInt)
    rec.put("ts_ms", msUs)
    rec.put("ts_us", usUs)
    rec.put("uid", "123e4567-e89b-12d3-a456-426614174000")
    rec.put("lt_ms", 946684800123L)     // 2000-01-01T00:00:00.123 (no zone)
    rec.put("lt_us", 946684800123456L)  // ...00.123456 — sub-milli digits live
    rec.put("t_us", 37800123456L)       // 10:30:00.123456 time-of-day micros
    rec.put("opt_ts", null)
    val out = new java.io.ByteArrayOutputStream()
    val enc = EncoderFactory.get().binaryEncoder(out, null)
    new GenericDatumWriter[GenericRecord](schema).write(rec, enc)
    enc.flush()
    val body = out.toByteArray

    // canonical fixpoint through the JSON bridge
    assert(AvroCore.encodeFromJson(
      AvroCore.decodeToJson(body, avroSchema), avroSchema).toSeq === body.toSeq)

    // tz-safe assertions: epoch extraction + string casts, no local renders
    val row = Seq(body).toDF("bin")
      .select(AvroCore.avroDe(col("bin"), avroSchema).as("r"))
      .select(col("r.price"), col("r.fprice"),
        col("r.day").cast("string").as("day_s"),
        unix_millis(col("r.ts_ms")).as("ms"),
        unix_micros(col("r.ts_us")).as("us"),
        col("r.uid"),
        col("r.lt_ms").cast("string").as("lts"),
        col("r.lt_us").cast("string").as("ltus"),
        col("r.t_us"),
        col("r.opt_ts"))
      .collect().head
    assert(row.getDecimal(0) === new java.math.BigDecimal("1234.56"))
    assert(row.getDecimal(1) === new java.math.BigDecimal("-7.125"))
    assert(row.getString(2) === "2021-03-04")
    assert(row.getLong(3) === msUs)
    assert(row.getLong(4) === usUs)
    assert(row.getString(5) === "123e4567-e89b-12d3-a456-426614174000")
    assert(row.getString(6) === "2000-01-01 00:00:00.123")    // NTZ: no zone shift
    assert(row.getString(7) === "2000-01-01 00:00:00.123456") // full micros
    assert(row.getLong(8) === 37800123456L)                   // micros of day
    assert(row.isNullAt(9))

    // reverse leg: Spark-typed columns (built tz-independently from epoch
    // values) encode to raw base values the avro library reads back
    val reenc = spark.range(1).select(AvroCore.avroSer(struct(
        lit("88.25").cast(DecimalType(9, 2)).as("price"),
        lit("-1.5").cast(DecimalType(11, 3)).as("fprice"),
        to_date(lit("1999-12-31")).as("day"),
        timestamp_millis(lit(946684800123L)).as("ts_ms"),
        timestamp_micros(lit(946684800123456L)).as("ts_us"),
        lit("00000000-0000-0000-0000-000000000000").as("uid"),
        to_timestamp_ntz(lit("2001-01-01 00:00:00.5")).as("lt_ms"),
        // sub-millisecond NTZ digits must survive to_json (timestampNTZFormat)
        to_timestamp_ntz(lit("2001-01-01 00:00:00.123456")).as("lt_us"),
        lit(86399500000L).as("t_us"),
        lit(null).cast(TimestampType).as("opt_ts")), avroSchema).as("bin"))
      .collect().head.getAs[Array[Byte]]("bin")
    val back = new GenericDatumReader[GenericRecord](schema)
      .read(null, DecoderFactory.get().binaryDecoder(reenc, null))
    val priceBB = back.get("price").asInstanceOf[java.nio.ByteBuffer]
    val priceBytes = new Array[Byte](priceBB.remaining()); priceBB.get(priceBytes)
    assert(new java.math.BigInteger(priceBytes) ===
      java.math.BigInteger.valueOf(8825L))
    assert(new java.math.BigInteger(
      back.get("fprice").asInstanceOf[GenericData.Fixed].bytes()) ===
      java.math.BigInteger.valueOf(-1500L))
    assert(back.get("day") ===
      java.time.LocalDate.of(1999, 12, 31).toEpochDay.toInt)
    assert(back.get("ts_ms") === 946684800123L)
    assert(back.get("ts_us") === 946684800123456L)
    assert(back.get("uid").toString === "00000000-0000-0000-0000-000000000000")
    assert(back.get("lt_ms") === 978307200500L)    // local 2001-01-01T00:00:00.5
    assert(back.get("lt_us") === 978307200123456L) // micros intact end-to-end
    assert(back.get("t_us") === 86399500000L)      // 23:59:59.5 in micros
    assert(back.get("opt_ts") === null)
  }
}

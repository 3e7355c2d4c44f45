package graft.dsl

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicInteger

import com.sun.net.httpserver.HttpServer
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dsl.SchemaRegistry._
import graft.dsl.SchemaRegistrySerdes._
import graft.dsl.ProtobufCore.{PField, PInt64, PMessage, PString}

/** Schema-registry resolution: decode SR-framed bytes knowing ONLY the
  * schema id, with the id → schema hop through a pluggable resolver — the
  * reference's cached-SR-client semantics
  * (`SchemaAvroSerDes.cs:63-80` / `MockSchemaRegistryClient.cs:12`).
  * Wrong ids fail LOUD at the right layer: plan time for an unknown id,
  * row level for a mismatched frame.
  */
class SchemaRegistrySpec extends SparkSpec {
  import spark.implicits._

  private val userSchema =
    """{"type":"record","name":"User","fields":[
      |{"name":"id","type":"long"},{"name":"name","type":"string"}]}"""
      .stripMargin.replaceAll("\n", "")
  private val eventSchema =
    """{"type":"record","name":"Ev","fields":[
      |{"name":"what","type":"string"}]}""".stripMargin.replaceAll("\n", "")

  test("avro round trip by id through an in-memory registry") {
    val reg = new InMemoryRegistry
    val (framed, id) = srAvroSerBySubject(
      struct(col("id"), col("name")), "users-value", userSchema, reg)
    val enc = Seq((1L, "ada"), (2L, "grace")).toDF("id", "name")
      .select(framed.as("raw"))
    // re-registering the identical schema reuses the id (Confluent semantics)
    assert(reg.register("users-value", RegisteredSchema("AVRO", userSchema)) === id)
    val out = enc.select(srAvroDeById(col("raw"), id, reg).as("m"))
      .select(col("m.id"), col("m.name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq.sorted
    assert(out === Seq((1L, "ada"), (2L, "grace")))
    // null payloads are tombstones, not errors
    val withNull = enc.select(col("raw")).unionAll(
      Seq(Tuple1(null.asInstanceOf[Array[Byte]])).toDF("raw"))
    val n = withNull.select(srAvroDeById(col("raw"), id, reg).as("m"))
      .filter(col("m").isNull).count()
    assert(n === 1L)
  }

  test("globalIds mode: one id per distinct schema text across subjects; default stays per-subject") {
    // default (mock-faithful): same schema under two subjects -> two ids,
    // and the strict frame guard rejects the cross-subject decode
    val perSubject = new InMemoryRegistry
    val idA = perSubject.register("users-value", RegisteredSchema("AVRO", userSchema))
    val idB = perSubject.register("audit-value", RegisteredSchema("AVRO", userSchema))
    assert(idA !== idB, "per-subject mode must keep distinct ids (mock semantics)")

    // globalIds = true (Confluent semantics): the same schema text shares
    // ONE id across subjects, so a payload framed under subject A decodes
    // with the id returned for subject B
    val global = new InMemoryRegistry(globalIds = true)
    val (framed, gidA) = srAvroSerBySubject(
      struct(col("id"), col("name")), "users-value", userSchema, global)
    val gidB = global.register("audit-value", RegisteredSchema("AVRO", userSchema))
    assert(gidA === gidB, "one global id per distinct schema text")
    val enc = Seq((7L, "hopper")).toDF("id", "name").select(framed.as("raw"))
    val out = enc.select(srAvroDeById(col("raw"), gidB, global).as("m"))
      .select(col("m.id"), col("m.name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq((7L, "hopper")),
      "cross-subject payload must decode through the shared global id")
    // a DIFFERENT schema text still gets its own id
    val gidEv = global.register("users-value", RegisteredSchema("AVRO", eventSchema))
    assert(gidEv !== gidA)
    // version bookkeeping per subject is unchanged: re-registering the
    // identical schema under the same subject returns the same id
    assert(global.register("users-value", RegisteredSchema("AVRO", userSchema)) === gidA)
  }

  test("unknown id fails at plan time; mismatched frame fails the row loudly") {
    val reg = new InMemoryRegistry
    val idUser = reg.register("users-value", RegisteredSchema("AVRO", userSchema))
    val err = intercept[IllegalArgumentException] {
      srAvroDeById(col("raw"), idUser + 42, reg)
    }
    assert(err.getMessage.contains(s"schema id ${idUser + 42} is not registered"))
    // frame rows with a DIFFERENT id than the decoder expects
    val idEv = reg.register("events-value", RegisteredSchema("AVRO", eventSchema))
    val enc = Seq((1L, "ada")).toDF("id", "name")
      .select(Serdes.srFrame(
        AvroCore.avroSer(struct(col("id"), col("name")), userSchema),
        idEv).as("raw"))
    val rowErr = intercept[Exception] {
      enc.select(srAvroDeById(col("raw"), idUser, reg).as("m")).collect()
    }
    assert(rowErr.getMessage.contains(s"expected schema id $idUser"),
      s"row-level mismatch must name both ids: ${rowErr.getMessage}")
  }

  test("heterogeneous ids decode per row through the dynamic JSON path") {
    val reg = new InMemoryRegistry
    val idUser = reg.register("users-value", RegisteredSchema("AVRO", userSchema))
    val idEv = reg.register("events-value", RegisteredSchema("AVRO", eventSchema))
    val users = Seq((7L, "joan")).toDF("id", "name")
      .select(Serdes.srFrame(
        AvroCore.avroSer(struct(col("id"), col("name")), userSchema),
        idUser).as("raw"))
    val events = Seq(Tuple1("login")).toDF("what")
      .select(Serdes.srFrame(
        AvroCore.avroSer(struct(col("what")), eventSchema), idEv).as("raw"))
    val got = users.unionAll(events)
      .select(srAvroDeJsonById(col("raw"), new CachedResolver(reg)).as("j"))
      .collect().map(_.getString(0)).toSet
    assert(got === Set("""{"id":7,"name":"joan"}""", """{"what":"login"}"""))
    // an id nobody registered fails the task with the id in the message
    val bogus = Seq(Tuple1("x")).toDF("what")
      .select(Serdes.srFrame(
        AvroCore.avroSer(struct(col("what")), eventSchema), 999).as("raw"))
    val e = intercept[SparkException] {
      bogus.select(srAvroDeJsonById(col("raw"), reg).as("j")).collect()
    }
    assert(e.getMessage.contains("999") ||
      e.getCause.getMessage.contains("999"))
  }

  test("protobuf round trip by id; HTTP-only resolvers refuse protobuf descriptively") {
    val reg = new InMemoryRegistry
    val msg = PMessage(Seq(PField(1, "id", PInt64), PField(2, "name", PString)))
    val (framed, id) = srProtoSerBySubject(
      struct(col("id"), col("name")), "things-value", msg, reg)
    val out = Seq((5L, "bolt")).toDF("id", "name")
      .select(framed.as("raw"))
      .select(srProtoDeById(col("raw"), id, reg).as("m"))
      .select(col("m.id"), col("m.name"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(out === Seq((5L, "bolt")))
    // an AVRO registration asked to proto-decode fails with direction
    val idAvro = reg.register("users-value", RegisteredSchema("AVRO", userSchema))
    val e = intercept[IllegalArgumentException] {
      srProtoDeById(col("raw"), idAvro, reg)
    }
    assert(e.getMessage.contains("no PMessage"))
  }

  test("HTTP resolver speaks the Confluent REST shape; CachedResolver fetches once per JVM") {
    val hits = new AtomicInteger(0)
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/schemas/ids/", { exchange =>
      val id = exchange.getRequestURI.getPath.stripPrefix("/schemas/ids/").toInt
      hits.incrementAndGet()
      val (code, body) =
        if (id == 1) {
          val node = com.fasterxml.jackson.databind.node.JsonNodeFactory
            .instance.objectNode()
          node.put("schema", userSchema) // schemaType omitted = AVRO
          (200, node.toString)
        } else (404, """{"error_code":40403,"message":"Schema not found"}""")
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      exchange.getResponseHeaders.add("Content-Type",
        "application/vnd.schemaregistry.v1+json")
      exchange.sendResponseHeaders(code, bytes.length)
      exchange.getResponseBody.write(bytes)
      exchange.close()
    })
    server.start()
    try {
      val base = s"http://127.0.0.1:${server.getAddress.getPort}"
      val resolver = new CachedResolver(new HttpSchemaResolver(base))
      val enc = Seq((3L, "lin")).toDF("id", "name")
        .select(Serdes.srFrame(
          AvroCore.avroSer(struct(col("id"), col("name")), userSchema),
          1).as("raw"))
      def decodeOnce(): Seq[(Long, String)] =
        enc.select(srAvroDeById(col("raw"), 1, resolver).as("m"))
          .select(col("m.id"), col("m.name"))
          .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(decodeOnce() === Seq((3L, "lin")))
      assert(decodeOnce() === Seq((3L, "lin")))
      assert(hits.get() === 1,
        s"cache-forever-by-id: two decodes must cost one HTTP fetch, saw ${hits.get()}")
      // a 404 id surfaces as the unknown-id error, not an HTTP stack trace
      val e = intercept[IllegalArgumentException] {
        srAvroDeById(col("raw"), 2, resolver)
      }
      assert(e.getMessage.contains("schema id 2 is not registered"))
      assert(hits.get() === 2, "negative results are not cached at this layer")
    } finally server.stop(0)
  }
}

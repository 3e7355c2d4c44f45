package graft.dsl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec
import ProtobufCore._

/** The native serde expressions under TRUE microbatch execution — the
  * shape a Kafka topic pipeline runs: binary payloads arrive on a stream,
  * `protoDe`/`avroDe` decode them in-plan, a stateful aggregation keeps
  * state across microbatches, and the sink leg re-encodes with
  * `protoSer`/`avroSer` (SR-framed). CodegenFallback expressions must
  * behave identically inside `IncrementalExecution`; this pins it.
  */
class StreamingSerdeSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private var queries: List[StreamingQuery] = Nil
  private def start(df: org.apache.spark.sql.DataFrame, name: String,
      mode: String = "update"): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    queries = q :: queries
    q
  }
  override def afterAll(): Unit = {
    queries.foreach(q => if (q.isActive) q.stop())
    super.afterAll()
  }

  private val msg = PMessage(Seq(
    PField(1, "user", PString),
    PField(2, "amount", PInt64)))

  private def payload(user: String, amount: Long): Array[Byte] =
    encodeFromJson(s"""{"user":"$user","amount":$amount}""", msg)

  test("protobuf decode -> stateful agg -> SR-framed encode across microbatches") {
    val in = MemoryStream[Array[Byte]]
    val decoded = in.toDS().toDF("raw")
      .select(protoDe(col("raw"), msg).as("m"))
      .select(col("m.user").as("user"), col("m.amount").as("amount"))
    val totals = decoded.groupBy("user").agg(sum("amount").as("total"))
    val q = start(totals, "serde_totals")

    in.addData(payload("a", 10L), payload("b", 5L))
    q.processAllAvailable()
    in.addData(payload("a", 7L)) // state must carry a=10 across batches
    q.processAllAvailable()

    val got = spark.table("serde_totals").collect()
      .map(r => r.getString(0) -> r.getLong(1)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).max } // update mode: latest wins
    assert(got === Map("a" -> 17L, "b" -> 5L))

    // sink direction: re-encode the totals as protobuf, SR-framed, and
    // check the frame + body round-trip batch-side
    val out = PMessage(Seq(
      PField(1, "user", PString), PField(2, "total", PInt64)))
    val enc = MemoryStream[(String, Long)]
    val framed = enc.toDS().toDF("user", "total")
      .select(ProtobufCore.srProtoFrame(
        protoSer(struct(col("user"), col("total")), out), schemaId = 7).as("v"))
    val q2 = start(framed, "serde_framed", mode = "append")
    enc.addData(("a", 17L))
    q2.processAllAvailable()
    val bytes = spark.table("serde_framed").head().getAs[Array[Byte]](0)
    assert(bytes(0) === 0.toByte)
    val body = spark.range(1)
      .select(protoDe(ProtobufCore.srProtoStrip(lit(bytes)), out).as("m"))
      .select("m.user", "m.total").head()
    assert((body.getString(0), body.getLong(1)) === (("a", 17L)))
  }

  test("avro decode flows through a streaming window aggregation") {
    val schema = """{"type":"record","name":"E","fields":[
      {"name":"k","type":"string"},
      {"name":"ts","type":{"type":"long","logicalType":"timestamp-millis"}},
      {"name":"v","type":"int"}]}"""
    def av(k: String, tsMs: Long, v: Int): Array[Byte] =
      AvroCore.encodeFromJson(
        s"""{"k":"$k","ts":"${java.time.Instant.ofEpochMilli(tsMs)}","v":$v}""",
        schema)
    val in = MemoryStream[Array[Byte]]
    val agg = in.toDS().toDF("raw")
      .select(AvroCore.avroDe(col("raw"), schema).as("m"))
      .select(col("m.k").as("k"), col("m.ts").as("ts"), col("m.v").as("v"))
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 minute"), col("k"))
      .agg(sum("v").as("s"))
      .select(col("k"), col("window.start").as("ws"), col("s"))
    val q = start(agg, "serde_avro_win")

    in.addData(av("x", 60000L, 2), av("x", 61000L, 3), av("y", 60500L, 1))
    q.processAllAvailable()
    in.addData(av("x", 62000L, 5))
    q.processAllAvailable()

    val got = spark.table("serde_avro_win").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime, r.getLong(2)))
      .groupBy(t => (t._1, t._2)).map { case (k, vs) => k -> vs.map(_._3).max }
    assert(got === Map(("x", 60000L) -> 10L, ("y", 60000L) -> 1L))
  }
}

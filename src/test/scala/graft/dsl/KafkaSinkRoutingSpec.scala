package graft.dsl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}

import graft.SparkSpec

/** Construct-level coverage of the Kafka sink wiring (`Sinks`): the
  * connector jar is a deploy-time dependency absent here, so `.start()` is
  * out of reach — but the routing transform, the record shape the sink
  * contract requires (binary key/value + string topic), and the writer
  * construction are all engine-side and verifiable.
  *
  * Mirrors the reference's `ITopicNameExtractor` dynamic routing
  * (`core/Stream/IKStream.cs:90-137`, `core/Processors/SinkProcessor.cs`).
  */
class KafkaSinkRoutingSpec extends SparkSpec {
  import spark.implicits._

  private def records = Seq(
    ("a", "click", 1L), ("b", "view", 2L), ("c", "click", 3L))
    .toDF("k", "event_type", "v")
    .select(Serdes.stringSer(col("k")).as("key"),
      Serdes.stringSer(col("v").cast("string")).as("value"),
      col("event_type"))

  test("routeTopic stamps a per-row topic column from the extractor") {
    val routed = Sinks.routeTopic(records,
      when(col("event_type") === "click", "clicks-topic").otherwise("other-topic"))
    assert(routed.schema("topic").dataType == StringType)
    val byKey = routed
      .select(Serdes.stringDe(col("key")).as("k"), col("topic"))
      .as[(String, String)].collect().toMap
    assert(byKey == Map("a" -> "clicks-topic", "b" -> "other-topic", "c" -> "clicks-topic"))
  }

  test("routed frame carries the Kafka sink record contract") {
    val routed = Sinks.routeTopic(records, lit("t"))
    assert(routed.schema("key").dataType == BinaryType)
    assert(routed.schema("value").dataType == BinaryType)
    assert(routed.schema("topic").dataType == StringType)
  }

  test("header-routed KVMeta stream: topic chosen by a record header") {
    // the IRecordContext use case the typed DSL now supports: route on a
    // header value carried through KVMeta
    val rows = Seq(
      KVMeta("k1", 10L, ts(1000), RecordMeta("src", 0, 0L,
        Map("dest" -> "hot".getBytes("UTF-8")))),
      KVMeta("k2", 20L, ts(2000), RecordMeta("src", 0, 1L,
        Map("dest" -> "cold".getBytes("UTF-8")))),
      KVMeta("k3", 30L, ts(3000), RecordMeta("src", 1, 0L, Map.empty)))
      .toDS()
    val routed = Sinks.routeTopic(
      rows.select(Serdes.stringSer(col("key")).as("key"),
        Serdes.stringSer(col("value").cast("string")).as("value"),
        col("meta")),
      coalesce(Serdes.stringDe(col("meta.headers")("dest")), lit("default")))
    val byKey = routed
      .select(Serdes.stringDe(col("key")).as("k"), col("topic"))
      .as[(String, String)].collect().toMap
    assert(byKey == Map("k1" -> "hot", "k2" -> "cold", "k3" -> "default"))
  }

  test("toKafkaDynamic/toKafka construct writers over a streaming frame") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val df = in.toDF()
      .select(Serdes.stringSer(col("_1")).as("key"),
        Serdes.stringSer(col("_2")).as("value"))
    // construction must not touch the connector; only start() would
    val w1 = Sinks.toKafka(df, "broker:9092", "static-topic", "/tmp/ckpt")
    val w2 = Sinks.toKafkaDynamic(df, "broker:9092",
      concat(lit("t-"), Serdes.stringDe(col("key"))), "/tmp/ckpt")
    assert(w1 != null && w2 != null)
  }
}

package graft.dsl

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Record metadata in the typed DSL (`IRecordContext` mapping): topic,
  * partition, offset, and headers survive ingestion into [[KVMeta]], and a
  * header can drive dynamic topic routing (`ITopicNameExtractor`).
  */
class RecordMetaSpec extends SparkSpec {
  import spark.implicits._

  // Kafka-source-shaped rows: (key, value, topic, partition, offset,
  // timestamp, headers as array<struct<key,value:binary>>)
  private def kafkaShaped = Seq(
    ("k1", "v1", "orders", 0, 7L, new java.sql.Timestamp(1000L),
      Seq(("route", "eu".getBytes("UTF-8")), ("trace", "t1".getBytes("UTF-8")))),
    ("k2", "v2", "orders", 1, 9L, new java.sql.Timestamp(2000L),
      Seq(("route", "us".getBytes("UTF-8")))),
    ("k3", "v3", "orders", 1, 10L, new java.sql.Timestamp(3000L),
      null: Seq[(String, Array[Byte])]) // record with no headers
  ).toDF("key", "value", "topic", "partition", "offset", "timestamp", "headers")

  test("streamWithMeta carries topic/partition/offset/headers into KVMeta") {
    val b = new StreamsBuilder(spark)
    val ds = b.streamWithMeta[String, String](kafkaShaped, col("key"), col("value"))
    val rows = ds.collect().sortBy(_.key)

    assert(rows.map(_.toKV.value).toSeq === Seq("v1", "v2", "v3"))
    val m1 = rows(0).meta
    assert(m1.topic === "orders" && m1.partition === 0 && m1.offset === 7L)
    assert(m1.headerString("route") === Some("eu"))
    assert(m1.headerString("trace") === Some("t1"))
    assert(rows(2).meta.headers.isEmpty) // null headers -> empty map
    assert(rows(1).ts.getTime === 2000L)
  }

  test("header-driven dynamic topic routing (ITopicNameExtractor analog)") {
    val b = new StreamsBuilder(spark)
    val ds = b.streamWithMeta[String, String](kafkaShaped, col("key"), col("value"))
    // the same expression Sinks.toKafkaDynamic would take as topicExtractor:
    // route records by the "route" header, defaulting unrouted ones
    val routed = ds.toDF()
      .withColumn("topic", coalesce(
        col("meta.headers").getItem("route").cast("string"), lit("default")))
      .select(col("key"), col("topic")).as[(String, String)].collect().toMap
    assert(routed === Map("k1" -> "eu", "k2" -> "us", "k3" -> "default"))
  }

  test("changeTimestamp mirrors IRecordContext.ChangeTimestamp") {
    val kv = KVMeta("k", "v", new java.sql.Timestamp(1L),
      RecordMeta("t", 0, 0L, Map.empty))
    assert(kv.changeTimestamp(new java.sql.Timestamp(5L)).ts.getTime === 5L)
  }
}

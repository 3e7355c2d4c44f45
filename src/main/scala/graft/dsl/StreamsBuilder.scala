package graft.dsl

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StatefulOps

/** Topology entry point, the reference's `StreamBuilder`
  * (`core/StreamBuilder.cs:49-730`). Instead of building a processor DAG, each
  * method hands back a wrapper over a Spark `Dataset` — the "topology" IS the
  * Catalyst logical plan, and `start()`/actions trigger
  * analysis+optimization (SURVEY §3.1).
  */
final class StreamsBuilder(val spark: SparkSession) extends Serializable {

  /** `StreamBuilder.Stream(topic)` over Kafka (`core/StreamBuilder.cs:49`):
    * binary key/value + metadata, exactly the reference's record shape
    * (SURVEY §1.2). Deserialize with [[Serdes]] column transforms.
    * Requires the spark-sql-kafka connector on the cluster classpath; the
    * in-JVM fabric ([[graft.fabric.MemBroker]]) drives the identical plan
    * with `format = "graft-kafka-mem"` and the broker id as
    * `bootstrapServers` — how the E2E round trip runs in broker-less
    * environments.
    */
  def kafkaStream(topic: String, bootstrapServers: String,
      startingOffsets: String = "latest",
      format: String = "kafka"): DataFrame =
    spark.readStream
      .format(format)
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("subscribe", topic)
      .option("startingOffsets", startingOffsets)
      .option("includeHeaders", "true")
      .load()

  /** Typed metadata-carrying stream from a Kafka-shaped DataFrame (columns
    * `topic, partition, offset, timestamp, headers` as the Kafka source
    * emits them, plus whatever `key`/`value` decode to): topic / partition /
    * offset / headers survive into [[KVMeta]], the `IRecordContext` analog —
    * so header routing and offset-aware logic stay typed instead of dropping
    * to the raw DataFrame.
    */
  def streamWithMeta[K, V](df: DataFrame, key: Column, value: Column)(
      implicit e: Encoder[KVMeta[K, V]]): Dataset[KVMeta[K, V]] =
    df.select(
      key.as("key"), value.as("value"), col("timestamp").as("ts"),
      struct(
        col("topic"), col("partition"), col("offset"),
        coalesce(map_from_entries(col("headers")),
          expr("CAST(map() AS map<string,binary>)")).as("headers")
      ).as("meta")).as[KVMeta[K, V]]

  /** Typed stream from any Dataset (the `TopologyTestDriver` analog uses
    * `MemoryStream`; the batch façade uses parquet).
    */
  def stream[K, V](ds: Dataset[KV[K, V]]): KStream[K, V] = new KStream(ds)

  /** Stream from a DataFrame with (key, value, ts) columns. */
  def stream[K, V](df: DataFrame, key: Column, value: Column, ts: Column)(
      implicit e: Encoder[KV[K, V]]): KStream[K, V] =
    new KStream(df.select(key.as("key"), value.as("value"), ts.as("ts")).as[KV[K, V]])

  /** `StreamBuilder.Table` (`core/StreamBuilder.cs:249`): upsert-by-key
    * materialization of a stream.
    */
  def table[K, V](ds: Dataset[KV[K, V]])(
      implicit eu: Encoder[Upsert[K, V]], ekv: Encoder[KV[K, V]],
      ek: Encoder[K]): KTable[K, V] =
    new KTable(StatefulOps.latestPerKey(ds), uniqueKeys = !ds.isStreaming)

  /** Table directly from a changelog (tombstones as `None`). */
  def tableFromChangelog[K, V](ds: Dataset[Upsert[K, V]]): KTable[K, V] =
    new KTable(ds)

  /** `StreamBuilder.GlobalTable` (`core/StreamBuilder.cs:524`): broadcast
    * dimension.
    */
  def globalTable[K, V](ds: Dataset[(K, V)]): GlobalKTable[K, V] =
    new GlobalKTable(ds)

  def globalTable[K, V](df: DataFrame, key: Column, value: Column)(
      implicit e: Encoder[(K, V)]): GlobalKTable[K, V] =
    new GlobalKTable(df.select(key.as("_1"), value.as("_2")).as[(K, V)])

  /** `StreamBuilder.GlobalTable` with CONTINUOUS refresh
    * (`GlobalStreamThread.cs:13-220`): the loader re-runs per microbatch of
    * any [[KStream.joinGlobalRefreshing]], so dimension updates published
    * while the topology runs become visible to later batches. See
    * [[RefreshingGlobalKTable]].
    */
  def globalTableRefreshing[K, V](load: () => Dataset[(K, V)])
      : RefreshingGlobalKTable[K, V] =
    new RefreshingGlobalKTable(load)
}

/** Serde layer (SURVEY §1.3): the reference's `ISerDes<T>` pairs become
  * column transforms between Kafka `binary` and typed columns — once decoded,
  * Catalyst sees full structure (a capability superset of the reference's
  * opaque bytes).
  */
object Serdes {
  /** `StringSerDes` */
  def stringDe(c: Column): Column = c.cast("string")
  def stringSer(c: Column): Column = c.cast("binary")

  /** `Int64SerDes` / `Int32SerDes` / `DoubleSerDes` — numeric via string
    * transport (the portable default; big-endian binary layouts are cluster
    * concerns).
    */
  def longDe(c: Column): Column = c.cast("string").cast("long")
  def intDe(c: Column): Column = c.cast("string").cast("int")
  def doubleDe(c: Column): Column = c.cast("string").cast("double")

  /** JSON value serde: schema-full decode (`from_json`) — the analog of the
    * schema-registry serdes for JSON payloads.
    */
  def jsonDe(c: Column, schema: org.apache.spark.sql.types.StructType): Column =
    from_json(c.cast("string"), schema)
  def jsonSer(c: Column): Column = to_json(c).cast("binary")

  /** Avro value serde, the reference's `SchemaAvroSerDes<T>`
    * (`serdes/Streamiz.Kafka.Net.SchemaRegistry.SerDes.Avro/
    * SchemaAvroSerDes.cs:15`): binary Avro ⇄ struct columns against a JSON
    * Avro schema. Evaluation needs the spark-avro module on the cluster
    * classpath — a deploy-time dependency like the Kafka connector (absent in
    * this container), so these columns are construct-checked here and
    * evaluate on a cluster. [[AvroCore]] implements the same wire bytes on
    * the core Avro library (which Spark itself ships), so the full round
    * trip — including the SR frame — IS executed and tested in-container.
    * Schema-registry wire format (magic byte + schema id) is a sink/source
    * option there.
    */
  def avroDe(c: Column, jsonFormatSchema: String): Column =
    org.apache.spark.sql.avro.functions.from_avro(c, jsonFormatSchema)
  def avroSer(c: Column): Column =
    org.apache.spark.sql.avro.functions.to_avro(c)

  /** Protobuf value serde, the reference's `SchemaProtobufSerDes<T>`
    * (`serdes/Streamiz.Kafka.Net.SchemaRegistry.SerDes.Protobuf/
    * SchemaProtobufSerDes.cs`): binary protobuf ⇄ struct columns against a
    * compiled descriptor file. Like Avro, the expression impl (spark-protobuf
    * module) is a deploy-time dependency — construct-checked here, evaluates
    * on a cluster. [[ProtobufCore]] implements the same wire bytes with no
    * protobuf dependency at all (the encoding spec is public), so the full
    * round trip — including the Confluent SR protobuf frame with its
    * message-index list — IS executed and tested in-container.
    */
  def protobufDe(c: Column, messageName: String, descFilePath: String): Column =
    org.apache.spark.sql.protobuf.functions.from_protobuf(c, messageName, descFilePath)
  def protobufSer(c: Column, messageName: String, descFilePath: String): Column =
    org.apache.spark.sql.protobuf.functions.to_protobuf(c, messageName, descFilePath)

  // ---- Confluent schema-registry wire format ----------------------------
  // The reference's SR serdes frame every payload as
  // [magic 0x00][4-byte big-endian schema id][body]
  // (SchemaAvroSerDes / SchemaProtobufSerDes strip and add this header).
  // Pure byte-slicing column transforms — engine-independent and testable
  // without any connector jar.

  /** Body of an SR-framed binary column (drops the 5-byte header). */
  def srStrip(c: Column): Column = c.substr(lit(6), octet_length(c) - 5)

  /** Big-endian schema id from an SR-framed binary column. */
  def srSchemaId(c: Column): Column =
    conv(hex(c.substr(lit(2), lit(4))), 16, 10).cast("int")

  /** True when the magic byte is 0x00 (a valid SR frame). */
  def srIsFramed(c: Column): Column =
    octet_length(c) >= 5 && c.substr(lit(1), lit(1)) === lit(Array[Byte](0))

  /** Frame a binary payload with the SR header for `schemaId`. */
  def srFrame(c: Column, schemaId: Int): Column = {
    val header = Array[Byte](0,
      ((schemaId >> 24) & 0xff).toByte, ((schemaId >> 16) & 0xff).toByte,
      ((schemaId >> 8) & 0xff).toByte, (schemaId & 0xff).toByte)
    concat(lit(header), c)
  }

  // ---- TimeWindowedSerDes ------------------------------------------------
  // The reference frames a windowed key on the topic as
  // [serialized key][8-byte big-endian window startMs]
  // (`core/SerDes/TimeWindowedSerDes.cs:36-62`,
  // `core/State/Helper/WindowKeyHelper.cs:30-46`), and in the store as
  // [serialized key][8-byte BE startMs][4-byte BE seqnum]
  // (`WindowKeyHelper.cs:80-117`). Same byte-slicing column style as the SR
  // frame; window starts are epoch ms (non-negative), matching stream time.

  /** Topic-format windowed key: key bytes ++ 8-byte BE window start. */
  def windowedSer(keyBytes: Column, startMs: Column): Column =
    concat(keyBytes, unhex(lpad(hex(startMs), 16, "0")))

  /** Key bytes of a topic-format windowed key. */
  def windowedKeyBytes(c: Column): Column =
    c.substr(lit(1), octet_length(c) - 8)

  /** Window start (epoch ms) of a topic-format windowed key. */
  def windowedStartMs(c: Column): Column =
    conv(hex(c.substr(octet_length(c) - 7, lit(8))), 16, 10).cast("long")

  /** Store-format windowed key: topic format ++ 4-byte BE seqnum. */
  def windowedStoreSer(keyBytes: Column, startMs: Column, seqnum: Int = 0): Column = {
    val seq = Array[Byte](((seqnum >> 24) & 0xff).toByte,
      ((seqnum >> 16) & 0xff).toByte, ((seqnum >> 8) & 0xff).toByte,
      (seqnum & 0xff).toByte)
    concat(windowedSer(keyBytes, startMs), lit(seq))
  }

  /** Key bytes of a store-format windowed key. */
  def windowedStoreKeyBytes(c: Column): Column =
    c.substr(lit(1), octet_length(c) - 12)

  /** Window start (epoch ms) of a store-format windowed key. */
  def windowedStoreStartMs(c: Column): Column =
    conv(hex(c.substr(octet_length(c) - 11, lit(8))), 16, 10).cast("long")

  /** Sequence number of a store-format windowed key. */
  def windowedStoreSeq(c: Column): Column =
    conv(hex(c.substr(octet_length(c) - 3, lit(4))), 16, 10).cast("int")
}

/** Sink wiring (`To`, `core/Stream/IKStream.cs:90-137`; `SinkProcessor.cs`).
  * The Kafka sink honors a per-row `topic` column, which is how the
  * reference's `ITopicNameExtractor` dynamic routing maps to Spark.
  */
object Sinks {

  /** Static-topic Kafka sink. `format = "graft-kafka-mem"` runs the same
    * sink plan against the in-JVM fabric (see [[graft.fabric.MemBroker]]),
    * where it is additionally EXACTLY-ONCE via the epoch commit ledger.
    */
  def toKafka(df: DataFrame, bootstrapServers: String, topic: String,
      checkpoint: String,
      format: String = "kafka"): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    df.writeStream
      .format(format)
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("topic", topic)
      .option("checkpointLocation", checkpoint)

  /** Per-record topic routing (`ITopicNameExtractor`): stamps the `topic`
    * column the Kafka sink dispatches on. Split out from [[toKafkaDynamic]]
    * so the routing plan is testable without the connector jar.
    */
  def routeTopic(df: DataFrame, topicExtractor: Column): DataFrame =
    df.withColumn("topic", topicExtractor)

  /** Dynamic routing: compute a `topic` column per record
    * (`ITopicNameExtractor`); the Kafka sink reads it per row.
    */
  def toKafkaDynamic(df: DataFrame, bootstrapServers: String,
      topicExtractor: Column, checkpoint: String,
      format: String = "kafka"): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    routeTopic(df, topicExtractor)
      .writeStream
      .format(format)
      .option("kafka.bootstrap.servers", bootstrapServers)
      .option("checkpointLocation", checkpoint)

  /** In-memory UPDATE LOG sink: each trigger appends that batch's updates,
    * so `SELECT * FROM <storeName>` returns the multi-version history. For
    * the latest-per-key interactive-query STORE view, use
    * [[graft.iq.StoreRegistry]] (materialize + all/get/range collapse the
    * log).
    */
  def toMemoryStore(df: DataFrame, storeName: String,
      outputMode: String = "update"): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .format("memory")
      .queryName(storeName)
      .outputMode(outputMode)
      .start()
}

/** Emission cadence — the output-mode choice made explicit as API.
  *
  * The reference emits every update immediately and lacks `suppress()`
  * (SURVEY §2.7 "Emission policy"); Kafka Streams' `suppress(untilWindowCloses)`
  * is its roadmap answer. In Spark the same dial is the sink's output mode,
  * applied to the whole query:
  *  - [[perUpdate]]: update mode — every state change emits (the reference's
  *    cadence; intermediate results visible).
  *  - [[finalResults]]: append mode + watermark — a windowed result emits
  *    exactly once, after the watermark passes its window end
  *    (`suppress(untilWindowCloses)` as a superset; verified in
  *    `StreamingJoinSpec` "emits a window once, after close").
  */
object Emission {
  def perUpdate[T](w: org.apache.spark.sql.streaming.DataStreamWriter[T]):
      org.apache.spark.sql.streaming.DataStreamWriter[T] = w.outputMode("update")

  def finalResults[T](w: org.apache.spark.sql.streaming.DataStreamWriter[T]):
      org.apache.spark.sql.streaming.DataStreamWriter[T] = w.outputMode("append")
}

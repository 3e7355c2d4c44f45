package graft.fabric

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec
import graft.dsl.{Sinks, StreamsBuilder}

/** The E2E Kafka semantics this container could never execute against a
  * real broker (`KafkaIntegrationSpec` stays env-gated for deployments),
  * now EXECUTED through the in-JVM fabric: the same `kafkaStream` /
  * `toKafka` / `toKafkaDynamic` entry points, the same options and column
  * contract, real micro-batches with real checkpoints — only the format
  * token differs. Mirrors the gated suite's two scenarios and adds the
  * exactly-once injected-retry scenario the reference covers with Kafka
  * transactions (`StreamTask.cs:93-110`, `RecordCollector.cs:85-171`).
  */
class MemKafkaFabricSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private val Fmt = "graft-kafka-mem"
  private var queries: List[StreamingQuery] = Nil
  override def afterAll(): Unit = {
    queries.foreach(q => if (q.isActive) q.stop())
    super.afterAll()
  }
  private def track(q: StreamingQuery): StreamingQuery = {
    queries = q :: queries; q
  }

  test("round-trip: toKafka start() writes, kafkaStream reads back (incl. headers/meta)") {
    val brokerId = "fabric_rt"
    MemBroker.start(brokerId).createTopic("events", partitions = 3)
    val ckpt = tempDir("graft_fab_rt") + "/ckpt"

    val in = MemoryStream[(String, String)]
    in.addData(("k1", "v1"), ("k2", "v2"), ("k1", "v3"))
    val wq = track(Sinks.toKafka(
      in.toDF().selectExpr("CAST(_1 AS BINARY) AS key", "CAST(_2 AS BINARY) AS value"),
      brokerId, "events", ckpt, format = Fmt).start())
    wq.processAllAvailable(); wq.stop()

    // batch source leg: the connector's read-back pattern, bounded
    val back = spark.read.format(Fmt)
      .option("kafka.bootstrap.servers", brokerId)
      .option("subscribe", "events")
      .load()
      .selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)")
      .as[(String, String)].collect().sorted
    assert(back.toSeq === Seq(("k1", "v1"), ("k1", "v3"), ("k2", "v2")))

    // same-key records land on the same partition (murmur2 placement),
    // with dense offsets — the consumer-side ordering contract
    val k1 = spark.read.format(Fmt)
      .option("kafka.bootstrap.servers", brokerId)
      .option("subscribe", "events").load()
      .filter(col("key").cast("string") === "k1")
      .select("partition", "offset", "value")
      .collect().map(r => (r.getInt(0), r.getLong(1), new String(r.getAs[Array[Byte]](2))))
    assert(k1.map(_._1).distinct.length === 1, s"k1 split across partitions: ${k1.toSeq}")
    assert(k1.sortBy(_._2).map(_._3).toSeq === Seq("v1", "v3"),
      "offset order must preserve produce order per key")

    // streaming source leg through the DSL entry point: full record contract
    val streamDf = new StreamsBuilder(spark)
      .kafkaStream("events", brokerId, startingOffsets = "earliest", format = Fmt)
    assert(streamDf.isStreaming)
    assert(Seq("key", "value", "topic", "partition", "offset", "timestamp", "headers")
      .forall(streamDf.columns.contains))
    val sq = track(streamDf
      .selectExpr("CAST(key AS STRING) AS k", "CAST(value AS STRING) AS v", "topic")
      .writeStream.format("memory").queryName("fab_rt_stream").outputMode("append")
      .start())
    sq.processAllAvailable()
    val streamed = spark.table("fab_rt_stream")
      .select("k", "v", "topic").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sorted
    assert(streamed.toSeq ===
      Seq(("k1", "v1", "events"), ("k1", "v3", "events"), ("k2", "v2", "events")))
    sq.stop()
  }

  test("dynamic routing: per-row topic column dispatches to two topics") {
    val brokerId = "fabric_dyn"
    MemBroker.start(brokerId)
    val ckpt = tempDir("graft_fab_dyn") + "/ckpt"
    val in = MemoryStream[(String, String)]
    in.addData(("a", "odd"), ("b", "even"))
    val routed = in.toDF().selectExpr(
      "CAST(_1 AS BINARY) AS key", "CAST(_2 AS BINARY) AS value", "_2 AS kind")
    val wq = track(Sinks.toKafkaDynamic(routed, brokerId,
      concat(lit("dyn_"), col("kind")), ckpt, format = Fmt).start())
    wq.processAllAvailable(); wq.stop()

    def readTopic(t: String): Seq[String] = spark.read.format(Fmt)
      .option("kafka.bootstrap.servers", brokerId)
      .option("subscribe", t)
      .load().selectExpr("CAST(value AS STRING)").as[String].collect().toSeq
    assert(readTopic("dyn_odd") === Seq("odd"))
    assert(readTopic("dyn_even") === Seq("even"))
  }

  test("headers round the trip: producer headers surface as the source's map-able column") {
    val brokerId = "fabric_hdr"
    val b = MemBroker.start(brokerId)
    b.produce("hdr_topic", None, MemBroker.Record(
      "k".getBytes, "v".getBytes, 1234L,
      Seq("h1" -> Array[Byte](1, 2), "h2" -> "x".getBytes)))
    val row = spark.read.format(Fmt)
      .option("kafka.bootstrap.servers", brokerId)
      .option("subscribe", "hdr_topic")
      .option("includeHeaders", "true")
      .load()
      .select(col("headers"), col("timestamp").cast("long").as("ts_s"))
      .collect().head
    val hs = row.getSeq[org.apache.spark.sql.Row](0)
      .map(h => h.getString(0) -> h.getAs[Array[Byte]](1).toSeq)
    assert(hs === Seq("h1" -> Seq[Byte](1, 2), "h2" -> "x".getBytes.toSeq))
    assert(row.getLong(1) === 1L, "ms timestamps must surface as seconds-truncating casts do")
  }

  test("exactly-once: a replayed epoch after a lost commit ack appends nothing") {
    val brokerId = "fabric_eos"
    val broker = MemBroker.start(brokerId)
    broker.createTopic("eos_out")
    val ckpt = tempDir("graft_fab_eos") + "/ckpt"

    val in = MemoryStream[(String, String)]
    def writer() = Sinks.toKafka(
      in.toDF().selectExpr("CAST(_1 AS BINARY) AS key", "CAST(_2 AS BINARY) AS value"),
      brokerId, "eos_out", ckpt, format = Fmt)

    in.addData(("k", "before"))
    val q1 = track(writer().start())
    q1.processAllAvailable(); // epoch 0 committed cleanly

    // inject: next epoch's records LAND on the broker but the commit ack is
    // lost (the throw) — the at-least-once failure mode
    in.addData(("k", "during"))
    broker.failNextCommit.set(true)
    val failed = intercept[Exception] { q1.processAllAvailable() }
    assert(failed.getMessage.contains("injected commit failure") ||
      Option(failed.getCause).exists(_.getMessage.contains("injected commit failure")))
    assert(!q1.isActive, "the query must die on the lost ack")

    // restart from the SAME checkpoint: Spark replays the uncommitted epoch;
    // the (queryId, epochId) ledger must swallow the duplicate
    val q2 = track(writer().start())
    q2.processAllAvailable()
    in.addData(("k", "after"))
    q2.processAllAvailable(); q2.stop()

    val values = spark.read.format(Fmt)
      .option("kafka.bootstrap.servers", brokerId)
      .option("subscribe", "eos_out")
      .load().selectExpr("CAST(value AS STRING)").as[String]
      .collect().sorted
    assert(values.toSeq === Seq("after", "before", "during"),
      s"exactly one copy of each record must survive the replay: ${values.toSeq}")
  }

  test("full topology: kafka source -> windowed count -> windowed-serde kafka sink") {
    // the reference's flagship pipeline shape, EXECUTED end-to-end: consume
    // a topic, window-count per key, publish the changelog to a topic with
    // the TimeWindowedSerDes key layout — source serdes, event-time
    // windows, and the windowed wire format all through real micro-batches
    import graft.dsl.{KV, Serdes, TumblingWindow}
    val brokerId = "fabric_topo"
    val b = MemBroker.start(brokerId)
    b.createTopic("clicks"); b.createTopic("clicks_counts")
    def click(k: String, ts: Long) =
      MemBroker.Record(k.getBytes, "click".getBytes, ts, Nil)
    b.produce("clicks", None, click("u1", 10000L))
    b.produce("clicks", None, click("u1", 20000L))
    b.produce("clicks", None, click("u2", 70000L))

    val sb = new StreamsBuilder(spark)
    val src = sb.kafkaStream("clicks", brokerId,
      startingOffsets = "earliest", format = Fmt)
    val stream = sb.stream[String, String](src,
      Serdes.stringDe(col("key")), Serdes.stringDe(col("value")),
      col("timestamp"))
    val counts = stream.groupByKey
      .windowedBy(TumblingWindow.of(60000L))
      .count
    val framed = counts.toStream.toDF // (key: Windowed[String], value, ts)
      .select(
        Serdes.windowedSer(col("key.key").cast("binary"),
          unix_millis(col("key.start"))).as("key"),
        col("value").cast("string").cast("binary").as("value"))
    val ckpt = tempDir("graft_fab_topo") + "/ckpt"
    val wq = track(Sinks.toKafka(framed, brokerId, "clicks_counts", ckpt,
      format = Fmt).outputMode("update").start())
    wq.processAllAvailable(); wq.stop()

    // consumer side: decode the windowed key layout, keep the latest
    // update per (user, window start) — changelog-topic semantics
    val rows = spark.read.format(Fmt)
      .option("kafka.bootstrap.servers", brokerId)
      .option("subscribe", "clicks_counts").load()
      .select(
        Serdes.stringDe(Serdes.windowedKeyBytes(col("key"))).as("user"),
        Serdes.windowedStartMs(col("key")).as("start"),
        Serdes.stringDe(col("value")).cast("long").as("cnt"),
        col("offset"))
      .collect()
    val latest = rows.groupBy(r => (r.getString(0), r.getLong(1)))
      .map { case (k, rs) => k -> rs.maxBy(_.getLong(3)).getLong(2) }
    assert(latest === Map(("u1", 0L) -> 2L, ("u2", 60000L) -> 1L),
      s"windowed counts must round the full topology: $latest")
  }

  test("sink contract: topic OPTION overrides the column; string key/value accepted") {
    // the real kafka sink's documented precedence — a kafka→kafka
    // passthrough with a topic option must NOT route rows back to their
    // source topics (the fabric originally had this backwards)
    val brokerId = "fabric_prec"
    MemBroker.start(brokerId)
    val ckpt = tempDir("graft_fab_prec") + "/ckpt"
    val in = MemoryStream[(String, String)]
    in.addData(("k1", "v1"))
    val df = in.toDF().selectExpr(
      "_1 AS key", "_2 AS value", "'wrong_topic' AS topic") // strings, not binary
    val wq = track(Sinks.toKafka(df, brokerId, "right_topic", ckpt, format = Fmt).start())
    wq.processAllAvailable(); wq.stop()
    def count(t: String): Long = spark.read.format(Fmt)
      .option("kafka.bootstrap.servers", brokerId)
      .option("subscribe", t).load().count()
    assert(count("right_topic") === 1L && count("wrong_topic") === 0L)
    val got = spark.read.format(Fmt)
      .option("kafka.bootstrap.servers", brokerId)
      .option("subscribe", "right_topic").load()
      .selectExpr("CAST(key AS STRING)", "CAST(value AS STRING)")
      .as[(String, String)].collect().toSeq
    assert(got === Seq(("k1", "v1")), "string key/value must cast to UTF-8 bytes")
  }

  test("guards: partition-layout mismatch and bad startingOffsets fail loud") {
    val b = MemBroker.start("fabric_guards")
    b.createTopic("t3", partitions = 3)
    b.createTopic("t3", partitions = 3) // idempotent on a matching layout
    val e = intercept[IllegalArgumentException] { b.createTopic("t3", partitions = 2) }
    assert(e.getMessage.contains("cannot change the layout"))
    val q = new StreamsBuilder(spark)
      .kafkaStream("t3", "fabric_guards", startingOffsets = """{"t3":{"0":0}}""",
        format = Fmt)
      .writeStream.format("memory").queryName("fab_guard_q").outputMode("append")
      .start()
    try {
      val err = intercept[Exception] { q.processAllAvailable() }
      assert(err.getMessage.contains("earliest|latest"),
        s"offset-JSON must fail loud, not silently read latest: ${err.getMessage}")
    } finally q.stop()
  }

  test("murmur2 matches Kafka's published test vectors (real-producer placement parity)") {
    // the vectors from Apache Kafka's UtilsTest#testMurmur2 — the hash the
    // real connector's default partitioner (RecordCollector.cs:85-171 →
    // Kafka DefaultPartitioner) applies to key bytes. Locking these locks
    // the fabric's placement to what a real broker would have done.
    val vectors = Seq(
      "21" -> -973932308,
      "foobar" -> -790332482,
      "a-little-bit-long-string" -> -985981536,
      "a-little-bit-longer-string" -> -1486304829,
      "lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8" -> -58897971)
    for ((s, expected) <- vectors)
      assert(MemBroker.murmur2(s.getBytes("UTF-8")) === expected,
        s"murmur2('$s') diverged from Kafka's published value")
    assert(MemBroker.murmur2(Array.emptyByteArray) === 275646681,
      "murmur2 of the empty key must match Kafka's seed-only path")
  }

  test("N-partition topic: N input partitions per microbatch, murmur2 key placement") {
    val brokerId = "fabric_parallel"
    val nParts = 4
    val b = MemBroker.start(brokerId)
    b.createTopic("wide", partitions = nParts)
    val ckpt = tempDir("graft_fab_wide") + "/ckpt"

    // produce through the SINK with no partition column: placement must be
    // the producer default — murmur2(key) & 0x7fffffff mod N
    val keys = (0 until 40).map(i => s"key$i")
    val in = MemoryStream[(String, String)]
    in.addData(keys.map(k => (k, s"v_$k")): _*)
    val wq = track(Sinks.toKafka(
      in.toDF().selectExpr("CAST(_1 AS BINARY) AS key", "CAST(_2 AS BINARY) AS value"),
      brokerId, "wide", ckpt, format = Fmt).start())
    wq.processAllAvailable(); wq.stop()

    // batch leg: one Spark input partition per topic partition — the
    // source parallelism contract a 1000-executor cluster relies on
    val batchDf = spark.read.format(Fmt)
      .option("kafka.bootstrap.servers", brokerId)
      .option("subscribe", "wide").load()
    assert(batchDf.rdd.getNumPartitions === nParts,
      s"expected $nParts input partitions, got ${batchDf.rdd.getNumPartitions}")
    val placed = batchDf
      .select(col("key").cast("string"), col("partition"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(placed.keySet === keys.toSet)
    for (k <- keys) {
      val expected = (MemBroker.murmur2(k.getBytes("UTF-8")) & 0x7fffffff) % nParts
      assert(placed(k) === expected,
        s"key '$k' landed on ${placed(k)}, real producer would pick $expected")
    }
    // sanity: the keys actually spread (a degenerate all-on-one layout
    // would make the parallelism assertion vacuous)
    assert(placed.values.toSet.size >= 3, s"keys did not spread: $placed")

    // streaming leg: EVERY microbatch plans one input partition per topic
    // partition (offset ranges are per-partition, like the real connector)
    val widths = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val sq = track(new StreamsBuilder(spark)
      .kafkaStream("wide", brokerId, startingOffsets = "earliest", format = Fmt)
      .writeStream.outputMode("append")
      .option("checkpointLocation", tempDir("graft_fab_wide2") + "/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        widths.add(df.rdd.getNumPartitions): Unit
      }
      .start())
    sq.processAllAvailable()
    // a second batch over newly-produced records keeps the same width
    (0 until 8).foreach(i => b.produce("wide", None,
      MemBroker.Record(s"late$i".getBytes, s"lv$i".getBytes,
        System.currentTimeMillis(), Nil)))
    sq.processAllAvailable(); sq.stop()
    import scala.jdk.CollectionConverters._
    val nonEmpty = widths.asScala.toList
    assert(nonEmpty.nonEmpty && nonEmpty.forall(_ === nParts),
      s"every microbatch must carry $nParts input partitions, got $nonEmpty")
  }

  test("minPartitions splits hot offset ranges: 2-partition topic, >= 4 input partitions, no loss") {
    val brokerId = "fabric_minparts"
    val b = MemBroker.start(brokerId)
    b.createTopic("hot", partitions = 2)
    // skewed load: partition 0 carries 30 records, partition 1 carries 2 —
    // the proportional split must fan the hot partition out
    (0 until 30).foreach(i => b.produce("hot", Some(0),
      MemBroker.Record(null, s"p0_$i".getBytes, System.currentTimeMillis(), Nil)))
    (0 until 2).foreach(i => b.produce("hot", Some(1),
      MemBroker.Record(null, s"p1_$i".getBytes, System.currentTimeMillis(), Nil)))

    // batch leg: >= 4 input partitions, every record read exactly once
    val batchDf = spark.read.format(Fmt)
      .option("kafka.bootstrap.servers", brokerId)
      .option("subscribe", "hot")
      .option("minPartitions", "4").load()
    assert(batchDf.rdd.getNumPartitions >= 4,
      s"minPartitions=4 must split the 2 ranges, got ${batchDf.rdd.getNumPartitions}")
    val vals = batchDf.select(col("value").cast("string")).collect().map(_.getString(0))
    assert(vals.length === 32 && vals.toSet.size === 32,
      s"split ranges must cover every offset exactly once: ${vals.length}")
    // without the option the layout stays 1:1 (the default contract)
    val plain = spark.read.format(Fmt)
      .option("kafka.bootstrap.servers", brokerId)
      .option("subscribe", "hot").load()
    assert(plain.rdd.getNumPartitions === 2)

    // streaming leg: every microbatch plans >= 4 pieces
    val widths = new java.util.concurrent.CopyOnWriteArrayList[Int]()
    val sq = track(spark.readStream.format(Fmt)
      .option("kafka.bootstrap.servers", brokerId)
      .option("subscribe", "hot")
      .option("startingOffsets", "earliest")
      .option("minPartitions", "4").load()
      .writeStream.outputMode("append")
      .option("checkpointLocation", tempDir("graft_fab_minp") + "/ckpt")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        widths.add(df.rdd.getNumPartitions): Unit
      }
      .start())
    sq.processAllAvailable(); sq.stop()
    import scala.jdk.CollectionConverters._
    assert(widths.asScala.nonEmpty && widths.asScala.forall(_ >= 4),
      s"every microbatch must plan >= 4 input partitions, got ${widths.asScala.toList}")
  }

  test("broker lookup fails loud for an unknown id; write needs a topic") {
    val e = intercept[IllegalArgumentException] {
      spark.read.format(Fmt)
        .option("kafka.bootstrap.servers", "never_started")
        .option("subscribe", "t").load().collect()
    }
    assert(e.getMessage.contains("no MemBroker"))
  }
}

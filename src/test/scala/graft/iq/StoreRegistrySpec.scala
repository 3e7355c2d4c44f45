package graft.iq

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.dsl.{KStream, KV}

/** Interactive queries: materialized stores are queryable like the
  * reference's `KafkaStream.Store` views (SURVEY §3.3).
  */
class StoreRegistrySpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("streaming store: get/range/all reflect latest state per key") {
    val registry = new StoreRegistry(spark)
    val in = MemoryStream[(String, Long)]
    val table = new KStream(in.toDS().map { case (k, v) =>
      KV(k, v, new java.sql.Timestamp(v)) }).toTable
    val q = registry.materialize(table, "word_store")

    in.addData(("a", 1L), ("b", 2L)); q.processAllAvailable()
    in.addData(("a", 10L)); q.processAllAvailable()

    val all = registry.all("word_store").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("value")).toMap
    assert(all === Map("a" -> 10L, "b" -> 2L))
    assert(registry.get("word_store", "a") === Some(10L))
    assert(registry.range("word_store", "a", "a").count() === 1)
    assert(registry.approximateNumEntries("word_store") === 2L)
    registry.stop()
  }

  test("streaming store stays O(keys): many triggers never grow the store") {
    val registry = new StoreRegistry(spark)
    val in = MemoryStream[(String, Long)]
    val table = new KStream(in.toDS().map { case (k, v) =>
      KV(k, v, new java.sql.Timestamp(v)) }).toTable
    val q = registry.materialize(table, "compact_store")

    // 20 triggers x 2 keys: an append-log store would hold 40 rows
    (1 to 20).foreach { i =>
      in.addData(("a", i.toLong), ("b", i * 100L)); q.processAllAvailable()
    }
    assert(registry.storeSize("compact_store") === Some(2))
    val all = registry.all("compact_store").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("value")).toMap
    assert(all === Map("a" -> 20L, "b" -> 2000L))
    registry.stop()
  }

  test("streaming get is O(1): point lookups launch zero Spark jobs") {
    val registry = new StoreRegistry(spark)
    val in = MemoryStream[(String, Long)]
    val table = new KStream(in.toDS().map { case (k, v) =>
      KV(k, v, new java.sql.Timestamp(v)) }).toTable
    val q = registry.materialize(table, "o1_store")
    in.addData(("a", 1L), ("b", 2L)); q.processAllAvailable()

    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(s: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      (1 to 100).foreach { _ =>
        assert(registry.get("o1_store", "a") === Some(1L))
        assert(registry.get("o1_store", "missing") === None)
      }
      // listener events are async; give the bus a beat before counting
      Thread.sleep(500)
      assert(jobs.get() === 0, "a point lookup ran a Spark job")
    } finally spark.sparkContext.removeSparkListener(listener)
    registry.stop()
  }

  test("reverseRange / reverseAll scan in descending key order") {
    val registry = new StoreRegistry(spark)
    val in = MemoryStream[(String, Long)]
    val table = new KStream(in.toDS().map { case (k, v) =>
      KV(k, v, new java.sql.Timestamp(v)) }).toTable
    val q = registry.materialize(table, "rev_store")
    in.addData(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)); q.processAllAvailable()

    val revAll = registry.reverseAll("rev_store").collect().map(_.getAs[String]("key"))
    assert(revAll.toSeq === Seq("d", "c", "b", "a"))
    val rev = registry.reverseRange("rev_store", "b", "c").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("value"))
    assert(rev.toSeq === Seq("c" -> 3L, "b" -> 2L))
    registry.stop()
  }

  test("windowed store fetchAll returns every key's windows in a time range") {
    val registry = new StoreRegistry(spark)
    val in = MemoryStream[(String, Long)]
    // 10s tumbling windows keyed by the word; ts = the value
    val table = new KStream(in.toDS().map { case (k, v) =>
      KV(k, v, new java.sql.Timestamp(v)) })
      .groupByKey.windowedBy(graft.dsl.TumblingWindow.of(10000L)).count
    val q = registry.materialize(table, "fa_store")
    in.addData(("a", 1000L), ("a", 2000L), ("b", 12000L), ("a", 25000L))
    q.processAllAvailable()

    // all three windows: a@[0,10s) count 2, b@[10s,20s) count 1, a@[20s,30s) count 1
    val everything = registry.fetchAll("fa_store", 0L, 30000L).collect()
      .map(r => (r.getAs[org.apache.spark.sql.Row]("key").getAs[String]("key"),
        r.getAs[Long]("value")))
    assert(everything.toSeq === Seq(("a", 2L), ("b", 1L), ("a", 1L)))
    // bounds are inclusive (reference Fetch semantics): [10s, 20s] catches
    // the a-window starting exactly at 20s, [10s, 20s) does not
    val mid = registry.fetchAll("fa_store", 10000L, 19999L).collect()
      .map(r => (r.getAs[org.apache.spark.sql.Row]("key").getAs[String]("key"),
        r.getAs[Long]("value")))
    assert(mid.toSeq === Seq(("b", 1L)))
    assert(registry.fetchAll("fa_store", 10000L, 20000L).count() === 2L)
    registry.stop()
  }

  test("fetch parity sweep: the reference's doc example + edge ranges, both IQ modes") {
    // the IReadOnlyWindowStore.cs:23-99 doc example: windows for key A
    // starting at 10, 15, 20, 25 (width 10, hop 5); Fetch(A, 10, 20) must
    // return exactly the first THREE (start-time inclusive both ends),
    // oldest window first. Events at 19s/25s put A in starts
    // {10,15}/{20,25}; a B event keeps key filtering honest.
    def builtStore(registry: StoreRegistry, name: String,
        ckpt: Option[String]): Unit = {
      val in = MemoryStream[(String, Long)]
      val table = new KStream(in.toDS().map { case (k, v) =>
        KV(k, v, new java.sql.Timestamp(v)) })
        .groupByKey.windowedBy(graft.dsl.HoppingWindow.of(10000L, 5000L)).count
      val q = ckpt match {
        case Some(c) => registry.materializeCheckpointed(table, name, c)
        case None => registry.materialize(table, name)
      }
      in.addData(("A", 19000L), ("A", 25000L), ("B", 19000L))
      q.processAllAvailable()
    }
    def starts(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.collect().map(_.getAs[org.apache.spark.sql.Row]("key")
        .getAs[java.sql.Timestamp]("start").getTime)
    for ((mode, ckpt) <- Seq(
        "driver-map" -> None,
        "checkpointed" -> Some(java.nio.file.Files
          .createTempDirectory("graft_iq_sweep").toString))) {
      val registry = new StoreRegistry(spark)
      val name = s"sweep_${mode.take(6)}"
      builtStore(registry, name, ckpt)
      // the doc example: [10s, 20s] -> starts 10, 15, 20 — inclusive both
      // ends, ordered oldest -> newest
      assert(starts(registry.fetch(name, "A", 10000L, 20000L)) ===
        Seq(10000L, 15000L, 20000L), s"[$mode] doc example")
      // exact-boundary singleton: from == to hits the window starting there
      assert(starts(registry.fetch(name, "A", 15000L, 15000L)) ===
        Seq(15000L), s"[$mode] from == to must hit the exact start")
      // reversed bounds: empty result, NO throw (reference: to < minTime
      // -> EmptyWindowStoreEnumerator, InMemoryWindowStore.cs:287-300)
      assert(registry.fetch(name, "A", 20000L, 10000L).count() === 0L,
        s"[$mode] reversed bounds must be empty, not an error")
      // range below / above all windows: empty
      assert(registry.fetch(name, "A", 0L, 9999L).count() === 0L)
      assert(registry.fetch(name, "A", 30001L, 99999L).count() === 0L)
      // missing key: empty (null-value semantics of the point Fetch)
      assert(registry.fetch(name, "C", 0L, 99999L).count() === 0L,
        s"[$mode] unknown key must be empty")
      // key isolation: B has its own windows in the same range
      assert(starts(registry.fetch(name, "B", 10000L, 20000L)) ===
        Seq(10000L, 15000L), s"[$mode] key filter")
      registry.stop()
    }
  }

  test("checkpointed store: statestore reader serves all/get with no driver map") {
    val registry = new StoreRegistry(spark)
    val in = MemoryStream[(String, Long)]
    val table = new KStream(in.toDS().map { case (k, v) =>
      KV(k, v, new java.sql.Timestamp(v)) }).toTable
    val ckpt = java.nio.file.Files.createTempDirectory("graft_iq_ckpt").toString
    val q = registry.materializeCheckpointed(table, "big_store", ckpt)

    in.addData(("a", 1L), ("b", 2L)); q.processAllAvailable()
    in.addData(("a", 10L), ("c", 3L)); q.processAllAvailable() // a updates in place

    // no driver-side map exists for this store at all
    assert(registry.storeSize("big_store") === None)

    // latest view comes straight off the checkpoint's state files
    val all = registry.all("big_store").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("value")).toMap
    assert(all === Map("a" -> 10L, "b" -> 2L, "c" -> 3L))
    assert(registry.get("big_store", "a") === Some(10L))
    assert(registry.get("big_store", "missing") === None)
    val rng = registry.range("big_store", "a", "b").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("value"))
    assert(rng.toSeq === Seq("a" -> 10L, "b" -> 2L))

    // survives the materializing query stopping: the checkpoint is durable
    registry.stop()
    val after = registry.all("big_store").collect()
      .map(r => r.getAs[String]("key") -> r.getAs[Long]("value")).toMap
    assert(after === Map("a" -> 10L, "b" -> 2L, "c" -> 3L))
  }

  test("checkpointed windowed store: fetch/fetchAll read window state off the checkpoint") {
    val registry = new StoreRegistry(spark)
    val in = MemoryStream[(String, Long)]
    val table = new KStream(in.toDS().map { case (k, v) =>
      KV(k, v, new java.sql.Timestamp(v)) })
      .groupByKey.windowedBy(graft.dsl.TumblingWindow.of(10000L)).count
    val ckpt = java.nio.file.Files.createTempDirectory("graft_iq_wckpt").toString
    val q = registry.materializeCheckpointed(table, "win_store", ckpt)
    in.addData(("a", 1000L), ("a", 2000L), ("b", 12000L), ("a", 25000L))
    q.processAllAvailable()

    assert(registry.storeSize("win_store") === None) // no driver map
    val fetched = registry.fetch("win_store", "a", 0L, 30000L).collect()
      .map(r => (r.getAs[org.apache.spark.sql.Row]("key")
        .getAs[java.sql.Timestamp]("start").getTime, r.getAs[Long]("value")))
    assert(fetched.toSeq === Seq((0L, 2L), (20000L, 1L))) // a's two windows
    val everything = registry.fetchAll("win_store", 0L, 30000L).collect()
      .map(r => (r.getAs[org.apache.spark.sql.Row]("key").getAs[String]("key"),
        r.getAs[Long]("value")))
    assert(everything.toSeq === Seq(("a", 2L), ("b", 1L), ("a", 1L)))
    registry.stop()
  }

  test("checkpointed session store: fetch reads merged sessions off the checkpoint") {
    val registry = new StoreRegistry(spark)
    val in = MemoryStream[(String, Long)]
    // 10s gap: a@1000+2000 merge into [1000, 12000), b@5000 is [5000, 15000);
    // max event time 5000 keeps the watermark below both ends, so both
    // sessions are LIVE state when the batch commits
    val table = new KStream(in.toDS().map { case (k, v) =>
      KV(k, v, new java.sql.Timestamp(v)) })
      .groupByKey
      .windowedBy(graft.dsl.SessionWindow(java.time.Duration.ofMillis(10000L)))
      .count
    val ckpt = java.nio.file.Files.createTempDirectory("graft_iq_sess").toString
    // session aggregations only stream in append mode
    val q = registry.materializeCheckpointed(table, "sess_store", ckpt,
      outputMode = "append")
    in.addData(("a", 1000L), ("a", 2000L), ("b", 5000L))
    q.processAllAvailable()

    assert(registry.storeSize("sess_store") === None) // no driver map
    val a = registry.fetch("sess_store", "a", 0L, 30000L).collect()
      .map(r => (r.getAs[org.apache.spark.sql.Row]("key")
          .getAs[java.sql.Timestamp]("start").getTime,
        r.getAs[org.apache.spark.sql.Row]("key")
          .getAs[java.sql.Timestamp]("end").getTime,
        r.getAs[Long]("value")))
    assert(a.toSeq === Seq((1000L, 12000L, 2L))) // merged session, count 2
    val everything = registry.fetchAll("sess_store", 0L, 30000L).collect()
      .map(r => (r.getAs[org.apache.spark.sql.Row]("key").getAs[String]("key"),
        r.getAs[Long]("value")))
    assert(everything.toSeq === Seq(("a", 2L), ("b", 1L)))
    registry.stop()
  }

  test("checkpointed multi-buffer windowed store surfaces all aggregation buffers") {
    import java.sql.Timestamp
    import org.apache.spark.sql.functions._
    import graft.dsl.{Upsert, Windowed}
    val registry = new StoreRegistry(spark)
    val in = MemoryStream[(String, Long)]
    // a windowed agg with TWO buffers (count + sum) beside the max-ts
    // 1h delay = retention: no window is watermark-evicted during the test
    val df = in.toDS().map { case (k, v) => (k, v, new Timestamp(v)) }
      .toDF("key", "value", "ts").withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 seconds"), col("key"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sv"),
        max(col("ts")).as("mts"))
    val table = new graft.dsl.KTable(df
      .select(col("key"), col("window.start"), col("window.end"),
        col("cnt"), col("sv"), col("mts"))
      .as[(String, Timestamp, Timestamp, Long, Long, Timestamp)]
      .map { case (k, s, e, c, sv, m) => Upsert(Windowed(k, s, e), Some((c, sv)), m) })
    val ckpt = java.nio.file.Files.createTempDirectory("graft_iq_multi").toString
    val q = registry.materializeCheckpointed(table, "multi_store", ckpt)
    in.addData(("a", 1000L), ("a", 2000L), ("b", 12000L))
    q.processAllAvailable()

    // value = struct of the two buffers, named after the aggregate functions
    val rows = registry.fetchAll("multi_store", 0L, 30000L).collect()
      .map { r =>
        val v = r.getAs[org.apache.spark.sql.Row]("value")
        (r.getAs[org.apache.spark.sql.Row]("key").getAs[String]("key"),
          v.getAs[Long]("count"), v.getAs[Long]("sum"))
      }
    assert(rows.toSeq === Seq(("a", 2L, 3000L), ("b", 1L, 12000L)))
    registry.stop()
  }

  test("Processor-API value state reads off the checkpoint with no driver map") {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import graft.streaming.{ProcessorApi, RunningCountProcessor}
    ProcessorApi.useRocksDb(spark)
    try {
      val registry = new StoreRegistry(spark)
      val in = MemoryStream[(String, String, Long)]
      val stream = new KStream(in.toDS().map { case (k, v, t) =>
        KV(k, v, new java.sql.Timestamp(t)) })
      val counted = stream.process(new RunningCountProcessor[String, String],
        TimeMode.None(), OutputMode.Update())
      val ckpt = java.nio.file.Files.createTempDirectory("graft_iq_proc").toString
      val q = counted.writeStream.format("noop")
        .option("checkpointLocation", ckpt).outputMode("update").start()
      in.addData(("a", "x", 1000L), ("a", "y", 2000L), ("b", "z", 1000L))
      q.processAllAvailable()
      in.addData(("a", "w", 3000L)); q.processAllAvailable()
      q.stop()

      registry.registerProcessorStore("proc_store", ckpt, "count")
      assert(registry.storeSize("proc_store") === None) // no driver map
      val all = registry.all("proc_store").collect()
        .map(r => r.getAs[String]("key") -> r.getAs[Long]("value")).toMap
      assert(all === Map("a" -> 3L, "b" -> 1L)) // state survived both triggers
      assert(registry.get("proc_store", "a") === Some(3L))
      assert(registry.get("proc_store", "missing") === None)
      assert(registry.range("proc_store", "a", "a").count() === 1)
    } finally ProcessorApi.useDefaultStateStore(spark)
  }

  test("Processor-API list and map state normalize to registry rows") {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import graft.streaming.ProcessorApi
    ProcessorApi.useRocksDb(spark)
    try {
      val registry = new StoreRegistry(spark)
      val in = MemoryStream[(String, String, Long)]
      val stream = new KStream(in.toDS().map { case (k, v, t) =>
        KV(k, v, new java.sql.Timestamp(t)) })
      val out = stream.process(new ListMapStateProcessor,
        TimeMode.None(), OutputMode.Update())
      val ckpt = java.nio.file.Files.createTempDirectory("graft_iq_proclm").toString
      val q = out.writeStream.format("noop")
        .option("checkpointLocation", ckpt).outputMode("update").start()
      in.addData(("a", "x", 1000L), ("a", "y", 2000L), ("b", "z", 1000L))
      q.processAllAvailable()
      q.stop()

      // list state: one row per element, single-field structs unwrapped
      registry.registerProcessorStore("proc_list", ckpt, "recent")
      val list = registry.all("proc_list").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[String]("value")))
      assert(list.toSet === Set(("a", "x"), ("a", "y"), ("b", "z")))
      // map state: (key, map_key, value) rows
      registry.registerProcessorStore("proc_map", ckpt, "tally")
      val m = registry.all("proc_map").collect()
        .map(r => (r.getAs[String]("key"), r.getAs[String]("map_key"),
          r.getAs[Long]("value")))
      assert(m.toSet === Set(("a", "x", 1L), ("a", "y", 1L), ("b", "z", 1L)))
    } finally ProcessorApi.useDefaultStateStore(spark)
  }

  test("user max aggregate beside the internal max-ts buffer resolves positionally") {
    import java.sql.Timestamp
    import org.apache.spark.sql.functions._
    import graft.dsl.{Upsert, Windowed}
    val registry = new StoreRegistry(spark)
    val in = MemoryStream[(String, Long)]
    // the ADVICE trap: the USER buffer is itself max(...), so the state
    // schema carries TWO fields named "max" — by-name selection would
    // mis-assign them; positional selection must return the user max as
    // the value and the ts buffer as ts
    val df = in.toDS().map { case (k, v) => (k, v, new Timestamp(v)) }
      .toDF("key", "value", "ts").withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "10 seconds"), col("key"))
      .agg(max(col("value")).as("mv"), max(col("ts")).as("mts"))
    val table = new graft.dsl.KTable(df
      .select(col("key"), col("window.start"), col("window.end"),
        col("mv"), col("mts"))
      .as[(String, Timestamp, Timestamp, Long, Timestamp)]
      .map { case (k, s, e, mv, m) => Upsert(Windowed(k, s, e), Some(mv), m) })
    val ckpt = java.nio.file.Files.createTempDirectory("graft_iq_umax").toString
    val q = registry.materializeCheckpointed(table, "umax_store", ckpt)
    in.addData(("a", 1000L), ("a", 2000L), ("b", 12000L))
    q.processAllAvailable()

    val rows = registry.fetchAll("umax_store", 0L, 30000L).collect()
      .map(r => (r.getAs[org.apache.spark.sql.Row]("key").getAs[String]("key"),
        r.getAs[Long]("value"),
        r.getAs[Timestamp]("ts").getTime))
    // value = user max(value), NOT the ts buffer; ts = max event time
    assert(rows.toSeq === Seq(("a", 2000L, 2000L), ("b", 12000L, 12000L)))
    registry.stop()
  }

  test("error handling: permissive parse splits good and corrupt records") {
    import graft.runtime.ErrorHandling
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))
    val df = Seq("{\"k\": 1}", "not-json").toDF("raw")
    val parsed = ErrorHandling.deserializeJson(df, "raw", schema)
    val (good, bad) = ErrorHandling.deadLetter(parsed)
    assert(good.count() === 1 && bad.count() === 1)

    // FAIL policy: first corrupt record aborts the query (reference's FAIL)
    val failing = ErrorHandling.deserializeJson(df, "raw", schema, ErrorHandling.Fail)
    intercept[org.apache.spark.SparkException] { failing.collect() }
  }

  test("transform/transformValues: per-partition init, per-record apply") {
    val s = new graft.dsl.KStream(Seq(
      graft.dsl.KV("a", "x", new java.sql.Timestamp(1))).toDS())
    val out = s.transformValues(() => { (k: String, v: String) => s"$k:$v" })
      .ds.collect().head
    assert(out.value === "a:x" && out.ts.getTime === 1L)
    val t = s.transform(it => it.map(r => r.copy(value = r.value.toUpperCase)))
    assert(t.ds.collect().head.value === "X")
  }
}

/** Exercises named ListState + MapState (the two collection state kinds the
  * registry's processor-store view must normalize).
  */
final class ListMapStateProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      String, KV[String, String], KV[String, Long]] {
  import org.apache.spark.sql.{Encoder, Encoders}
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig}
  @transient private var recent: org.apache.spark.sql.streaming.ListState[String] = _
  @transient private var tally: org.apache.spark.sql.streaming.MapState[String, Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    val es: Encoder[String] = Encoders.STRING
    val el: Encoder[Long] = Encoders.scalaLong
    recent = getHandle.getListState[String]("recent", es, TTLConfig.NONE)
    tally = getHandle.getMapState[String, Long]("tally", es, el, TTLConfig.NONE)
  }

  override def handleInputRows(key: String, rows: Iterator[KV[String, String]],
      tv: TimerValues): Iterator[KV[String, Long]] = {
    var n = 0L
    rows.foreach { r =>
      recent.appendValue(r.value)
      val cur = if (tally.containsKey(r.value)) tally.getValue(r.value) else 0L
      tally.updateValue(r.value, cur + 1)
      n += 1
    }
    Iterator.single(KV(key, n, new java.sql.Timestamp(0L)))
  }
}

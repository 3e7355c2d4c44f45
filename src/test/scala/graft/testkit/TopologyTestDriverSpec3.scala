package graft.testkit

import java.util.concurrent.ConcurrentLinkedQueue

import graft.SparkSpec
import graft.dsl.{KStream, KV, StreamsBuilder, Upsert}

/** Collector the executor-side closures append to: a JVM static, so local-mode
  * tasks (same JVM) mutate the instance the assertions read — a driver-side
  * `var` captured in a closure would be serialized per task and mutations
  * lost.
  */
object Observed {
  val records = new ConcurrentLinkedQueue[(String, String)]()
  def clear(): Unit = records.clear()
  def toSeq: Seq[(String, String)] = {
    val it = records.iterator(); val b = Seq.newBuilder[(String, String)]
    while (it.hasNext) b += it.next()
    b.result()
  }
}

/** Acceptance tests, third batch: stateless-operator and table-view reference
  * suites replayed through the packaged testkit.
  *
  * Ported suites:
  *  - KStreamMapTests (`test/.../Processors/KStreamMapTests.cs:25-114`)
  *  - KStreamMapValuesTests (`KStreamMapValuesTests.cs:31-93`)
  *  - KStreamSelectKeyTests (`KStreamSelectKeyTests.cs:26-97`)
  *  - KStreamFilterNotTests (`KStreamFilterNotTests.cs:21-112`)
  *  - KStreamFlatMapValuesTests (`KStreamFlatMapValuesTests.cs:31-98`)
  *  - KStreamPeekTests / KStreamForeachTests (`KStreamPeekTests.cs:14-54`,
  *    `KStreamForeachTests.cs:21-46`)
  *  - KStreamPassThoughTests (`KStreamPassThoughTests.cs:77-271`)
  *  - KStreamToTableTests (`KStreamToTableTests.cs:14-83`)
  *  - KTableFilterNotTests (`KTableFilterNotTests.cs:23-121`)
  *  - KTableMapValuesTests (`KTableMapValuesTests.cs:31-136`)
  *  - KTableToStreamTests (`KTableToStreamTests.cs:17-163`)
  *  - KTableSourceTests (`KTableSourceTests.cs:37-449`)
  *  - KTableGroupByTests (`KTableGroupByTests.cs:25-47`)
  *  - KGlobalTableTests (`KGlobalTableTests.cs:13-58`)
  *
  *  - KStreamPrintTests (`KStreamPrintTests.cs:13-50`) — writer plumbing
  *    via [[graft.dsl.Printed]]
  *
  * Null-argument scenarios assert Kafka-client argument checks resolved at
  * compile time here.
  */
class TopologyTestDriverSpec3 extends SparkSpec {
  import spark.implicits._

  test("KStreamPrintTests: PrintElementWithWriter emits [label]: key value lines") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      val writer = new java.io.StringWriter()
      in.pipeInputs((0 until 5).map(i => i.toString -> s"V$i"))
      in.stream.print(graft.dsl.Printed.toWriter[String, String](writer)
        .withLabel("string"))
      val expected = (0 until 5).map(i => s"[string]: $i V$i\n").mkString
      assert(writer.toString === expected)

      // ShouldNotAllowNullAction: a null Printed must throw, not NPE later
      intercept[IllegalArgumentException] { in.stream.print(null) }
    } finally driver.close()
  }

  test("KStreamMapTests: map to another value type and to another key type") {
    val driver = new TopologyTestDriver(spark)
    try {
      // MapOtherValueType: (key1, "123456") -> (key1, 6)
      val in1 = driver.createInputTopic[String, String]()
      val out1 = driver.createOutputTopic(
        in1.stream.map((k, v) => (k, v.length)), "tk3_map_v")
      in1.pipeInputs(Seq("key1" -> "123456"))
      val r1 = out1.readKeyValue()
      assert(r1.isDefined && r1.get.key === "key1" && r1.get.value === 6)

      // MapOtherKeyType: key becomes the value's length
      val in2 = driver.createInputTopic[String, String]()
      val out2 = driver.createOutputTopic(
        in2.stream.map((k, v) => (v.length, k)), "tk3_map_k")
      in2.pipeInputs(Seq("key1" -> "123456"))
      val r2 = out2.readKeyValue()
      assert(r2.isDefined && r2.get.key === 6 && r2.get.value === "key1")
    } finally driver.close()
  }

  test("KStreamMapValuesTests.MapValuesSameType: values upper-cased in order") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      val out = driver.createOutputTopic(
        in.stream.mapValues(_.toUpperCase), "tk3_mapvalues")
      in.pipeInputs(Seq("key1" -> "abc", "key2" -> "test"))
      assert(out.readKeyValueList().map(r => r.key -> r.value) ===
        Seq("key1" -> "ABC", "key2" -> "TEST"))
    } finally driver.close()
  }

  test("KStreamSelectKeyTests.SelectKeyChangeType: key re-selected as key length") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      val out = driver.createOutputTopic(
        in.stream.selectKey((k, _) => k.length), "tk3_selectkey")
      in.pipeInputs(Seq("key1" -> "SO", "asmrugby" -> "2", "toulon" -> "10"))
      assert(out.readKeyValueList().map(r => r.key -> r.value) ===
        Seq(4 -> "SO", 8 -> "2", 6 -> "10"))
    } finally driver.close()
  }

  test("KStreamFilterNotTests: failing records pass, matching records drop") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      val out = driver.createOutputTopic(
        in.stream.filterNot((_, v) => v.toLowerCase.contains("test")),
        "tk3_filternot")
      // FilterNotWithElements: key1 matches the predicate and is dropped
      in.pipeInputs(Seq("key1" -> "test1234", "key2" -> "car", "key3" -> "paper"))
      assert(out.readKeyValueList().map(r => r.key -> r.value) ===
        Seq("key2" -> "car", "key3" -> "paper"))
      // FilterNotNoElements analog: everything matches -> nothing forwarded
      in.pipeInputs(Seq("key4" -> "test", "key5" -> "tests"))
      assert(out.readKeyValueList().isEmpty)
    } finally driver.close()
  }

  test("KStreamFlatMapValuesTests.FlatMapValuesSameType: value explodes per char, key kept") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      val out = driver.createOutputTopic(
        in.stream.flatMapValues(v => v.map(_.toString)), "tk3_flatmapvalues")
      in.pipeInputs(Seq("key1" -> "123456"))
      val result = out.readKeyValueList()
      assert(result.size === 6)
      (1 to 6).foreach { i =>
        assert(result(i - 1).key === "key1" && result(i - 1).value === i.toString)
      }
    } finally driver.close()
  }

  test("KStreamPeekTests.ShouldObserveStreamElements: peek sees every record, in order") {
    val driver = new TopologyTestDriver(spark)
    try {
      Observed.clear()
      val in = driver.createInputTopic[String, String]()
      val out = driver.createOutputTopic(
        in.stream.peek((k, v) => Observed.records.add(k -> v)), "tk3_peek")
      val expected = (0 until 8).map(i => i.toString -> s"V$i")
      expected.foreach { case (k, v) => in.pipeInput(k, v) }
      assert(Observed.toSeq === expected)
      // pass-through: the peeked stream still forwards everything
      assert(out.readKeyValueList().map(r => r.key -> r.value) === expected)
    } finally driver.close()
  }

  test("KStreamForeachTests.ForeachAction: terminal action observes each record") {
    Observed.clear()
    val s = new KStream(Seq(KV("key1", "123456", ts(1))).toDS())
    s.foreach((k, v) => Observed.records.add(k -> v))
    assert(Observed.toSeq === Seq("key1" -> "123456"))
  }

  test("KStreamPassThoughTests.PassThoughElements: source to sink unchanged") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      val out = driver.createOutputTopic(in.stream, "tk3_passthrough")
      val data = (0 until 10).map(i => s"key$i" -> s"value$i")
      in.pipeInputs(data)
      assert(out.readKeyValueList().map(r => r.key -> r.value) === data)
    } finally driver.close()
  }

  test("KStreamToTableTests.TestToTable: stream upserts become the table's latest view") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      // TestToTableEmpty shape: odd-length values filtered before the table
      val table = in.stream.filter((_, v) => v.length % 2 == 0).toTable
      val out = driver.createOutputTopic(table.toStream, "tk3_totable",
        outputMode = "update")
      in.pipeInput("test", "test")
      in.pipeInput("test", "tes") // odd length: never reaches the table
      in.pipeInput("test", "1234")
      assert(out.readKeyValueList().map(r => r.key -> r.value) ===
        Seq("test" -> "test", "test" -> "1234"))
    } finally driver.close()
  }

  test("KTableFilterNotTests: rows matching the predicate become tombstones") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      driver.materializeStore(
        in.table.filterNot((_, v) => v.contains("test")), "tk3_fn_store")
      // FilterNotOneElement/WithElements: only non-"test" rows survive
      in.pipeInputs(Seq("key1" -> "test1234", "key2" -> "car", "key3" -> "paper"))
      val store = driver.getKeyValueStore[String, String]("tk3_fn_store")
      assert(store.approximateNumEntries() === 2)
      assert(store.get("key1") === None)
      assert(store.get("key2") === Some("car"))
      assert(store.get("key3") === Some("paper"))
    } finally driver.close()
  }

  test("KTableMapValuesTests: mapped values land in the store, original keys kept") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      // MapValuesOtherValueType: v -> v.length
      driver.materializeStore(in.table.mapValues(_.length), "tk3_mv_store")
      in.pipeInputs(Seq("key1" -> "test1234", "key2" -> "test", "key3" -> "paper"))
      val store = driver.getKeyValueStore[String, Int]("tk3_mv_store")
      assert(store.approximateNumEntries() === 3)
      assert(store.get("key1") === Some(8))
      assert(store.get("key2") === Some(4))
      assert(store.get("key3") === Some(5))
    } finally driver.close()
  }

  test("KTableToStreamTests: update, delete, and key-mapping transformations") {
    val driver = new TopologyTestDriver(spark)
    try {
      // KTableToStreamWithTransformation: re-key by upper-cased value
      val in1 = driver.createInputTopic[String, String]()
      val out1 = driver.createOutputTopic(
        in1.table.toStream((_, v) => v.toUpperCase), "tk3_ts_map",
        outputMode = "update")
      in1.pipeInput("key1", "a")
      in1.pipeInput("key2", "b")
      assert(out1.readKeyValueList().map(r => r.key -> r.value) ===
        Seq("A" -> "a", "B" -> "b"))

      // KTableToStreamWithUpdate/WithLastUpdate: every upsert becomes an event
      val in2 = driver.createInputTopic[String, String]()
      val out2 = driver.createOutputTopic(in2.table.toStream, "tk3_ts_upd",
        outputMode = "update")
      in2.pipeInput("key1", "a")
      in2.pipeInput("key2", "b")
      in2.pipeInput("key2", "c")
      assert(out2.readKeyValueList().map(r => r.key -> r.value) ===
        Seq("key1" -> "a", "key2" -> "b", "key2" -> "c"))

      // KTableToStreamWithDelete: the reference forwards the tombstone as a
      // null-valued record; toStream drops tombstones here (typed values),
      // toChangeStream is the documented surface that observes them
      val in3 = driver.createInputTopic[String, String]()
      val out3 = new TestOutputTopic[String, String](spark, "tk3_ts_del", driver)(
        implicitly)
      val q = in3.table.toChangeStream
        .flatMap(u => Some(KV(u.key, u.value.getOrElse("__tombstone"), u.ts)))
        .writeStream.format("memory").queryName("tk3_ts_del")
        .outputMode("append").start()
      driver.register(q)
      in3.pipeInput("key1", "a")
      in3.pipeInput("key2", "b")
      in3.pipeInput("key2", null)
      assert(out3.readKeyValueList().map(r => r.key -> r.value) ===
        Seq("key1" -> "a", "key2" -> "b", "key2" -> "__tombstone"))
    } finally driver.close()
  }

  test("KTableSourceTests: source store get, update, delete, null-key skip") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      driver.materializeStore(in.table, "tk3_src_store")
      val store = driver.getKeyValueStore[String, String]("tk3_src_store")

      // SimpleKTableSource
      in.pipeInput("key1", "a")
      assert(store.get("key1") === Some("a"))
      // KTableSourceUpdateKey
      in.pipeInput("key1", "b")
      assert(store.get("key1") === Some("b"))
      assert(store.approximateNumEntries() === 1)
      // KTableSourceKeyNull: skipped at the source
      in.pipeInput(null, "c")
      assert(store.approximateNumEntries() === 1)
      // KTableSourceDelete: tombstone removes the key
      in.pipeInput("key1", null)
      assert(store.get("key1") === None)
      assert(store.approximateNumEntries() === 0)
    } finally driver.close()
  }

  test("KTableSourceTests: range, reverseRange, reverseAll state-store scans") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      driver.materializeStore(in.table, "tk3_range_store")
      in.pipeInput("key1", "1")
      in.pipeInput("key3", "3")
      in.pipeInput("key2", "2")
      in.pipeInput("key4", "4")
      val store = driver.getKeyValueStore[String, String]("tk3_range_store")

      assert(store.range("key1", "key3") ===
        Seq("key1" -> "1", "key2" -> "2", "key3" -> "3"))
      assert(store.reverseRange("key1", "key3") ===
        Seq("key3" -> "3", "key2" -> "2", "key1" -> "1"))
      assert(store.reverseAll().map(_._1) === Seq("key4", "key3", "key2", "key1"))
    } finally driver.close()
  }

  test("KTableGroupByTests.TestGroupOK: re-keyed grouping counts under new keys") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      driver.materializeStore(
        in.table.groupBy((k, v) => (k.toUpperCase, v.toUpperCase)).count,
        "tk3_tgb_store")
      in.pipeInputs(Seq("key1" -> "test1234", "key2" -> "test", "key3" -> "paper"))
      val store = driver.getKeyValueStore[String, Long]("tk3_tgb_store")
      assert(store.approximateNumEntries() === 3)
      assert(store.get("KEY1") === Some(1L))
    } finally driver.close()
  }

  test("KGlobalTableTests.GlobalTableWithStoreQueryable: snapshot content is queryable") {
    val driver = new TopologyTestDriver(spark)
    try {
      val builder = new StreamsBuilder(spark)
      val global = builder.globalTable(Seq(("test", "coucou")).toDS())
      // the global snapshot materializes as a (batch) queryable store
      val t0 = new java.sql.Timestamp(0L) // local: the closure must not capture the spec
      driver.materializeStore(
        new graft.dsl.KTable(global.ds.map { case (k, v) =>
          Upsert(k, Some(v), t0) }),
        "tk3_global_store")
      val store = driver.getKeyValueStore[String, String]("tk3_global_store")
      assert(store.get("test") === Some("coucou"))
    } finally driver.close()
  }
}

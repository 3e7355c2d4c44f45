package graft.testkit

import graft.SparkSpec
import graft.dsl.TumblingWindow

/** Acceptance tests, second batch: four more reference operator suites
  * replayed through the packaged testkit, record-for-record.
  *
  * Ported suites:
  *  - KStreamFlatMapTests (`test/.../Processors/KStreamFlatMapTests.cs:26-135`)
  *  - KTableFilterTests (`KTableFilterTests.cs:22-118`)
  *  - KTableKTableLeftJoinTests (`KTableKTableLeftJoinTests.cs:18-240`)
  *  - TimeWindowKStreamAggTests (`TimeWindowKStreamAggTests.cs:115-321`)
  *
  * Serde-construction and null-argument scenarios from those suites assert
  * Kafka-client plumbing that has no analog here (Spark encoders are resolved
  * at compile time); the record-flow scenarios are what is ported.
  */
class TopologyTestDriverSpec2 extends SparkSpec {
  import spark.implicits._

  // ---- KStreamFlatMapTests ------------------------------------------------

  test("KStreamFlatMapTests.FlatMapOtherValueType: one record explodes to per-char values") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      // (k, "123456") -> [(k, "1"), ..., (k, "6")] (reference value type is
      // char; Spark has no Char encoder, so the single-char string carries it)
      val out = driver.createOutputTopic(
        in.stream.flatMap((k, v) => v.map(c => k -> c.toString)), "tk2_flatmap_v")

      in.pipeInputs(Seq("key1" -> "123456"))
      val result = out.readKeyValueList()
      assert(result.size === 6)
      (1 to 6).foreach { i =>
        assert(result(i - 1).key === "key1")
        assert(result(i - 1).value === i.toString)
      }
    } finally driver.close()
  }

  test("KStreamFlatMapTests.FlatMapOtherKeyType: exploded records re-keyed by char") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      val out = driver.createOutputTopic(
        in.stream.flatMap((k, v) => v.map(c => c.toString -> k)), "tk2_flatmap_k")

      in.pipeInputs(Seq("key1" -> "123456"))
      val result = out.readKeyValueList()
      assert(result.size === 6)
      (1 to 6).foreach { i =>
        assert(result(i - 1).key === i.toString)
        assert(result(i - 1).value === "key1")
      }
    } finally driver.close()
  }

  // ---- KTableFilterTests --------------------------------------------------

  private def filteredStore(driver: TopologyTestDriver,
      data: Seq[(String, String)]): KeyValueStoreView[String, String] = {
    val in = driver.createInputTopic[String, String]()
    driver.materializeStore(
      in.table.filter((_, v) => v.toLowerCase.contains("test")), "tk2_filter_store")
    in.pipeInputs(data)
    driver.getKeyValueStore[String, String]("tk2_filter_store")
  }

  test("KTableFilterTests.FilterWithElements: passing rows stored, failing row absent") {
    val driver = new TopologyTestDriver(spark)
    try {
      val store = filteredStore(driver,
        Seq("key1" -> "test1234", "key2" -> "test", "key3" -> "paper"))
      assert(store.approximateNumEntries() === 2)
      assert(store.get("key1") === Some("test1234"))
      assert(store.get("key2") === Some("test"))
    } finally driver.close()
  }

  test("KTableFilterTests.FilterNoElements: nothing passes, store stays empty") {
    val driver = new TopologyTestDriver(spark)
    try {
      val store = filteredStore(driver, Seq("key2" -> "car", "key3" -> "paper"))
      assert(store.approximateNumEntries() === 0)
      assert(store.get("key2") === None)
    } finally driver.close()
  }

  test("KTableFilterTests.FilterWithOneOutputElement") {
    val driver = new TopologyTestDriver(spark)
    try {
      val store = filteredStore(driver,
        Seq("key1" -> "test1234", "key2" -> "ferrari", "key3" -> "paper"))
      assert(store.approximateNumEntries() === 1)
      assert(store.get("key1") === Some("test1234"))
      assert(store.get("key2") === None)
    } finally driver.close()
  }

  // ---- KTableKTableLeftJoinTests ------------------------------------------

  test("KTableKTableLeftJoinTests.TableTableLeftJoin: right side optional, updates re-emit") {
    val driver = new TopologyTestDriver(spark)
    try {
      val topic1 = driver.createInputTopic[String, String]()
      val topic2 = driver.createInputTopic[String, String]()
      val joined = topic1.table.leftJoin(topic2.table)(
        (v1, v2) => s"$v1-${v2.getOrElse("")}")
      val out = driver.createOutputTopic(joined.toStream, "tk2_ttlj_out")

      topic1.pipeInput("test", "test")
      topic2.pipeInput("test", "coucou")
      topic1.pipeInput("test2", "test2")
      // ReadKeyValuesToMap: latest value per key
      val records = out.readKeyValueList().groupBy(_.key)
        .map { case (k, rs) => k -> rs.last.value }
      assert(records.size === 2)
      assert(records("test") === "test-coucou")
      assert(records("test2") === "test2-")
    } finally driver.close()
  }

  test("KTableKTableLeftJoinTests.TableTableLeftJoinStateStore: merged store holds left-only row") {
    val driver = new TopologyTestDriver(spark)
    try {
      val topic1 = driver.createInputTopic[String, String]()
      val topic2 = driver.createInputTopic[String, String]()
      val joined = topic1.table.leftJoin(topic2.table)(
        (v1, v2) => s"$v1-${v2.getOrElse("")}")
      driver.materializeStore(topic1.table, "tk2_store1")
      driver.materializeStore(topic2.table, "tk2_store2")
      driver.materializeStore(joined, "tk2_merge_store")

      topic1.pipeInput("test", "test")

      val st1 = driver.getKeyValueStore[String, String]("tk2_store1")
      val st2 = driver.getKeyValueStore[String, String]("tk2_store2")
      val merge = driver.getKeyValueStore[String, String]("tk2_merge_store")
      assert(st1.approximateNumEntries() === 1)
      assert(st2.approximateNumEntries() === 0)
      assert(merge.approximateNumEntries() === 1)
      assert(st1.get("test") === Some("test"))
      assert(st2.get("test") === None)
      assert(merge.get("test") === Some("test-"))
    } finally driver.close()
  }

  test("KTableKTableLeftJoinTests.TableTableLeftJoinNullKey: null-key record is skipped") {
    val driver = new TopologyTestDriver(spark)
    try {
      val topic1 = driver.createInputTopic[String, String]()
      val topic2 = driver.createInputTopic[String, String]()
      val joined = topic1.table.leftJoin(topic2.table)(
        (v1, v2) => s"$v1-${v2.getOrElse("")}")
      val out = driver.createOutputTopic(joined.toStream, "tk2_ttlj_nullkey_out")

      topic1.pipeInput("test", "test")
      topic1.pipeInput(null, "test")
      topic2.pipeInput("test", "coucou")
      val records = out.readKeyValueList().groupBy(_.key)
        .map { case (k, rs) => k -> rs.last.value }
      assert(records.size === 1)
      assert(records("test") === "test-coucou")
    } finally driver.close()
  }

  test("KTableKTableLeftJoinTests.TableTableLeftJoinGetterSupplier: stream joins the derived table") {
    val driver = new TopologyTestDriver(spark)
    try {
      val users = driver.createInputTopic[String, String]()
      val regions = driver.createInputTopic[String, String]()
      val orders = driver.createInputTopic[String, String]()
      // users ⟕ regions is itself a table; the order stream enriches against
      // it — two chained stateful ops in one streaming query (the append-mode
      // changelog-event design is what makes the chain legal in Spark)
      val userRegion = users.table.leftJoin(regions.table)(
        (v1, v2) => s"$v1-${v2.getOrElse("?")}")
      val enriched = orders.stream.leftJoin(userRegion)(
        (order, ur) => s"Order:$order|UserRegion:${ur.orNull}")
        .filter((_, v) => !v.endsWith("null"))
      val out = driver.createOutputTopic(enriched, "tk2_getter_out")

      users.pipeInput("sylvain", "sylvain")
      users.pipeInput("lise", "lise")
      regions.pipeInput("sylvain", "France")
      orders.pipeInput("sylvain", "iPhone12Pro")
      orders.pipeInput("lise", "PixelA4")

      val records = out.readKeyValueList().groupBy(_.key)
        .map { case (k, rs) => k -> rs.last.value }
      assert(records.size === 2)
      assert(records("sylvain") === "Order:iPhone12Pro|UserRegion:sylvain-France")
      assert(records("lise") === "Order:PixelA4|UserRegion:lise-?")
    } finally driver.close()
  }

  // ---- TimeWindowKStreamAggTests ------------------------------------------

  test("TimeWindowKStreamAggTests.TimeWindowingAgg: per-update max-length aggregate in one window") {
    val driver = new TopologyTestDriver(spark)
    try {
      val input = driver.createInputTopic[String, String]()
      val agg = input.stream.groupByKey
        .windowedBy(TumblingWindow.of(20000L))
        .aggregate(() => 0)((_, v: String, acc) => math.max(v.length, acc))
      val out = driver.createOutputTopic(agg.toStream, "tk2_wagg_out",
        outputMode = "update")

      input.pipeInput("test", "1")
      input.pipeInput("test", "230")
      input.pipeInput("test", "32")
      val els = out.readKeyValueList()
      assert(els.size === 3)
      assert(els.forall(_.key.key === "test"))
      assert(els.forall(r => r.key.end.getTime - r.key.start.getTime === 20000L))
      assert(els.map(_.value) === Seq(1, 3, 3))
      assert(els.map(_.key.start).distinct.size === 1)
    } finally driver.close()
  }

  test("TimeWindowKStreamAggTests.TimeWindowingQueryStoreAll: window store holds the final aggregate") {
    val driver = new TopologyTestDriver(spark)
    try {
      val input = driver.createInputTopic[String, String]()
      val agg = input.stream.groupByKey
        .windowedBy(TumblingWindow.of(2000L))
        .aggregate(() => 0)((_, v: String, acc) => math.max(v.length, acc))
      driver.materializeStore(agg, "tk2_wagg_store")

      input.pipeInput("test", "1")
      input.pipeInput("test", "2567")
      input.pipeInput("test", "32")

      val store = driver.getWindowStore[String, Int]("tk2_wagg_store")
      val els = store.all()
      assert(els.size === 1)
      val (k, start, end, v) = els.head
      assert(k === "test" && v === 4)
      assert(end.getTime - start.getTime === 2000L)
    } finally driver.close()
  }

  test("TimeWindowKStreamAggTests.TimeWindowingQueryStore2Window: aggregates split across windows") {
    val driver = new TopologyTestDriver(spark)
    try {
      val input = driver.createInputTopic[String, String]()
      val agg = input.stream.groupByKey
        .windowedBy(TumblingWindow.of(2000L))
        .aggregate(() => 0)((_, v: String, acc) => math.max(v.length, acc))
      driver.materializeStore(agg, "tk2_wagg2_store")

      input.pipeInput("test", "1", ts(1000))
      input.pipeInput("test", "2300", ts(1000))
      input.pipeInput("test", "3", ts(61000))

      val store = driver.getWindowStore[String, Int]("tk2_wagg2_store")
      val byStart = store.all().map { case (k, s, e, v) =>
        assert(k === "test" && e.getTime - s.getTime === 2000L)
        s.getTime -> v
      }.toMap
      assert(byStart === Map(0L -> 4, 60000L -> 1))
    } finally driver.close()
  }
}

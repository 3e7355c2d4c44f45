package graft.testkit

import graft.SparkSpec
import graft.dsl.{JoinWindows, StreamsBuilder, TumblingWindow}

/** Acceptance tests, fourth batch: join and aggregation reference suites
  * replayed through the packaged testkit.
  *
  * Ported suites:
  *  - KStreamKStreamLeftJoinTests (`test/.../KStreamKStreamLeftJoinTests.cs:19-310`)
  *  - KStreamKStreamOuterJoinTests (`KStreamKStreamOuterJoinTests.cs:20-320`)
  *  - KStreamTableLeftJoinTests (`KStreamTableLeftJoinTests.cs:20-247`)
  *  - KStreamGlobalTableLeftJoinTests (`KStreamGlobalTableLeftJoinTests.cs:24-124`)
  *  - KTableKTableOuterJoinTests (`KTableKTableOuterJoinTests.cs:18-253`)
  *  - TableTableMergeJoinTests (`TableTableMergeJoinTests.cs:13-105`)
  *  - KStreamGroupByTests (`KStreamGroupByTests.cs:27-82`)
  *  - KGroupedStreamCountTests (`KGroupedStreamCountTests.cs:107-241`)
  *  - KGroupedStreamAggTests (`KGroupedStreamAggTests.cs:137-345`)
  *  - KGroupedTableCountTests (`KGroupedTableCountTests.cs:114-276`)
  *  - KGroupedTableReduceTests (`KGroupedTableReduceTests.cs:113-312`)
  *  - TimeWindowKStreamReduceTests (`TimeWindowKStreamReduceTests.cs:104-303`)
  *
  * Divergence exercised here (SURVEY §2.5): the reference emits the
  * null-padded side of left/outer stream-stream joins eagerly; this engine
  * emits it exactly once, after the watermark closes the join window.
  * Reference suites use `char` keys in places; Spark has no Char encoder, so
  * single-char strings carry those keys.
  */
class TopologyTestDriverSpec4 extends SparkSpec {
  import spark.implicits._

  test("KStreamKStreamLeftJoinTests.StreamStreamLeftJoin: match emits; no-match pads after close") {
    val driver = new TopologyTestDriver(spark)
    try {
      val topic1 = driver.createInputTopic[String, String]()
      val topic2 = driver.createInputTopic[String, String]()
      val joined = topic2.stream.leftJoin(topic1.stream, JoinWindows.of(10000L)) {
        (s, v) => s"$s-${v.getOrElse("")}"
      }
      val out = driver.createOutputTopic(joined, "tk4_sslj_out")

      // StreamStreamLeftJoin: both sides present -> joined row
      topic1.pipeInput("test", "test")
      topic2.pipeInput("test", "coucou")
      val rec = out.readKeyValue()
      assert(rec.isDefined && rec.get.key === "test" && rec.get.value === "coucou-test")

      // StreamStreamLeftJoinWithNoRecordInRigthJoin: left-only record pads
      // once the watermark passes its window (reference pads eagerly)
      topic2.pipeInput("lonely", "coucou")
      assert(out.readKeyValueList().isEmpty) // window still open: nothing yet
      topic1.pipeInput("wm", "x", ts(100000))
      topic2.pipeInput("wm", "y", ts(100000))
      val padded = out.readKeyValueList().filter(_.key == "lonely")
      assert(padded.map(r => r.key -> r.value) === Seq("lonely" -> "coucou-"))
    } finally driver.close()
  }

  test("KStreamKStreamJoinTests.StreamStreamJoinWithNoRecordInRigthJoin: inner join stays silent") {
    val driver = new TopologyTestDriver(spark)
    try {
      val topic1 = driver.createInputTopic[String, String]()
      val topic2 = driver.createInputTopic[String, String]()
      val joined = topic2.stream.join(topic1.stream, JoinWindows.of(10000L)) {
        (s, v) => s"$s-$v"
      }
      val out = driver.createOutputTopic(joined, "tk4_ssij_nomatch_out")

      topic2.pipeInput("test", "coucou")
      assert(out.isEmpty)
      // even after the window closes, an unmatched inner-join record never
      // emits (unlike leftJoin's padded row)
      topic1.pipeInput("wm", "x", ts(100000))
      topic2.pipeInput("wm", "y", ts(100000))
      assert(out.readKeyValueList().forall(_.key == "wm"))
    } finally driver.close()
  }

  test("KStreamKStreamOuterJoinTests.StreamStreamOuterJoin: either side pads after close") {
    val driver = new TopologyTestDriver(spark)
    try {
      val topic1 = driver.createInputTopic[String, String]()
      val topic2 = driver.createInputTopic[String, String]()
      val joined = topic2.stream.outerJoin(topic1.stream, JoinWindows.of(10000L)) {
        (s, v) => s"${s.getOrElse("")}-${v.getOrElse("")}"
      }
      val out = driver.createOutputTopic(joined, "tk4_ssoj_out")

      // StreamStreamOuterJoin: matched pair joins (the reference also emits
      // an eager "-test" before the match arrives; final results here)
      topic1.pipeInput("test", "test")
      topic2.pipeInput("test", "coucou")
      assert(out.readKeyValueList().map(r => r.key -> r.value) ===
        Seq("test" -> "coucou-test"))

      // WithNoRecordInRigthJoin / InLeftJoin: lone records on either side
      // pad their missing half after the window closes
      topic2.pipeInput("left2", "coucou2")
      topic1.pipeInput("right2", "test2")
      topic1.pipeInput("wm", "x", ts(100000))
      topic2.pipeInput("wm", "y", ts(100000))
      val flushed = out.readKeyValueList().filter(r => r.key.endsWith("2"))
      assert(flushed.map(r => r.key -> r.value).toSet ===
        Set("left2" -> "coucou2-", "right2" -> "-test2"))
    } finally driver.close()
  }

  test("KStreamTableLeftJoinTests.StreamTableLeftJoin: missing table row pads immediately") {
    val driver = new TopologyTestDriver(spark)
    try {
      val tableTopic = driver.createInputTopic[String, String]()
      val streamTopic = driver.createInputTopic[String, String]()
      val joined = streamTopic.stream.leftJoin(tableTopic.table) {
        (s, v) => s"$s-${v.getOrElse("")}"
      }
      val out = driver.createOutputTopic(joined, "tk4_stlj_out")

      tableTopic.pipeInput("test", "test")
      streamTopic.pipeInput("test", "coucou")
      streamTopic.pipeInput("test-sylvain", "1234")
      assert(out.readKeyValueList().map(r => r.key -> r.value) ===
        Seq("test" -> "coucou-test", "test-sylvain" -> "1234-"))
    } finally driver.close()
  }

  test("KStreamGlobalTableLeftJoinTests: present key enriches, absent key pads") {
    val driver = new TopologyTestDriver(spark)
    try {
      val builder = new StreamsBuilder(spark)
      val global = builder.globalTable(Seq(("test", "test")).toDS())
      val in = driver.createInputTopic[String, String]()
      val joined = in.stream.leftJoin(global, (k: String, _: String) => k) {
        (s, v) => s"$s-${v.getOrElse("")}"
      }
      val out = driver.createOutputTopic(joined, "tk4_glj_out")

      // KStreamGlobalLeftJoinOK
      in.pipeInput("test", "coucou")
      val rec = out.readKeyValue()
      assert(rec.isDefined && rec.get.key === "test" && rec.get.value === "coucou-test")
      // KStreamGlobalLeftJoinNull: key absent from the global table
      in.pipeInput("unknown", "coucou")
      val rec2 = out.readKeyValue()
      assert(rec2.isDefined && rec2.get.key === "unknown" && rec2.get.value === "coucou-")
    } finally driver.close()
  }

  test("KTableKTableOuterJoinTests.TableTableOuterJoin: either side alone emits padded") {
    val driver = new TopologyTestDriver(spark)
    try {
      val topic1 = driver.createInputTopic[String, String]()
      val topic2 = driver.createInputTopic[String, String]()
      val joined = topic1.table.outerJoin(topic2.table) {
        (v1, v2) => s"${v1.getOrElse("")}-${v2.getOrElse("")}"
      }
      val out = driver.createOutputTopic(joined.toStream, "tk4_ttoj_out")

      topic1.pipeInput("test", "test")
      topic2.pipeInput("test", "coucou")
      topic1.pipeInput("test2", "test2")
      topic2.pipeInput("test3", "test3")
      val records = out.readKeyValueList().groupBy(_.key)
        .map { case (k, rs) => k -> rs.last.value }
      assert(records.size === 3)
      assert(records("test") === "test-coucou")
      assert(records("test2") === "test2-")
      assert(records("test3") === "-test3")
    } finally driver.close()
  }

  test("KTableKTableOuterJoinTests.TableTableOuterJoinGetterSupplier: stream joins the outer table") {
    val driver = new TopologyTestDriver(spark)
    try {
      val users = driver.createInputTopic[String, String]()
      val regions = driver.createInputTopic[String, String]()
      val orders = driver.createInputTopic[String, String]()
      val userRegion = users.table.outerJoin(regions.table) {
        (v1, v2) => s"${v1.getOrElse("?")}-${v2.getOrElse("?")}"
      }
      val enriched = orders.stream.join(userRegion)(
        (order, ur) => s"Order:$order|UserRegion:$ur")
      val out = driver.createOutputTopic(enriched, "tk4_ttoj_getter_out")

      users.pipeInput("sylvain", "sylvain")
      users.pipeInput("lise", "lise")
      regions.pipeInput("sylvain", "France")
      regions.pipeInput("remi", "USA")
      orders.pipeInput("sylvain", "iPhone12Pro")
      orders.pipeInput("lise", "PixelA4")
      orders.pipeInput("remi", "Tab")

      val records = out.readKeyValueList().groupBy(_.key)
        .map { case (k, rs) => k -> rs.last.value }
      assert(records.size === 3)
      assert(records("sylvain") === "Order:iPhone12Pro|UserRegion:sylvain-France")
      assert(records("lise") === "Order:PixelA4|UserRegion:lise-?")
      assert(records("remi") === "Order:Tab|UserRegion:?-USA")
    } finally driver.close()
  }

  test("TableTableMergeJoinTests: three-table left-join chain enriches the stream") {
    val driver = new TopologyTestDriver(spark)
    try {
      val users = driver.createInputTopic[String, String]()
      val regions = driver.createInputTopic[String, String]()
      val country = driver.createInputTopic[String, String]()
      val orders = driver.createInputTopic[String, String]()
      val userRegion = users.table.leftJoin(regions.table)(
        (v1, v2) => s"$v1-${v2.getOrElse("?")}")
      val userRegionCountry = userRegion.leftJoin(country.table)(
        (v1, v2) => s"$v1-${v2.getOrElse("?")}")
      val enriched = orders.stream.join(userRegionCountry)(
        (order, urc) => s"Order:$order|UserRegionCountry:$urc")
      val out = driver.createOutputTopic(enriched, "tk4_merge_out")

      users.pipeInput("sylvain", "sylvain")
      regions.pipeInput("sylvain", "Europe")
      country.pipeInput("sylvain", "France")
      orders.pipeInput("sylvain", "iPhone12Pro")

      val records = out.readKeyValueList().groupBy(_.key)
        .map { case (k, rs) => k -> rs.last.value }
      assert(records.size === 1)
      assert(records("sylvain") ===
        "Order:iPhone12Pro|UserRegionCountry:sylvain-Europe-France")
    } finally driver.close()
  }

  test("KGroupedStreamCountTests: re-keyed count; null-valued records don't count") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      driver.materializeStore(
        in.stream.groupBy((k, _) => k.substring(0, 1)).count, "tk4_gsc_store")

      // CountAndQueryInStateStore
      in.pipeInput("test", "1")
      in.pipeInput("test", "30")
      in.pipeInput("coucou", "120")
      val store = driver.getKeyValueStore[String, Long]("tk4_gsc_store")
      assert(store.approximateNumEntries() === 2)
      assert(store.get("t") === Some(2L))
      assert(store.get("c") === Some(1L))

      // CountWithNullValue: a null value is skipped by stream aggregation
      // (`KStreamAggregateProcessor.cs:24`)
      in.pipeInput("toto", null)
      assert(store.get("t") === Some(2L))
    } finally driver.close()
  }

  test("KStreamGroupByTests.TestGroupByKeyOK: groupByKey counts under the original key") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      driver.materializeStore(in.stream.groupByKey.count, "tk4_gbk_store")
      in.pipeInput("test", "1")
      in.pipeInput("test", "30")
      in.pipeInput("coucou", "120")
      val store = driver.getKeyValueStore[String, Long]("tk4_gbk_store")
      assert(store.approximateNumEntries() === 2)
      assert(store.get("test") === Some(2L))
      assert(store.get("coucou") === Some(1L))
    } finally driver.close()
  }

  test("KGroupedStreamAggTests.AggAndQueryInStateStore: count + char-histogram aggregate") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      val grouped = in.stream.groupBy((k, _) => k.toUpperCase)
      driver.materializeStore(grouped.count, "tk4_gsa_count")
      driver.materializeStore(
        grouped.aggregate(() => Map.empty[String, Int])((_, v, old) =>
          v.foldLeft(old)((m, c) => m.updated(c.toString, m.getOrElse(c.toString, 0) + 1))),
        "tk4_gsa_agg")

      in.pipeInput("test", "1")
      in.pipeInput("test", "12")
      in.pipeInput("test", "30")
      in.pipeInput("coucou", "120")

      val agg = driver.getKeyValueStore[String, Map[String, Int]]("tk4_gsa_agg")
      assert(agg.approximateNumEntries() === 2)
      assert(agg.get("TEST") === Some(Map("1" -> 2, "2" -> 1, "3" -> 1, "0" -> 1)))
      val count = driver.getKeyValueStore[String, Long]("tk4_gsa_count")
      assert(count.get("TEST") === Some(3L))
      assert(count.get("COUCOU") === Some(1L))
    } finally driver.close()
  }

  test("KGroupedTableCountTests: tombstone subtracts; null group key is skipped upstream") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      driver.materializeStore(
        in.table.groupBy((k, v) => (k.substring(0, 1), v)).count, "tk4_gtc_store")

      // CountAndQueryInStateStore
      in.pipeInput("test", "1")
      in.pipeInput("coucou", "120")
      val store = driver.getKeyValueStore[String, Long]("tk4_gtc_store")
      assert(store.approximateNumEntries() === 2)
      assert(store.get("t") === Some(1L))
      assert(store.get("c") === Some(1L))

      // CountWithNullValue: the delete retracts test's contribution; the
      // group survives with count 0 (the reference keeps the 0 entry too)
      in.pipeInput("test", null)
      assert(store.get("t") === Some(0L))

      // CountWithNullKey: skipped at the table source
      in.pipeInput(null, "fd")
      assert(store.get("t") === Some(0L) && store.get("c") === Some(1L))
    } finally driver.close()
  }

  test("KGroupedTableReduceTests.ReduceAndQueryInStateStore: adder/subtractor max-reduce") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      val grouped = in.table.mapValues(_.length)
        .groupBy((k, v) => (k.toUpperCase, v))
      driver.materializeStore(grouped.count, "tk4_gtr_count")
      driver.materializeStore(
        grouped.reduce((v1, v2) => math.max(v1, v2), (v1, v2) => math.max(v1, v2)),
        "tk4_gtr_reduce")

      in.pipeInput("test", "1")
      in.pipeInput("test", "120")
      in.pipeInput("test", "30")
      in.pipeInput("coucou", "120")

      val reduce = driver.getKeyValueStore[String, Int]("tk4_gtr_reduce")
      assert(reduce.approximateNumEntries() === 2)
      assert(reduce.get("TEST") === Some(3))
      val count = driver.getKeyValueStore[String, Long]("tk4_gtr_count")
      assert(count.get("TEST") === Some(1L))
    } finally driver.close()
  }

  test("TimeWindowKStreamReduceTests.TimeWindowingReduce: per-update longest-value reduce") {
    val driver = new TopologyTestDriver(spark)
    try {
      val input = driver.createInputTopic[String, String]()
      val reduced = input.stream.groupByKey
        .windowedBy(TumblingWindow.of(2000L))
        .reduce((v1, v2) => if (v1.length > v2.length) v1 else v2)
      val out = driver.createOutputTopic(reduced.toStream, "tk4_wred_out",
        outputMode = "update")

      input.pipeInput("test", "1")
      input.pipeInput("test", "230")
      input.pipeInput("test", "32")
      val els = out.readKeyValueList()
      assert(els.size === 3)
      assert(els.forall(_.key.key === "test"))
      assert(els.forall(r => r.key.end.getTime - r.key.start.getTime === 2000L))
      assert(els.map(_.value) === Seq("1", "230", "230"))
    } finally driver.close()
  }

  test("TimeWindowKStreamReduceTests.TimeWindowingQueryStore2Window: reduce splits across windows") {
    val driver = new TopologyTestDriver(spark)
    try {
      val input = driver.createInputTopic[String, String]()
      val reduced = input.stream.groupByKey
        .windowedBy(TumblingWindow.of(2000L))
        .reduce((v1, v2) => if (v1.length > v2.length) v1 else v2)
      driver.materializeStore(reduced, "tk4_wred_store")

      input.pipeInput("test", "1", ts(1000))
      input.pipeInput("test", "2300", ts(1000))
      input.pipeInput("test", "3", ts(61000))

      val store = driver.getWindowStore[String, String]("tk4_wred_store")
      val byStart = store.all().map { case (k, s, e, v) =>
        assert(k === "test" && e.getTime - s.getTime === 2000L)
        s.getTime -> v
      }.toMap
      assert(byStart === Map(0L -> "2300", 60000L -> "3"))
    } finally driver.close()
  }
}

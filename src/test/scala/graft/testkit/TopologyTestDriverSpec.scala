package graft.testkit

import graft.SparkSpec
import graft.dsl.JoinWindows

/** Acceptance tests: reference operator-suite scenarios replayed through the
  * packaged testkit, record-for-record.
  *
  * Ported suites:
  *  - KStreamFilterTests (`test/.../Processors/KStreamFilterTests.cs:30-108`)
  *  - KStreamKStreamJoinTests.StreamStreamJoin (`KStreamKStreamJoinTests.cs:18-52`)
  *  - KGroupedTableAggTests.AggAndQueryInStateStore (`KGroupedTableAggTests.cs:145-205`)
  *  - KStreamBranchTests.One/MultiBranchWithElements (`KStreamBranchTests.cs:29-106`)
  *  - KStreamTableJoinTests.StreamTableJoin (`KStreamTableJoinTests.cs:17-49`)
  *  - TimeWindowKStreamCountTests.TimeWindowingCount / QueryStore2Window
  *    (`TimeWindowKStreamCountTests.cs:120-155,312-344`)
  *  - KTableKTableJoinTests.TableTableJoin/StateStore (`KTableKTableJoinTests.cs:18-124`)
  *  - KStreamGlobalTableJoinTests.KStreamGlobalJoinOK/KO
  *    (`KStreamGlobalTableJoinTests.cs:24-56,91-125`)
  *  - KGroupedStreamReduceTests.ReduceAndQueryInStateStore
  *    (`KGroupedStreamReduceTests.cs:106-148`)
  */
class TopologyTestDriverSpec extends SparkSpec {
  import spark.implicits._

  test("KStreamFilterTests: filter keeps matching records, drops the rest") {
    val driver = new TopologyTestDriver(spark)
    try {
      val in = driver.createInputTopic[String, String]()
      val out = driver.createOutputTopic(
        in.stream.filter((_, v) => v.contains("test")), "tk_filter_out")

      // KStreamFilterTests.FilterWithPredicateAndOutputTopic: key1/test1234
      // passes the predicate, key2/hello does not
      in.pipeInputs(Seq("key1" -> "test1234", "key2" -> "hello"))
      val rec = out.readKeyValue()
      assert(rec.isDefined)
      assert(rec.get.key === "key1" && rec.get.value === "test1234")
      assert(out.isEmpty)

      // KStreamFilterTests.FilterAll analog: nothing passes -> empty topic
      in.pipeInputs(Seq("key3" -> "nope", "key4" -> "nada"))
      assert(out.readKeyValueList().isEmpty && out.queueSize === 0)
    } finally driver.close()
  }

  test("KStreamKStreamJoinTests.StreamStreamJoin: records join within the window") {
    val driver = new TopologyTestDriver(spark)
    try {
      val topic1 = driver.createInputTopic[String, String]()
      val topic2 = driver.createInputTopic[String, String]()
      // topic2.Join(topic1, (s, v) => s + "-" + v, JoinWindowOptions.Of(10s))
      val joined = topic2.stream.join(topic1.stream, JoinWindows.of(10000L)) {
        (s, v) => s"$s-$v"
      }
      val out = driver.createOutputTopic(joined, "tk_join_out")

      topic1.pipeInput("test", "test")
      topic2.pipeInput("test", "coucou")
      val rec = out.readKeyValue()
      assert(rec.isDefined)
      assert(rec.get.key === "test")
      assert(rec.get.value === "coucou-test")
    } finally driver.close()
  }

  test("KGroupedTableAggTests.AggAndQueryInStateStore: count + custom aggregate stores") {
    val driver = new TopologyTestDriver(spark)
    try {
      val input = driver.createInputTopic[String, String]()
      val grouped = input.table.groupBy((k, v) => (k.toUpperCase, v))

      driver.materializeStore(grouped.count, "count-store")
      // adder counts value characters; subtractor leaves the aggregate
      // unchanged (the reference scenario's MySubAggregator)
      val agg = grouped.aggregate(() => Map.empty[String, Int])(
        (_, v, old) => v.foldLeft(old)((m, c) =>
          m.updated(c.toString, m.getOrElse(c.toString, 0) + 1)))(
        (_, _, old) => old)
      driver.materializeStore(agg, "agg-store")

      input.pipeInput("test", "1")
      input.pipeInput("test", "12")
      input.pipeInput("test", "30")
      input.pipeInput("coucou", "120")

      val store = driver.getKeyValueStore[String, Map[String, Int]]("agg-store")
      assert(store.approximateNumEntries() === 2)
      assert(store.get("TEST") ===
        Some(Map("1" -> 2, "2" -> 1, "3" -> 1, "0" -> 1)))

      val countStore = driver.getKeyValueStore[String, Long]("count-store")
      assert(countStore.get("TEST") === Some(1L))
      assert(countStore.get("COUCOU") === Some(1L))
    } finally driver.close()
  }

  test("KStreamBranchTests: one-branch passthrough and even/odd multi-branch") {
    val driver = new TopologyTestDriver(spark)
    try {
      // OneBranchWithElements: a single always-true branch forwards all 10
      // records in order
      val inAll = driver.createInputTopic[String, String]()
      val Seq(b0) = inAll.stream.branch((_, _) => true)
      val outAll = driver.createOutputTopic(b0, "tk_branch_all")
      val expected = (0 until 10).map(i => i.toString -> s"value-$i")
      inAll.pipeInputs(expected)
      assert(outAll.readKeyValueList().map(r => r.key -> r.value) === expected)

      // MultiBranchWithElements: v % 2 == 0 vs v % 2 > 0 split to two topics
      val inNum = driver.createInputTopic[String, Int]()
      val Seq(pair, impair) = inNum.stream.branch(
        (_, v) => v % 2 == 0, (_, v) => v % 2 > 0)
      val outPair = driver.createOutputTopic(pair, "tk_branch_pair")
      val outImpair = driver.createOutputTopic(impair, "tk_branch_impair")
      inNum.pipeInputs((0 until 10).map(i => i.toString -> i))
      assert(outPair.readKeyValueList().map(r => r.key -> r.value) ===
        (0 until 10 by 2).map(i => i.toString -> i))
      assert(outImpair.readKeyValueList().map(r => r.key -> r.value) ===
        (1 until 10 by 2).map(i => i.toString -> i))
    } finally driver.close()
  }

  test("KStreamTableJoinTests.StreamTableJoin: stream record joins the table's current value") {
    val driver = new TopologyTestDriver(spark)
    try {
      val tableTopic = driver.createInputTopic[String, String]()
      val streamTopic = driver.createInputTopic[String, String]()
      val joined = streamTopic.stream.join(tableTopic.table) {
        (s, v) => s"$s-$v"
      }
      val out = driver.createOutputTopic(joined, "tk_st_join_out")

      tableTopic.pipeInput("test", "test")
      streamTopic.pipeInput("test", "coucou")
      val rec = out.readKeyValue()
      assert(rec.isDefined)
      assert(rec.get.key === "test" && rec.get.value === "coucou-test")
      // table updates alone produce no output (enrichment is stream-driven)
      tableTopic.pipeInput("test", "later")
      assert(out.isEmpty)
    } finally driver.close()
  }

  test("TimeWindowKStreamCountTests.TimeWindowingCount: per-update counts in one window") {
    val driver = new TopologyTestDriver(spark)
    try {
      val input = driver.createInputTopic[String, String]()
      val counts = input.stream.groupByKey
        .windowedBy(graft.dsl.TumblingWindow.of(10000L)).count
      val out = driver.createOutputTopic(
        counts.toStream, "tk_window_out", outputMode = "update")

      input.pipeInput("test", "1")
      input.pipeInput("test", "2")
      input.pipeInput("test", "3")
      val els = out.readKeyValueList()
      assert(els.size === 3)
      assert(els.forall(_.key.key === "test"))
      assert(els.forall(r => r.key.end.getTime - r.key.start.getTime === 10000L))
      assert(els.map(_.value) === Seq(1L, 2L, 3L))
      assert(els.map(_.key.start).distinct.size === 1)
    } finally driver.close()
  }

  test("TimeWindowKStreamCountTests.QueryStore2Window: records split across two windows") {
    val driver = new TopologyTestDriver(spark)
    try {
      val input = driver.createInputTopic[String, String]()
      val counts = input.stream.groupByKey
        .windowedBy(graft.dsl.TumblingWindow.of(5000L)).count
      val out = driver.createOutputTopic(
        counts.toStream, "tk_window2_out", outputMode = "update")

      // dt, dt, dt + 1 minute (reference pipes explicit timestamps)
      input.pipeInput("test", "1", ts(1000))
      input.pipeInput("test", "2", ts(1000))
      input.pipeInput("test", "3", ts(61000))
      val finalByWindow = out.readKeyValueList()
        .groupBy(_.key.start).map { case (s, rs) => s -> rs.last.value }
      assert(finalByWindow === Map(ts(0) -> 2L, ts(60000) -> 1L))
    } finally driver.close()
  }

  test("TimeWindowKStreamCountTests.QueryStoreAll: window store fetch/all") {
    val driver = new TopologyTestDriver(spark)
    try {
      val input = driver.createInputTopic[String, String]()
      val counts = input.stream.groupByKey
        .windowedBy(graft.dsl.TumblingWindow.of(10000L)).count
      driver.materializeStore(counts, "tk_window_store")

      input.pipeInput("test", "1")
      input.pipeInput("test", "2")
      input.pipeInput("test", "3")

      val store = driver.getWindowStore[String, Long]("tk_window_store")
      val els = store.all()
      assert(els.size === 1)
      val (k, start, end, cnt) = els.head
      assert(k === "test" && cnt === 3L)
      assert(end.getTime - start.getTime === 10000L)
      assert(store.fetch("test", 0L, 10000L) === Seq((start, 3L)))
      assert(store.fetch("test", 20000L, 30000L).isEmpty)
    } finally driver.close()
  }

  test("KTableKTableJoinTests.TableTableJoin: both sides upserted, join emits and stores") {
    val driver = new TopologyTestDriver(spark)
    try {
      val topic1 = driver.createInputTopic[String, String]()
      val topic2 = driver.createInputTopic[String, String]()
      val joined = topic1.table.join(topic2.table)((v1, v2) => s"$v1-$v2")
      // the changelog join emits append-mode changelog events
      val out = driver.createOutputTopic(joined.toStream, "tk_tt_join_out")
      driver.materializeStore(joined, "merge-store")

      topic1.pipeInput("test", "test")
      // only one side present: inner join emits nothing yet
      assert(out.isEmpty)
      topic2.pipeInput("test", "coucou")
      val rec = out.readKeyValue()
      assert(rec.isDefined)
      assert(rec.get.key === "test" && rec.get.value === "test-coucou")

      // TableTableJoinStateStore: the merged store holds the joined value
      val store = driver.getKeyValueStore[String, String]("merge-store")
      assert(store.approximateNumEntries() === 1)
      assert(store.get("test") === Some("test-coucou"))
    } finally driver.close()
  }

  test("KStreamGlobalTableJoinTests: global join enriches, missing key drops") {
    val driver = new TopologyTestDriver(spark)
    try {
      // our GlobalKTable is a broadcast snapshot (stream-static join; the
      // refresh divergence is documented on GlobalKTable) — the reference's
      // pipe-into-global-topic setup maps to the snapshot's content
      val builder = new graft.dsl.StreamsBuilder(spark)
      val global = builder.globalTable(Seq(("test", "test")).toDS())
      val in = driver.createInputTopic[String, String]()
      val joined = in.stream.join(global, (k: String, _: String) => k) {
        (s, v) => s"$s-$v"
      }
      val out = driver.createOutputTopic(joined, "tk_global_join_out")

      // KStreamGlobalJoinOK: key present in the global table
      in.pipeInput("test", "coucou")
      val rec = out.readKeyValue()
      assert(rec.isDefined)
      assert(rec.get.key === "test" && rec.get.value === "coucou-test")

      // KStreamGlobalJoinKO: key absent -> inner join drops the record
      in.pipeInput("unknown", "coucou")
      assert(out.isEmpty)
    } finally driver.close()
  }

  test("KGroupedStreamReduceTests.ReduceAndQueryInStateStore: re-keyed count + max reduce") {
    val driver = new TopologyTestDriver(spark)
    try {
      val input = driver.createInputTopic[String, String]()
      val grouped = input.stream
        .mapValues(_.length)
        .groupBy((k, _) => k.toUpperCase)
      driver.materializeStore(grouped.count, "count-store")
      driver.materializeStore(grouped.reduce((v1, v2) => math.max(v1, v2)), "reduce-store")

      input.pipeInput("test", "1")
      input.pipeInput("test", "120")
      input.pipeInput("test", "30")
      input.pipeInput("coucou", "120")

      val reduceStore = driver.getKeyValueStore[String, Int]("reduce-store")
      assert(reduceStore.approximateNumEntries() === 2)
      assert(reduceStore.get("TEST") === Some(3))

      val countStore = driver.getKeyValueStore[String, Long]("count-store")
      assert(countStore.get("TEST") === Some(3L))
      assert(countStore.get("COUCOU") === Some(1L))
    } finally driver.close()
  }
}

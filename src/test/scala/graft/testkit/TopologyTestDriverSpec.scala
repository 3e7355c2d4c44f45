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
}

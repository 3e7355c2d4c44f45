package graft.dsl

import graft.SparkSpec

/** Windowed aggregation semantics (TimeWindowKStreamCountTests analogs,
  * SURVEY §2.7): tumbling/hopping/session windows; window bounds [start, end).
  */
class WindowedSpec extends SparkSpec {
  import spark.implicits._

  private def stream(rows: (String, Int, Long)*): KStream[String, Int] =
    new KStream(rows.map { case (k, v, t) => KV(k, v, ts(t)) }.toDS())

  test("tumbling window count: records fall in [start, start+size)") {
    // tumbling 2000ms like TimeWindowKStreamCountTests.cs:40-47
    val s = stream(("k", 1, 0), ("k", 1, 1999), ("k", 1, 2000), ("x", 1, 500))
    val out = s.groupByKey.windowedBy(TumblingWindow.of(2000)).count
      .changelog.collect()
      .map(u => (u.key.key, u.key.start.getTime, u.value.get)).sorted
    assert(out === Array(("k", 0L, 2L), ("k", 2000L, 1L), ("x", 0L, 1L)))
  }

  test("hopping window: each record lands in size/advance windows") {
    val s = stream(("k", 1, 2500))
    val out = s.groupByKey.windowedBy(HoppingWindow.of(2000, 1000)).count
      .changelog.collect().map(u => u.key.start.getTime).sorted
    assert(out === Array(1000L, 2000L)) // windows [1000,3000) and [2000,4000)
  }

  test("windowed aggregate folds per (key, window)") {
    val s = stream(("k", 2, 100), ("k", 3, 200), ("k", 10, 2500))
    val out = s.groupByKey.windowedBy(TumblingWindow.of(2000))
      .aggregate(() => 0)((_, v, acc) => acc + v)
      .changelog.collect().map(u => (u.key.start.getTime, u.value.get)).sorted
    assert(out === Array((0L, 5), (2000L, 10)))
  }

  test("windowed reduce") {
    val s = stream(("k", 2, 100), ("k", 3, 200))
    val out = s.groupByKey.windowedBy(TumblingWindow.of(2000)).reduce(_ max _)
      .changelog.collect().map(u => u.value.get)
    assert(out === Array(3))
  }

  test("windowsFor explode agrees with Spark's native window() assignment") {
    // aggregate(+1) must equal count for every (key, window) — count uses
    // Catalyst window(), aggregate uses the hand-rolled WindowsFor explode
    val rows = (0 until 50).map(i => ("k" + (i % 3), 1, i * 337L))
    val s = stream(rows: _*)
    val w = HoppingWindow.of(2000, 500)
    val viaCount = s.groupByKey.windowedBy(w).count.changelog.collect()
      .map(u => (u.key.key, u.key.start.getTime, u.value.get)).sorted
    val viaAgg = s.groupByKey.windowedBy(w)
      .aggregate(() => 0L)((_, _, acc) => acc + 1L).changelog.collect()
      .map(u => (u.key.key, u.key.start.getTime, u.value.get)).sorted
    assert(viaAgg === viaCount)
  }

  test("sliding window count: [t-size, t] inclusive, one window per distinct ts") {
    // size 1000: windows end at each record ts
    val s = stream(("k", 1, 0), ("k", 1, 500), ("k", 1, 1000), ("k", 1, 1500),
      ("k", 1, 1500)) // duplicate ts -> single window row
    val out = s.groupByKey.windowedBy(SlidingWindow.of(1000)).count
      .changelog.collect()
      .map(u => (u.key.end.getTime, u.value.get)).sorted
    // t=0: {0}; t=500: {0,500}; t=1000: {0,500,1000} (inclusive left edge);
    // t=1500: {500,1000,1500,1500}
    assert(out === Array((0L, 1L), (500L, 2L), (1000L, 3L), (1500L, 4L)))
  }

  test("sliding window aggregate folds events in event-time order") {
    val s = stream(("k", 1, 0), ("k", 2, 500), ("k", 3, 1200))
    val out = s.groupByKey.windowedBy(SlidingWindow.of(1000))
      .aggregate(() => "")((_, v, acc) => acc + v)
      .changelog.collect()
      .map(u => (u.key.end.getTime, u.value.get)).sorted
    // t=0: "1"; t=500: "12"; t=1200: {500,1200} -> "23" (0 aged out)
    assert(out === Array((0L, "1"), (500L, "12"), (1200L, "23")))
  }

  test("sliding window reduce") {
    val s = stream(("k", 5, 0), ("k", 7, 400))
    val out = s.groupByKey.windowedBy(SlidingWindow.of(1000)).reduce(_ max _)
      .changelog.collect().map(u => (u.key.end.getTime, u.value.get)).sorted
    assert(out === Array((0L, 5), (400L, 7)))
  }

  test("session aggregate folds merged sessions in event-time order") {
    val s = stream(("k", 1, 0), ("k", 2, 20), ("k", 3, 100))
    val out = s.groupByKey
      .windowedBy(SessionWindow(java.time.Duration.ofMillis(30)))
      .aggregate(() => "")((_, v, acc) => acc + v)
      .changelog.collect()
      .map(u => (u.key.start.getTime, u.value.get)).sorted
    // events 0 and 20 merge (gap 30); 100 starts a new session
    assert(out === Array((0L, "12"), (100L, "3")))
  }

  test("session window: 30-unit gap merges nearby events") {
    val s = stream(("k", 1, 0), ("k", 1, 20), ("k", 1, 100), ("y", 1, 5))
    val out = s.groupByKey.windowedBy(SessionWindow(java.time.Duration.ofMillis(30)))
      .count.changelog.collect()
      .map(u => (u.key.key, u.value.get)).sorted
    assert(out === Array(("k", 1L), ("k", 2L), ("y", 1L)))
  }
}

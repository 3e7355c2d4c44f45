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

  // the reference's CustomWindowTests.cs DailyTimeWindows: one daily window
  // anchored at 18:00 UTC containing each record
  // no outer capture: the lambda must serialize without the spec instance
  private val daily18: Long => Seq[(Long, Long)] = { tsMs =>
    val day = 86400000L
    val start = tsMs - java.lang.Math.floorMod(tsMs - 18L * 3600000L, day)
    Seq((start, start + day))
  }
  private def utc(y: Int, mo: Int, d: Int, h: Int, mi: Int): Long =
    java.time.LocalDateTime.of(y, mo, d, h, mi)
      .toInstant(java.time.ZoneOffset.UTC).toEpochMilli

  test("custom window: daily 18:00-anchored sums land in one window (CustomWindowTests)") {
    // ShouldSumNumbersOnSameDay: 16:29(1) 16:30(2) 16:31(7) -> [12-31T18, 01-01T18) = 10
    val s = stream(
      ("k", 1, utc(2019, 1, 1, 16, 29)),
      ("k", 2, utc(2019, 1, 1, 16, 30)),
      ("k", 7, utc(2019, 1, 1, 16, 31)))
    val out = s.groupByKey
      .windowedBy(CustomWindow(daily18, java.time.Duration.ofDays(1)))
      .aggregate(() => 0)((_, v, acc) => acc + v)
      .changelog.collect().map(u => (u.key.start.getTime, u.key.end.getTime, u.value.get))
    assert(out.toSeq === Seq(
      (utc(2018, 12, 31, 18, 0), utc(2019, 1, 1, 18, 0), 10)))
  }

  test("custom window: records crossing the 18:00 anchor split into two windows") {
    // ShouldSumNumbersWithTwoWindows: 16:29(1) 16:30(2) | 19:31(7)
    val s = stream(
      ("k", 1, utc(2019, 1, 1, 16, 29)),
      ("k", 2, utc(2019, 1, 1, 16, 30)),
      ("k", 7, utc(2019, 1, 1, 19, 31)))
    val out = s.groupByKey
      .windowedBy(CustomWindow(daily18, java.time.Duration.ofDays(1)))
      .aggregate(() => 0)((_, v, acc) => acc + v)
      .changelog.collect()
      .map(u => (u.key.start.getTime, u.value.get)).sortBy(_._1)
    assert(out.toSeq === Seq(
      (utc(2018, 12, 31, 18, 0), 3), (utc(2019, 1, 1, 18, 0), 7)))
    // count rides the same fold (no native window() grid for custom shapes)
    val counts = s.groupByKey
      .windowedBy(CustomWindow(daily18, java.time.Duration.ofDays(1)))
      .count.changelog.collect()
      .map(u => (u.key.start.getTime, u.value.get)).sortBy(_._1)
    assert(counts.toSeq === Seq(
      (utc(2018, 12, 31, 18, 0), 2L), (utc(2019, 1, 1, 18, 0), 1L)))
  }

  test("custom window streaming: grace admits in-grace stragglers, drops past-close rows") {
    // the ShouldSumNumbersWithTwoWindowsAndLateArrival shape, with the
    // END-based close rule this engine shares with Apache Kafka Streams
    // and Spark's native window(): a window admits stragglers until
    // stream time passes end + grace. DOCUMENTED DIVERGENCE from the
    // reference, which drops any record older than streamTime - grace
    // even while its window is open (its own comment calls the 16:35
    // record late at stream time 18:31 under a 90-minute grace, although
    // the window does not close until 19:30).
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val in = MemoryStream[(String, Int, Long)]
    val table = new KStream(in.toDS().map { case (k, v, t) =>
      KV(k, v, new java.sql.Timestamp(t)) })
      .groupByKey
      .windowedBy(CustomWindow(daily18, java.time.Duration.ofDays(1),
        grace = java.time.Duration.ofMinutes(90)))
      .aggregate(() => 0)((_, v, acc) => acc + v)
    val q = table.changelog.writeStream.format("memory")
      .queryName("t_custom_window").outputMode("update").start()
    in.addData(
      ("k", 1, utc(2019, 1, 1, 16, 29)),
      ("k", 2, utc(2019, 1, 1, 16, 30)))
    q.processAllAvailable()
    in.addData(("k", 2, utc(2019, 1, 1, 18, 1)))   // opens day-2 window
    q.processAllAvailable()
    in.addData(("k", 7, utc(2019, 1, 1, 16, 31)))  // out-of-order, in grace
    q.processAllAvailable()
    in.addData(("k", 40, utc(2019, 1, 1, 18, 31))) // stream time 18:31
    q.processAllAvailable()
    in.addData(("k", 42, utc(2019, 1, 1, 16, 35))) // 18:31 < 19:30 close: IN
    q.processAllAvailable()
    in.addData(("k", 5, utc(2019, 1, 1, 20, 0)))   // stream time 20:00 > 19:30
    q.processAllAvailable()
    in.addData(("k", 9, utc(2019, 1, 1, 16, 40)))  // past close: dropped
    q.processAllAvailable()
    q.stop()
    val w1 = utc(2018, 12, 31, 18, 0)
    val w2 = utc(2019, 1, 1, 18, 0)
    val finalSums = spark.table("t_custom_window")
      .groupBy("key.start").agg(org.apache.spark.sql.functions.max("value"))
      .collect().map(r => (r.getTimestamp(0).getTime, r.getInt(1))).toMap
    assert(finalSums(w1) === 52, "in-grace straggler lands (1+2+7+42)")
    assert(finalSums(w2) === 47, "2+40+5")
    // the past-close record updated nothing: w1's last update stays 52
    assert(!spark.table("t_custom_window").collect()
      .exists(r => r.getAs[org.apache.spark.sql.Row]("key")
        .getAs[java.sql.Timestamp]("start").getTime == w1 && r.getAs[Int]("value") > 52))
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

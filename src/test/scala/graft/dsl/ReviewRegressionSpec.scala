package graft.dsl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** Regressions for review findings: upsert tie-breaks, timestamp carry under
  * late batches, stream-static joins, windowed-aggregate grace, pre-epoch
  * window assignment.
  */
class ReviewRegressionSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private var queries: List[StreamingQuery] = Nil
  override def afterAll(): Unit = {
    queries.foreach(q => if (q.isActive) q.stop()); super.afterAll()
  }

  test("toTable equal-timestamp ties: LAST write wins within a batch") {
    val s = new KStream(Seq(
      KV("k", "first", ts(100)), KV("k", "second", ts(100))).toDS().coalesce(1))
    assert(s.toTable.view.collect().toMap === Map("k" -> "second"))
  }

  test("aggregate ts never regresses on a late batch (downstream views stay fresh)") {
    val in = MemoryStream[(String, Int, Long)]
    val agg = new KStream(in.toDS().map { case (k, v, t) =>
      KV(k, v, new java.sql.Timestamp(t)) })
      .groupByKey.aggregate(() => 0)((_, v, acc) => acc + v)
    val q = agg.changelog.writeStream.format("memory").queryName("t_latefresh")
      .outputMode("update").start()
    queries = q :: queries

    in.addData(("k", 1, 1000L)); q.processAllAvailable()
    in.addData(("k", 10, 500L)); q.processAllAvailable() // late record

    val rows = spark.table("t_latefresh").as[Upsert[String, Int]].collect()
    // the late batch's output must carry ts = 1000 (not 500) so max-ts views
    // can pick it; rows arrive in batch order, so the LAST max-ts row is the
    // late batch's emission
    assert(rows.map(_.ts.getTime).max === 1000L)
    val fresh = rows.filter(_.ts.getTime == 1000L).last
    assert(fresh.value.get === 11)
  }

  test("streaming KStream joins a STATIC KTable (stream-static path)") {
    val in = MemoryStream[(String, String, Long)]
    val staticTable = new KTable(Seq(
      Upsert("k", Some("dim"), ts(1)),
      Upsert[String, String]("gone", None, ts(2))).toDS())
    val s = new KStream(in.toDS().map { case (k, v, t) =>
      KV(k, v, new java.sql.Timestamp(t)) })
    val joined = s.leftJoin(staticTable)((v, t) => s"$v@${t.getOrElse("null")}")
    val q = joined.ds.writeStream.format("memory").queryName("t_ss_static")
      .outputMode("append").start()
    queries = q :: queries

    in.addData(("k", "a", 100L), ("gone", "b", 100L), ("x", "c", 100L))
    q.processAllAvailable()
    val out = spark.table("t_ss_static").as[KV[String, String]].collect()
      .map(r => (r.key, r.value)).sorted
    assert(out === Array(("gone", "b@null"), ("k", "a@dim"), ("x", "c@null")))
  }

  test("windowed AGGREGATE admits an out-of-order record while its window is open") {
    // lateness is measured from the WINDOW END + grace (the reference's
    // GracePeriodMs and the native count path), NOT from the record ts — an
    // out-of-order record whose window hasn't closed must still fold in
    val in = MemoryStream[(String, Int, Long)]
    val agg = new KStream(in.toDS().map { case (k, v, t) =>
      KV(k, v, new java.sql.Timestamp(t)) })
      .groupByKey
      .windowedBy(TumblingWindow.of(2000))
      .aggregate(() => 0)((_, v, acc) => acc + v)
    val q = agg.changelog.writeStream.format("memory").queryName("t_wagg_admit")
      .outputMode("update").start()
    queries = q :: queries

    in.addData(("k", 5, 1000L)); q.processAllAvailable()
    // same-ts arrival in a LATER batch: window [0,2000) is still open
    in.addData(("k", 100, 1000L)); q.processAllAvailable()
    val rows = spark.table("t_wagg_admit").as[Upsert[Windowed[String], Int]].collect()
    val w0 = rows.filter(_.key.start.getTime == 0L).map(_.value.get)
    assert(w0.max === 105)
  }

  test("windowed AGGREGATE drops grace-late records in streaming (not just count)") {
    val in = MemoryStream[(String, Int, Long)]
    val agg = new KStream(in.toDS().map { case (k, v, t) =>
      KV(k, v, new java.sql.Timestamp(t)) })
      .groupByKey
      .windowedBy(TumblingWindow(java.time.Duration.ofMillis(2000),
        java.time.Duration.ofMillis(1000)))
      .aggregate(() => 0)((_, v, acc) => acc + v)
    val q = agg.changelog.writeStream.format("memory").queryName("t_wagg_grace")
      .outputMode("update").start()
    queries = q :: queries

    in.addData(("k", 5, 500L)); q.processAllAvailable()
    in.addData(("k", 1, 20000L)); q.processAllAvailable() // watermark -> 19000
    in.addData(("k", 100, 600L)); q.processAllAvailable() // late beyond grace
    val rows = spark.table("t_wagg_grace").as[Upsert[Windowed[String], Int]].collect()
    val w0 = rows.filter(_.key.start.getTime == 0L).map(_.value.get)
    assert(w0.max === 5) // the late 100 never entered window [0,2000)
  }

  test("windowed AGGREGATE closes at end + grace exactly (no double grace)") {
    // The reference closes a window once streamTime ≥ end + grace
    // (closeTime = streamTime − grace, drop when end ≤ closeTime); a buggy
    // close check of `end + grace < watermark-derived streamTime − grace`
    // would keep admitting until end + 2·grace. Timestamps are offset from
    // epoch so the watermark is established (> 0) at every step.
    val in = MemoryStream[(String, Int, Long)]
    val agg = new KStream(in.toDS().map { case (k, v, t) =>
      KV(k, v, new java.sql.Timestamp(t)) })
      .groupByKey
      .windowedBy(TumblingWindow(java.time.Duration.ofMillis(2000),
        java.time.Duration.ofMillis(1000)))                  // size 2s, grace 1s
      .aggregate(() => 0)((_, v, acc) => acc + v)
    val q = agg.changelog.writeStream.format("memory").queryName("t_wagg_bound")
      .outputMode("update").start()
    queries = q :: queries

    // window [100000, 102000): end = 102000, end+grace = 103000
    in.addData(("k", 5, 100500L)); q.processAllAvailable()
    in.addData(("k", 1, 102999L)); q.processAllAvailable() // streamTime just BELOW end+grace
    in.addData(("k", 7, 100700L)); q.processAllAvailable() // window still open -> folds in
    in.addData(("k", 1, 103500L)); q.processAllAvailable() // streamTime in (end+grace, end+2·grace]
    in.addData(("k", 100, 100600L)); q.processAllAvailable() // window closed -> dropped
    val rows = spark.table("t_wagg_bound").as[Upsert[Windowed[String], Int]].collect()
    val w0 = rows.filter(_.key.start.getTime == 100000L).map(_.value.get)
    assert(w0.max === 12) // 5 + 7 admitted; the 100 after close never entered
  }

  test("pre-epoch timestamps: aggregate windows match count windows") {
    val rows = Seq(("k", 1, -5L), ("k", 1, -1500L), ("k", 1, 100L))
    val s = new KStream(rows.map { case (k, v, t) => KV(k, v, ts(t)) }.toDS())
    val w = TumblingWindow.of(1000)
    val viaCount = s.groupByKey.windowedBy(w).count.changelog.collect()
      .map(u => (u.key.start.getTime, u.value.get)).sorted
    val viaAgg = s.groupByKey.windowedBy(w)
      .aggregate(() => 0L)((_, _, acc) => acc + 1L).changelog.collect()
      .map(u => (u.key.start.getTime, u.value.get)).sorted
    assert(viaAgg === viaCount)
    assert(viaAgg.map(_._1).toSet === Set(-2000L, -1000L, 0L))
  }
}

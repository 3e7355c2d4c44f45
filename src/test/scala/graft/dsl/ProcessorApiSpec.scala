package graft.dsl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, TimeMode}

import graft.SparkSpec
import graft.streaming.{IdleSessionSummaryProcessor, ProcessorApi, RunningCountProcessor,
  SessionSummary}

/** Processor API v2 on transformWithState: named state, timers (punctuator
  * analog), RocksDB state store.
  */
class ProcessorApiSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private var queries: List[StreamingQuery] = Nil
  override def afterAll(): Unit = {
    queries.foreach(q => if (q.isActive) q.stop())
    ProcessorApi.useDefaultStateStore(spark)
    super.afterAll()
  }

  private def withRocksDb[T](body: => T): T = {
    ProcessorApi.useRocksDb(spark)
    try body finally ProcessorApi.useDefaultStateStore(spark)
  }

  test("process() keeps per-key state across microbatches on RocksDB") {
    withRocksDb {
      val in = MemoryStream[(String, String, Long)]
      val stream = new KStream(in.toDS().map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) })
      val counted = stream.process(new RunningCountProcessor[String, String],
        TimeMode.None(), OutputMode.Update())
      val q = counted.writeStream.format("memory").queryName("t_proc_count")
        .outputMode("update").start()
      queries = q :: queries

      in.addData(("a", "x", 1000L), ("a", "y", 2000L), ("b", "z", 1000L))
      q.processAllAvailable()
      in.addData(("a", "w", 3000L))
      q.processAllAvailable()

      val rows = spark.table("t_proc_count").as[KV[String, Long]].collect()
      // batch 1: a→2, b→1; batch 2: a→3 (state survived the microbatch boundary)
      assert(rows.filter(_.key == "a").map(_.value).sorted.toSeq === Seq(2L, 3L))
      assert(rows.filter(_.key == "b").map(_.value).toSeq === Seq(1L))
      // emitted ts = max input ts of the batch
      assert(rows.filter(r => r.key == "a" && r.value == 3L).head.ts === ts(3000))
    }
  }

  test("event-time timer fires the idle-session summary once the watermark passes the gap") {
    withRocksDb {
      val in = MemoryStream[(String, String, Long)]
      val stream = new KStream(in.toDS().map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) })
        .withWatermarkMs(0)
      val summaries = stream.process(
        new IdleSessionSummaryProcessor[String, String](gapMs = 1000L))
      val q = summaries.writeStream.format("memory").queryName("t_proc_session")
        .outputMode("append").start()
      queries = q :: queries

      in.addData(("a", "x", 1000L), ("a", "y", 1400L))
      q.processAllAvailable()
      // watermark is still at 1400: timer armed at 2400 has not fired
      assert(spark.table("t_proc_session").isEmpty)

      // another key advances the watermark past 2400 → a's session closes
      in.addData(("b", "z", 5000L))
      q.processAllAvailable()
      in.addData(("b", "z2", 9000L)) // advance again so the timer batch runs
      q.processAllAvailable()

      val out = spark.table("t_proc_session").as[SessionSummary[String]].collect()
      val a = out.filter(_.key == "a")
      assert(a.length === 1)
      assert(a.head.count === 2L && a.head.lastTs === ts(1400))

      // session state cleared: a new record for "a" starts a fresh count
      in.addData(("a", "again", 10000L))
      q.processAllAvailable()
      in.addData(("b", "z3", 20000L))
      q.processAllAvailable()
      in.addData(("b", "z4", 30000L))
      q.processAllAvailable()
      val again = spark.table("t_proc_session").as[SessionSummary[String]].collect()
        .filter(_.key == "a")
      assert(again.map(_.count).sorted.toSeq === Seq(1L, 2L))
    }
  }

  test("process() runs the same processor in batch mode (single pass, empty initial state)") {
    val batch = Seq(
      KV("a", "x", ts(1000)), KV("a", "y", ts(2000)), KV("b", "z", ts(500))).toDS()
    val counted = new KStream(batch)
      .process(new RunningCountProcessor[String, String],
        TimeMode.None(), OutputMode.Update())
      .collect()
    assert(counted.map(r => r.key -> r.value).toMap === Map("a" -> 2L, "b" -> 1L))
  }

  test("fMGWS-based table materialization also runs on the RocksDB provider") {
    withRocksDb {
      val in = MemoryStream[(String, Int, Long)]
      val table = new StreamsBuilder(spark)
        .table(in.toDS().map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) })
      val q = table.changelog.writeStream.format("memory").queryName("t_rocks_table")
        .outputMode("update").start()
      queries = q :: queries

      in.addData(("k", 1, 1000L), ("k", 2, 2000L))
      q.processAllAvailable()
      in.addData(("k", 3, 1500L)) // older than current latest → ignored
      q.processAllAvailable()

      val latest = spark.table("t_rocks_table").as[Upsert[String, Int]].collect()
        .maxBy(_.ts.getTime)
      assert(latest.value === Some(2) && latest.ts === ts(2000))
    }
  }
}

package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.dsl._

/** SURVEY §7.2 — the minimum end-to-end slice, one of every lifecycle stage:
  * Stream → FlatMapValues(split) → GroupByKey → WindowedBy(tumbling, grace)
  * → Count → ToStream → sink, with late-data drop, in true streaming mode.
  */
class FlagshipSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private var queries: List[StreamingQuery] = Nil
  override def afterAll(): Unit = {
    queries.foreach(q => if (q.isActive) q.stop()); super.afterAll()
  }

  test("windowed word count with grace: source to sink through every stage") {
    val in = MemoryStream[(String, String, Long)]
    val builder = new StreamsBuilder(spark)

    val counts = builder
      .stream(in.toDS().map { case (k, line, t) =>
        KV(k, line, new java.sql.Timestamp(t)) })            // Stream(events)
      .flatMapValues(_.split(" ").toSeq.filter(_.nonEmpty))  // FlatMapValues(split)
      .selectKey((_, word) => word)                          // re-key by word
      .groupByKey                                            // GroupByKey
      .windowedBy(TumblingWindow(java.time.Duration.ofMillis(60000),
        java.time.Duration.ofMillis(10000)))                 // tumbling 1m, grace 10s
      .count                                                 // Count
      .toStream                                              // ToStream
    val q = counts.ds.writeStream.format("memory").queryName("flagship")
      .outputMode("update").start()                          // To(out)
    queries = q :: queries

    in.addData(("u1", "spark streams spark", 10000L),
      ("u2", "streams", 20000L))
    q.processAllAvailable()
    // advance stream time far enough that the first window is closed + grace
    in.addData(("u3", "late-batch-marker", 200000L)); q.processAllAvailable()
    // this record is > grace late for window [0, 60000) -> dropped
    in.addData(("u4", "spark", 30000L)); q.processAllAvailable()

    val rows = spark.table("flagship").as[KV[Windowed[String], Long]].collect()
    val firstWindow = rows.filter(_.key.start.getTime == 0L)
      .groupBy(_.key.key).map { case (w, rs) => w -> rs.maxBy(_.ts.getTime).value }
    assert(firstWindow === Map("spark" -> 2L, "streams" -> 2L))
    assert(rows.exists(_.key.key == "late-batch-marker"))
  }
}

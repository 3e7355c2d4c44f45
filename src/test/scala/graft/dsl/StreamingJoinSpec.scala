package graft.dsl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** Stream-stream joins and final-result emission under true streaming. */
class StreamingJoinSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private var queries: List[StreamingQuery] = Nil
  override def afterAll(): Unit = {
    queries.foreach(q => if (q.isActive) q.stop()); super.afterAll()
  }

  test("stream-stream windowed inner join emits matches within the window in streaming") {
    val lin = MemoryStream[(String, String, Long)]
    val rin = MemoryStream[(String, String, Long)]
    def ks(m: MemoryStream[(String, String, Long)]) =
      new KStream(m.toDS().map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) })
        .withWatermarkMs(0)
    val joined = ks(lin).join(ks(rin), JoinWindows.of(1000))((a, b) => s"$b-$a")
    val q = joined.ds.writeStream.format("memory").queryName("t_ssjoin")
      .outputMode("append").start()
    queries = q :: queries

    lin.addData(("k", "left", 1000L))
    rin.addData(("k", "in-window", 1500L), ("k", "out-of-window", 9000L))
    q.processAllAvailable()

    val out = spark.table("t_ssjoin").as[KV[String, String]].collect()
    assert(out.map(_.value).toSeq === Seq("in-window-left"))
    assert(out.head.ts === ts(1500)) // max of the two input timestamps
  }

  test("stream-stream left join emits the null-padded row only after the window closes") {
    val lin = MemoryStream[(String, String, Long)]
    val rin = MemoryStream[(String, String, Long)]
    def ks(m: MemoryStream[(String, String, Long)]) =
      new KStream(m.toDS().map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) })
        .withWatermarkMs(0)
    val joined = ks(lin).leftJoin(ks(rin), JoinWindows.of(1000)) {
      (a, b) => s"$a-${b.getOrElse("NULL")}"
    }
    val q = joined.ds.writeStream.format("memory").queryName("t_ssleft")
      .outputMode("append").start()
    queries = q :: queries

    lin.addData(("k", "matched", 1000L), ("u", "lonely", 1000L))
    rin.addData(("k", "right", 1500L))
    q.processAllAvailable()
    // the match emits eagerly; the unmatched left row is still buffered
    val eager = spark.table("t_ssleft").as[KV[String, String]].collect()
    assert(eager.map(_.value).toSet === Set("matched-right"))

    // advance both watermarks past 1000 + after(1000) → "lonely" gives up
    lin.addData(("w", "adv", 10000L)); rin.addData(("w", "adv", 10000L))
    q.processAllAvailable()
    lin.addData(("w", "adv2", 20000L)); rin.addData(("w", "adv2", 20000L))
    q.processAllAvailable()
    val out = spark.table("t_ssleft").as[KV[String, String]].collect()
    assert(out.filter(_.key == "u").map(_.value).toSeq === Seq("lonely-NULL"))
    // null-side result keeps the left timestamp
    assert(out.filter(_.key == "u").head.ts === ts(1000))
  }

  test("stream-stream outer join pads whichever side is missing after close") {
    val lin = MemoryStream[(String, String, Long)]
    val rin = MemoryStream[(String, String, Long)]
    def ks(m: MemoryStream[(String, String, Long)]) =
      new KStream(m.toDS().map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) })
        .withWatermarkMs(0)
    val joined = ks(lin).outerJoin(ks(rin), JoinWindows.of(1000)) {
      (a, b) => s"${a.getOrElse("NULL")}|${b.getOrElse("NULL")}"
    }
    val q = joined.ds.writeStream.format("memory").queryName("t_ssouter")
      .outputMode("append").start()
    queries = q :: queries

    lin.addData(("lo", "left-only", 1000L))
    rin.addData(("ro", "right-only", 1200L))
    q.processAllAvailable()
    lin.addData(("w", "adv", 10000L)); rin.addData(("w", "adv", 10000L))
    q.processAllAvailable()
    lin.addData(("w", "adv2", 20000L)); rin.addData(("w", "adv2", 20000L))
    q.processAllAvailable()

    val out = spark.table("t_ssouter").as[KV[String, String]].collect()
    assert(out.filter(_.key == "lo").map(_.value).toSeq === Seq("left-only|NULL"))
    assert(out.filter(_.key == "ro").map(_.value).toSeq === Seq("NULL|right-only"))
    // the advancing keys matched themselves on both sides
    assert(out.filter(_.key == "w").forall(!_.value.contains("NULL")))
  }

  test("suppress-style final results: append mode emits a window once, after close") {
    val in = MemoryStream[(String, Long)]
    val counted = new KStream(in.toDS().map { case (k, t) =>
      KV(k, 1, new java.sql.Timestamp(t)) })
      .groupByKey
      .windowedBy(TumblingWindow(java.time.Duration.ofMillis(1000),
        java.time.Duration.ofMillis(500)))
      .count
    // Emission.finalResults = the reference-missing suppress(): only closed
    // windows emit
    val q = Emission.finalResults(
      counted.changelog.writeStream.format("memory").queryName("t_final")).start()
    queries = q :: queries

    in.addData(("k", 100L), ("k", 200L)); q.processAllAvailable()
    assert(spark.table("t_final").isEmpty) // window [0,1000) still open

    in.addData(("k", 5000L)); q.processAllAvailable() // watermark passes 1000+grace
    val rows = spark.table("t_final").as[Upsert[Windowed[String], Long]].collect()
    assert(rows.length === 1)
    assert(rows.head.key.start.getTime === 0L && rows.head.value.get === 2L)

    // the closed window never re-emits
    in.addData(("k", 6000L)); q.processAllAvailable()
    val again = spark.table("t_final").as[Upsert[Windowed[String], Long]].collect()
    assert(again.count(_.key.start.getTime == 0L) === 1)
  }
}

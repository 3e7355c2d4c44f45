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

  test("stream-stream join emits EVERY pair in a multi-record window (N x M)") {
    // the reference's windowed join is per-pair: each left record joins each
    // right record within the window, across batches in either order
    // (`KStreamKStreamJoinProcessor.cs`: fetch-all from the other side's
    // window store, one emission per stored match)
    val lin = MemoryStream[(String, String, Long)]
    val rin = MemoryStream[(String, String, Long)]
    def ks(m: MemoryStream[(String, String, Long)]) =
      new KStream(m.toDS().map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) })
        .withWatermarkMs(0)
    val joined = ks(lin).join(ks(rin), JoinWindows.of(1000))((a, b) => s"$a+$b")
    val q = joined.ds.writeStream.format("memory").queryName("t_ssmulti")
      .outputMode("append").start()
    queries = q :: queries

    lin.addData(("k", "l1", 1000L)); rin.addData(("k", "r1", 800L))
    q.processAllAvailable()
    lin.addData(("k", "l2", 1400L)) // late-arriving left joins the BUFFERED r1
    rin.addData(("k", "r2", 1500L), ("k", "r3", 2600L)) // r3 outside both windows
    q.processAllAvailable()

    val out = spark.table("t_ssmulti").as[KV[String, String]].collect()
    assert(out.map(_.value).sorted.toSeq ===
      Seq("l1+r1", "l1+r2", "l2+r1", "l2+r2"))
    // each pair's ts = max of its two inputs
    assert(out.map(kv => kv.value -> kv.ts.getTime).toMap ===
      Map("l1+r1" -> 1000L, "l1+r2" -> 1500L, "l2+r1" -> 1400L, "l2+r2" -> 1500L))
  }

  test("asymmetric JoinWindows(before, after) bounds matches one-sidedly in streaming") {
    // left at t matches right in [t - before, t + after] only
    // (`JoinWindowOptions.cs:35-53`); before=500, after=0 here
    val lin = MemoryStream[(String, String, Long)]
    val rin = MemoryStream[(String, String, Long)]
    def ks(m: MemoryStream[(String, String, Long)]) =
      new KStream(m.toDS().map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) })
        .withWatermarkMs(0)
    val w = JoinWindows(java.time.Duration.ofMillis(500), java.time.Duration.ZERO)
    val joined = ks(lin).join(ks(rin), w)((a, b) => s"$a+$b")
    val q = joined.ds.writeStream.format("memory").queryName("t_ssasym")
      .outputMode("append").start()
    queries = q :: queries

    lin.addData(("k", "l", 1000L))
    rin.addData(("k", "rA", 600L), ("k", "rB", 1200L), ("k", "rC", 400L))
    q.processAllAvailable()

    val rows = spark.table("t_ssasym").as[KV[String, String]].collect()
    assert(rows.map(_.value).toSeq === Seq("l+rA")) // rB after, rC too early
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

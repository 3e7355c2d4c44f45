package graft.dsl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** True streaming-mode semantics over MemoryStream — the Spark-native
  * `TopologyTestDriver` (SURVEY §5): state across microbatches, update-mode
  * changelogs, watermark-based late-data drop
  * (KStreamWindowAggregateProcessor.cs:52-58 analog).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private var queries: List[StreamingQuery] = Nil

  private def start(df: org.apache.spark.sql.Dataset[_], name: String,
      mode: String = "update"): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    queries = q :: queries
    q
  }

  override def afterAll(): Unit = {
    queries.foreach(q => if (q.isActive) q.stop())
    super.afterAll()
  }

  test("toTable keeps latest value per key across microbatches") {
    val in = MemoryStream[(String, String, Long)]
    val table = new KStream(in.toDS().map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) }).toTable
    val q = start(table.changelog, "t_latest")

    in.addData(("a", "v1", 100L), ("b", "w1", 100L))
    q.processAllAvailable()
    in.addData(("a", "v2", 200L)) // second batch: state must remember b
    q.processAllAvailable()

    val rows = spark.table("t_latest").as[Upsert[String, String]].collect()
    val latest = rows.groupBy(_.key).map { case (k, us) => k -> us.maxBy(_.ts.getTime).value.get }
    assert(latest === Map("a" -> "v2", "b" -> "w1"))

    // stale update must NOT override newer state (cross-batch)
    in.addData(("a", "old", 150L))
    q.processAllAvailable()
    val rows2 = spark.table("t_latest").as[Upsert[String, String]].collect()
    val latest2 = rows2.groupBy(_.key).map { case (k, us) => k -> us.maxBy(_.ts.getTime).value.get }
    assert(latest2("a") === "v2")
  }

  test("grouped count accumulates across microbatches") {
    val in = MemoryStream[(String, Int, Long)]
    val counts = new KStream(in.toDS().map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) })
      .groupByKey.aggregate(() => 0L)((_, _, acc) => acc + 1L)
    val q = start(counts.changelog, "t_counts")

    in.addData(("a", 1, 1L), ("a", 1, 2L)); q.processAllAvailable()
    in.addData(("a", 1, 3L)); q.processAllAvailable()

    val last = spark.table("t_counts").as[Upsert[String, Long]].collect()
      .filter(_.key == "a").maxBy(_.ts.getTime)
    assert(last.value.get === 3L)
  }

  test("windowed count with grace drops records later than the watermark") {
    val in = MemoryStream[(String, Int, Long)]
    val counted = new KStream(in.toDS().map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) })
      .groupByKey
      .windowedBy(TumblingWindow(java.time.Duration.ofMillis(2000),
        java.time.Duration.ofMillis(2000)))
      .count
    val q = start(counted.changelog, "t_window")

    in.addData(("k", 1, 500L)); q.processAllAvailable()
    in.addData(("k", 1, 10000L)); q.processAllAvailable() // advances watermark to 8000
    in.addData(("k", 1, 600L)); q.processAllAvailable()   // late: window [0,2000) closed
    in.addData(("k", 1, 9000L)); q.processAllAvailable()  // within watermark: accepted

    val rows = spark.table("t_window").as[Upsert[Windowed[String], Long]].collect()
    val byWindow = rows.groupBy(_.key.start.getTime)
      .map { case (s, us) => s -> us.maxBy(_.ts.getTime).value.get }
    assert(byWindow(0L) === 1L)      // late 600 was dropped
    assert(byWindow(8000L) === 1L)   // 9000 accepted
  }

  test("stream-table join works in streaming with state across batches") {
    val tableIn = MemoryStream[(String, String, Long)]
    val streamIn = MemoryStream[(String, String, Long)]
    val table = new KTable(tableIn.toDS().map { case (k, v, t) =>
      Upsert(k, Some(v), new java.sql.Timestamp(t)) })
    val s = new KStream(streamIn.toDS().map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) })
    val joined = s.join(table)((v, t) => s"$v@$t")
    val q = start(joined.ds, "t_stj", mode = "append")

    tableIn.addData(("k", "t1", 100L)); q.processAllAvailable()
    streamIn.addData(("k", "s1", 200L)); q.processAllAvailable() // table state from batch 1

    val out = spark.table("t_stj").as[KV[String, String]].collect().map(_.value)
    assert(out.toSeq === Seq("s1@t1"))
  }

  test("deduplicate keeps first per key across microbatches; state is watermark-bounded") {
    val in = MemoryStream[(String, String, Long)]
    val deduped = new KStream(in.toDS()
      .map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) })
      .deduplicate(withinMs = 10000L)
    val q = start(deduped.toDF, "t_dedup", mode = "append")

    in.addData(("a", "first", 1000L), ("a", "dup-same-batch", 1500L), ("b", "only", 1000L))
    q.processAllAvailable()
    in.addData(("a", "dup-next-batch", 2000L)) // state must remember a
    q.processAllAvailable()

    val vals = spark.table("t_dedup").as[KV[String, String]].collect()
      .map(r => r.key -> r.value).toMap
    assert(vals === Map("a" -> "first", "b" -> "only"))

    // batch path: deterministic earliest-per-key (ties by source order)
    val batch = new KStream(Seq(
      KV("k", "late", new java.sql.Timestamp(300L)),
      KV("k", "early", new java.sql.Timestamp(100L)),
      KV("j", "tie1", new java.sql.Timestamp(100L)),
      KV("j", "tie2", new java.sql.Timestamp(100L))).toDS())
      .deduplicate(withinMs = 10000L)
    val b = batch.toDF.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(b === Map("k" -> "early", "j" -> "tie1"))
  }

  test("deduplicate keep policy diverges by mode on out-of-order arrival (documented)") {
    // the same two records, later-ts arriving FIRST: streaming keeps the
    // first-ARRIVED (ts=900), batch keeps the earliest EVENT-TIME (ts=100).
    // This pins the scaladoc'd divergence so a refactor can't silently flip it.
    val in = MemoryStream[(String, String, Long)]
    val deduped = new KStream(in.toDS()
      .map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) })
      .deduplicate(withinMs = 10000L)
    val q = start(deduped.toDF, "t_dedup_ooo", mode = "append")
    in.addData(("k", "later-ts-arrives-first", 900L)); q.processAllAvailable()
    in.addData(("k", "earlier-ts-arrives-second", 100L)); q.processAllAvailable()
    val streamKept = spark.table("t_dedup_ooo").as[KV[String, String]].collect()
    assert(streamKept.map(_.value).toSeq === Seq("later-ts-arrives-first"))

    val batchKept = new KStream(Seq(
      KV("k", "later-ts-arrives-first", new java.sql.Timestamp(900L)),
      KV("k", "earlier-ts-arrives-second", new java.sql.Timestamp(100L))).toDS())
      .deduplicate(withinMs = 10000L)
      .toDF.collect().map(_.getString(1))
    assert(batchKept.toSeq === Seq("earlier-ts-arrives-second"))

    // explicit tieBreak column makes equal-ts batch survivors deterministic
    // regardless of source order
    val tb = new KStream(Seq(
      KV("j", "zz", new java.sql.Timestamp(100L)),
      KV("j", "aa", new java.sql.Timestamp(100L))).toDS())
      .deduplicate(withinMs = 10000L,
        tieBreak = Seq(org.apache.spark.sql.functions.col("value")))
      .toDF.collect().map(_.getString(1))
    assert(tb.toSeq === Seq("aa"))
  }

  test("refreshing global table: dimension update becomes visible to a later microbatch") {
    // the reference's KGlobalTableTests update scenario: the global replica
    // keeps updating while the topology runs (GlobalStreamThread.cs:13-220);
    // here the refresh boundary is the microbatch — a dimension published
    // between batches must join into the NEXT batch, which a plain
    // stream-static join (snapshot listing resolved once) can never do
    import org.apache.spark.sql.functions.col
    val dimDir = tempDir("graft_gkt_refresh") + "/dim"
    def publish(rows: (String, String)*): Unit =
      rows.toSeq.toDF("gk", "gv").write.mode("overwrite").parquet(dimDir)
    publish(("k1", "A"), ("k2", "B"))
    val global = new StreamsBuilder(spark).globalTableRefreshing[String, String](() =>
      spark.read.parquet(dimDir)
        .select(col("gk").as("_1"), col("gv").as("_2")).as[(String, String)])

    val in = MemoryStream[(String, String, Long)]
    val stream = new KStream(in.toDS()
      .map { case (k, v, t) => KV(k, v, new java.sql.Timestamp(t)) })
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val q = stream.joinGlobalRefreshing(global, (k: String, _: String) => k)(
        (v: String, g: Option[String]) => s"$v|${g.getOrElse("-")}") {
      (batch, _) => out ++= batch.collect().map(kv => (kv.key, kv.value))
    }.start()
    queries = q :: queries

    in.addData(("k1", "x", 100L)); q.processAllAvailable()
    publish(("k1", "A2"), ("k2", "B")) // update BETWEEN batches
    in.addData(("k1", "y", 200L)); q.processAllAvailable()

    assert(out.toSeq === Seq(("k1", "x|A"), ("k1", "y|A2")),
      s"batch 2 must see the updated dimension: $out")
  }
}

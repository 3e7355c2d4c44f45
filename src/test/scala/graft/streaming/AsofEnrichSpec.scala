package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StreamingQuery, TimeMode}

import graft.SparkSpec
import graft.operators.Temporal

/** Streaming as-of enrichment ([[AsofEnrichProcessor]]): a two-batch
  * time-ordered replay must reproduce the batch [[Temporal.asofJoin]]
  * over the union of the batches; tolerance gating, the stream-table
  * no-retro-enrichment rule, watermark compaction, and the batch-mode
  * equivalence on the real events table.
  */
class AsofEnrichSpec extends SparkSpec {
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

  private def fact(k: Long, ts: Long, id: Long) =
    AsofEvent[Long, Long, Long](k, ts, Some(id), None)
  private def dim(k: Long, ts: Long, v: Long) =
    AsofEvent[Long, Long, Long](k, ts, None, Some(v))

  private def collected(tbl: String): Set[(Long, Long, Long, Option[Long], Option[Long])] =
    spark.table(tbl).as[AsofEnriched[Long, Long, Long]].collect()
      .map(e => (e.key, e.ts, e.left, e.asofTs, e.right)).toSet

  test("two-batch replay equals the batch asofJoin over the union") {
    withRocksDb {
      val in = MemoryStream[AsofEvent[Long, Long, Long]]
      val out = AsofEnrich.enrich(in.toDS(), timeMode = TimeMode.None())
      val q = out.writeStream.format("memory").queryName("t_asof_replay")
        .outputMode("append").start()
      queries = q :: queries

      val batch1 = Seq(dim(1L, 100L, 10L), dim(1L, 200L, 11L), fact(1L, 150L, 900L))
      val batch2 = Seq(dim(1L, 300L, 12L), fact(1L, 250L, 901L),
        fact(1L, 350L, 902L), fact(2L, 100L, 903L), fact(1L, 50L, 904L))
      in.addData(batch1: _*); q.processAllAvailable()
      in.addData(batch2: _*); q.processAllAvailable()

      val all = batch1 ++ batch2
      val lefts = all.collect { case AsofEvent(k, ts, Some(l), None) => (l, k, ts) }
        .toDF("fact_id", "key", "ts")
      val rights = all.collect { case AsofEvent(k, ts, None, Some(r)) => (k, ts, r) }
        .toDF("key", "rts", "rv")
      val expected = Temporal.asofJoin(lefts, rights, Seq("key"), "ts", "rts",
          Seq("rv")).collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(0),
          if (r.isNullAt(3)) None else Some(r.getLong(3)),
          if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
      assert(collected("t_asof_replay") === expected)
      // spot-check the interesting rows: fact@150 saw v10 from batch 1;
      // fact@250 saw v11 (arrived one batch earlier); fact@350 saw the
      // same-batch v12; key 2 and the too-early fact@50 enriched NULL
      assert(collected("t_asof_replay").contains((1L, 250L, 901L, Some(200L), Some(11L))))
      assert(collected("t_asof_replay").contains((1L, 350L, 902L, Some(300L), Some(12L))))
      assert(collected("t_asof_replay").contains((2L, 100L, 903L, None, None)))
    }
  }

  test("tolerance gates stale matches; late dimension rows never retro-enrich") {
    withRocksDb {
      val in = MemoryStream[AsofEvent[Long, Long, Long]]
      val out = AsofEnrich.enrich(in.toDS(), toleranceMs = Some(50L),
        timeMode = TimeMode.None())
      val q = out.writeStream.format("memory").queryName("t_asof_tol")
        .outputMode("append").start()
      queries = q :: queries

      in.addData(dim(1L, 100L, 10L), fact(1L, 140L, 900L), fact(1L, 151L, 901L))
      q.processAllAvailable()
      // 40ms in tolerance; 51ms out
      assert(collected("t_asof_tol") === Set(
        (1L, 140L, 900L, Some(100L), Some(10L)),
        (1L, 151L, 901L, None, None)))

      // a dimension row arriving AFTER the fact's batch does not re-emit
      in.addData(dim(1L, 150L, 11L))
      q.processAllAvailable()
      assert(collected("t_asof_tol").size === 2)
      // but it serves later facts
      in.addData(fact(1L, 160L, 902L))
      q.processAllAvailable()
      assert(collected("t_asof_tol").contains((1L, 160L, 902L, Some(150L), Some(11L))))
    }
  }

  test("same-ts dimension duplicates fold through preferRight") {
    withRocksDb {
      val in = MemoryStream[AsofEvent[Long, Long, Long]]
      val out = AsofEnrich.enrich(in.toDS(), preferRight = (a: Long, b: Long) => math.max(a, b),
        timeMode = TimeMode.None())
      val q = out.writeStream.format("memory").queryName("t_asof_tie")
        .outputMode("append").start()
      queries = q :: queries
      in.addData(dim(1L, 100L, 7L), dim(1L, 100L, 9L), dim(1L, 100L, 8L),
        fact(1L, 100L, 900L))
      q.processAllAvailable()
      assert(collected("t_asof_tie") === Set((1L, 100L, 900L, Some(100L), Some(9L))))
    }
  }

  test("watermark compaction keeps exactly the newest entry below the cutoff") {
    withRocksDb {
      val in = MemoryStream[(Long, Long, Option[Long], Option[Long])]
      val events = in.toDS()
        .withColumn("etime", timestamp_millis(col("_2")))
        .withWatermark("etime", "0 milliseconds")
        .as[(Long, Long, Option[Long], Option[Long], java.sql.Timestamp)]
        .map(t => AsofEvent[Long, Long, Long](t._1, t._2, t._3, t._4))
      val out = AsofEnrich.enrich(events)
      val q = out.writeStream.format("memory").queryName("t_asof_wm")
        .outputMode("append").start()
      queries = q :: queries

      def d(k: Long, ts: Long, v: Long) = (k, ts, Option.empty[Long], Option(v))
      def f(k: Long, ts: Long, id: Long) = (k, ts, Option(id), Option.empty[Long])

      in.addData(d(1L, 100L, 10L), d(1L, 200L, 11L), d(1L, 300L, 12L))
      q.processAllAvailable() // watermark advances to 300 after this batch
      // next batch: compaction keeps only ts=300 (newest <= cutoff 300);
      // a fact at 10_000 must still match it
      in.addData(f(1L, 10000L, 900L))
      q.processAllAvailable()
      assert(collected("t_asof_wm").contains((1L, 10000L, 900L, Some(300L), Some(12L))))
    }
  }

  test("regression: a late-window fact is enriched BEFORE compaction evicts its true match") {
    // the r14 fix (compact on the way OUT, after the batch's facts
    // enrich): Spark admits batch-N rows with batch N−1's (older) late
    // watermark while getCurrentWatermarkInMs() is the newer eviction
    // watermark, so a fact with ts in [lateWatermark, evictionWatermark)
    // is legal input whose true as-of match sits BELOW the eviction
    // cutoff. Pre-fix (compact first), dim@100 was evicted in the same
    // handleInputRows call and the fact silently enriched to NULL.
    withRocksDb {
      val in = MemoryStream[(Long, Long, Option[Long], Option[Long])]
      val events = in.toDS()
        .withColumn("etime", timestamp_millis(col("_2")))
        .withWatermark("etime", "0 milliseconds")
        .as[(Long, Long, Option[Long], Option[Long], java.sql.Timestamp)]
        .map(t => AsofEvent[Long, Long, Long](t._1, t._2, t._3, t._4))
      val out = AsofEnrich.enrich(events)
      val q = out.writeStream.format("memory").queryName("t_asof_latewin")
        .outputMode("append").start()
      queries = q :: queries

      def d(k: Long, ts: Long, v: Long) = (k, ts, Option.empty[Long], Option(v))
      def f(k: Long, ts: Long, id: Long) = (k, ts, Option(id), Option.empty[Long])

      // batch 1: the true match (ts=100) plus a far-future dim that
      // advances the eviction watermark for batch 2 to 5000
      in.addData(d(1L, 100L, 10L), d(1L, 5000L, 99L))
      q.processAllAvailable()
      // batch 2: a fact at 150 — admitted under the batch-1 late
      // watermark (0), but the eviction cutoff is 5000, under which only
      // the NEWEST at-or-below entry (dim@5000) survives compaction
      in.addData(f(1L, 150L, 900L))
      q.processAllAvailable()
      assert(collected("t_asof_latewin")
          .contains((1L, 150L, 900L, Some(100L), Some(10L))),
        s"late-window fact must enrich from dim@100, got: " +
          collected("t_asof_latewin"))
      // and compaction still happened: a later fact sees only dim@5000
      in.addData(f(1L, 6000L, 901L))
      q.processAllAvailable()
      assert(collected("t_asof_latewin")
        .contains((1L, 6000L, 901L, Some(5000L), Some(99L))))
    }
  }

  test("batch mode reproduces Temporal.asofJoin on the real events table") {
    val e = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val evs = e.where(col("event_type").isin("purchase", "view"))
      .select(col("user_id").cast("long").as("key"),
        unix_millis(col("ts")).as("ts"),
        when(col("event_type") === "purchase", col("event_id")).as("l"),
        when(col("event_type") === "view", col("event_id")).as("r"))
      .as[(Long, Long, Option[Long], Option[Long])]
      .map(t => AsofEvent[Long, Long, Long](t._1, t._2, t._3, t._4))
    val got = AsofEnrich.enrich(evs, preferRight = (a: Long, b: Long) => math.max(a, b),
        timeMode = TimeMode.None())
      .collect().map(x => (x.key, x.ts, x.left, x.asofTs, x.right)).toSet

    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id").cast("long").as("key"),
        unix_millis(col("ts")).as("ts"))
    val v = e.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").cast("long").as("key"),
        unix_millis(col("ts")).as("vts"))
    val expected = Temporal.asofJoin(p, v, Seq("key"), "ts", "vts", Seq("view_id"))
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSet
    assert(got.nonEmpty && got === expected)
  }
}

package graft.dsl

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

/** Changelog semantics under true streaming: add/subtract aggregation and
  * table-table joins must hold state ACROSS microbatches (the reference's
  * store-backed processors).
  */
class StreamingChangelogSpec extends SparkSpec {
  import spark.implicits._
  implicit lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private var queries: List[StreamingQuery] = Nil
  private def start(df: org.apache.spark.sql.Dataset[_], name: String,
      mode: String = "update"): StreamingQuery = {
    val q = df.writeStream.format("memory").queryName(name).outputMode(mode).start()
    queries = q :: queries; q
  }
  override def afterAll(): Unit = {
    queries.foreach(q => if (q.isActive) q.stop()); super.afterAll()
  }

  private def latest[K, V](rows: Array[Upsert[K, V]]): Map[K, Option[V]] =
    rows.groupBy(_.key).map { case (k, us) => k -> us.maxBy(_.ts.getTime).value }

  test("KGroupedTable.count subtracts old group when a key moves (cross-batch)") {
    val in = MemoryStream[(String, String, Long)]
    val table = new KTable(in.toDS().map { case (k, v, t) =>
      Upsert(k, Some(v), new java.sql.Timestamp(t)) })
    val counts = table.groupBy((k, region) => (region, k)).count
    val q = start(counts.changelog, "t_regions")

    in.addData(("u1", "r1", 1L), ("u2", "r1", 2L)); q.processAllAvailable()
    // u1 moves r1 -> r2 in a LATER batch: subtract must use state, not batch
    in.addData(("u1", "r2", 3L)); q.processAllAvailable()

    val state = latest(spark.table("t_regions").as[Upsert[String, Long]].collect())
    assert(state("r1") === Some(1L))
    assert(state("r2") === Some(1L))
  }

  test("KGroupedTable.aggregate retracts via subtractor across batches (streaming)") {
    val in = MemoryStream[(String, Long, Long)] // (user, spend, ts)
    val table = new KTable(in.toDS().map { case (k, v, t) =>
      Upsert(k, Some(v), new java.sql.Timestamp(t)) })
    // re-key by spend bucket; custom fold = sum of spends per bucket.
    // changelogChanges (append fMGWS) -> aggregateChanges (append fMGWS):
    // the whole chain must run in one streaming query under an append sink.
    val agg = table
      .groupBy((k, spend) => (if (spend >= 100L) "big" else "small", spend))
      .aggregate(() => 0L)((_, v, acc) => acc + v)((_, v, acc) => acc - v)
    val q = start(agg.changelog, "t_spend_agg", mode = "append")

    in.addData(("u1", 50L, 1L), ("u2", 200L, 2L)); q.processAllAvailable()
    // u1's spend moves small -> big in a later batch: subtract uses state
    in.addData(("u1", 150L, 3L)); q.processAllAvailable()

    val state = latest(spark.table("t_spend_agg").as[Upsert[String, Long]].collect())
    assert(state("small") === Some(0L))
    assert(state("big") === Some(350L))
  }

  test("table-table outer join transitions across microbatches") {
    val lin = MemoryStream[(String, String, Long)]
    val rin = MemoryStream[(String, String, Long)]
    def toTable(m: MemoryStream[(String, String, Long)]) =
      new KTable(m.toDS().map { case (k, v, t) =>
        Upsert(k, if (v == "__del") None else Some(v), new java.sql.Timestamp(t)) })
    val joined = toTable(lin).outerJoin(toTable(rin)) { (a, b) =>
      s"${a.getOrElse("-")}/${b.getOrElse("-")}"
    }
    val q = start(joined.changelog, "t_ttjoin", "append")

    lin.addData(("k", "l1", 1L)); q.processAllAvailable()
    rin.addData(("k", "r1", 2L)); q.processAllAvailable()    // both present
    lin.addData(("k", "__del", 3L)); q.processAllAvailable() // left tombstone

    val state = latest(spark.table("t_ttjoin").as[Upsert[String, String]].collect())
    assert(state("k") === Some("-/r1")) // right side survives the left delete
  }

  test("tombstone eviction: dead keys leave the state store (join, aggregate, re-key)") {
    import graft.streaming.{KeyedChange, StatefulOps}
    def stateRows(q: StreamingQuery): Long =
      Option(q.lastProgress).map(_.stateOperators.map(_.numRowsTotal).sum)
        .getOrElse(-1L)

    // table-table outer join: a key tombstoned on BOTH sides must leave
    // the dual-state store; a one-sided tombstone must stay
    val lin = MemoryStream[(String, Option[String], Long)]
    val rin = MemoryStream[(String, Option[String], Long)]
    val lt = lin.toDS().map { case (k, v, t) => Upsert(k, v, new java.sql.Timestamp(t)) }
    val rt = rin.toDS().map { case (k, v, t) => Upsert(k, v, new java.sql.Timestamp(t)) }
    val joined = StatefulOps.tableTableJoin(lt, rt, "outer")(
      (a: Option[String], b: Option[String]) => a.getOrElse("-") + b.getOrElse("-"))
    val jq = start(joined, "t_evict_join", mode = "append")
    lin.addData(("a", Some("x"), 1L), ("b", Some("y"), 1L))
    rin.addData(("a", Some("X"), 1L)); jq.processAllAvailable()
    assert(stateRows(jq) === 2L)
    lin.addData(("a", Option.empty[String], 2L), ("b", Option.empty[String], 2L))
    rin.addData(("a", Option.empty[String], 2L)); jq.processAllAvailable()
    assert(stateRows(jq) === 0L,
      "keys dead on both sides must be evicted from the join store")
    // a revived key behaves like a first-seen key
    lin.addData(("a", Some("z"), 3L)); jq.processAllAvailable()
    assert(stateRows(jq) === 1L)
    val outRows = latest(spark.table("t_evict_join").as[Upsert[String, String]].collect())
    assert(outRows("a") === Some("z-") && outRows("b") === None)

    // add/subtract aggregate: subtractor-null-deletes must remove the row
    val ain = MemoryStream[(String, Option[Long], Option[Long], Long)]
    val changes = ain.toDS().map { case (k, o, n, t) =>
      KeyedChange(k, Change(o, n), new java.sql.Timestamp(t)) }
    val agg = StatefulOps.aggregateChanges(changes)(
      () => "0",
      (_: String, v: Long, acc: String) => (acc.toLong + v).toString,
      (_: String, v: Long, acc: String) => {
        val r = acc.toLong - v; if (r == 0L) null else r.toString })
    val aq = start(agg, "t_evict_agg", mode = "append")
    ain.addData(("g", Option.empty[Long], Some(5L), 1L)); aq.processAllAvailable()
    ain.addData(("h", Option.empty[Long], Some(7L), 2L)); aq.processAllAvailable()
    assert(stateRows(aq) === 2L)
    ain.addData(("h", Some(7L), Option.empty[Long], 3L)); aq.processAllAvailable()
    assert(stateRows(aq) === 1L,
      "a key aggregated to null must be evicted from the store")

    // changelogChanges: a tombstoned original key drops its prev-value row
    val cin = MemoryStream[(String, Option[Long], Long)]
    val ups = cin.toDS().map { case (k, v, t) =>
      Upsert(k, v, new java.sql.Timestamp(t)) }
    val rekeyed = StatefulOps.changelogChanges(ups)((k, v: Long) => (v % 2, k))
    val cq = start(rekeyed, "t_evict_rekey", mode = "append")
    cin.addData(("p", Some(4L), 1L), ("q", Some(3L), 1L)); cq.processAllAvailable()
    assert(stateRows(cq) === 2L)
    cin.addData(("p", Option.empty[Long], 2L)); cq.processAllAvailable()
    assert(stateRows(cq) === 1L,
      "a tombstoned key must drop its previous-value row")
  }

  test("revival after tombstone with an OLDER event-ts: fresh generation in the aggregate, dropped by ts-ordered latest views (the reference's out-of-order rule)") {
    import graft.streaming.{KeyedChange, StatefulOps}
    val ain = MemoryStream[(String, Option[Long], Option[Long], Long)]
    val changes = ain.toDS().map { case (k, o, n, t) =>
      KeyedChange(k, Change(o, n), new java.sql.Timestamp(t)) }
    val agg = StatefulOps.aggregateChanges(changes)(
      () => "0",
      (_: String, v: Long, acc: String) => (acc.toLong + v).toString,
      (_: String, v: Long, acc: String) => {
        val r = acc.toLong - v; if (r == 0L) null else r.toString })
    val q = start(agg, "t_revive_agg", mode = "append")
    ain.addData(("k", Option.empty[Long], Some(5L), 100L)); q.processAllAvailable()
    ain.addData(("k", Some(5L), Option.empty[Long], 100L)); q.processAllAvailable()
    // LATE add (event-ts 50 < the tombstone's 100) in a later batch: the
    // evicted key is a FRESH GENERATION — the aggregate emits the revival
    // at ITS OWN ts (the store kept no history to max against; the
    // reference's store delete has the same amnesia,
    // KTableAggregateProcessor.cs:63-66)
    ain.addData(("k", Option.empty[Long], Some(3L), 50L)); q.processAllAvailable()
    val events = spark.table("t_revive_agg").as[Upsert[String, String]]
      .collect().map(u => (u.value, u.ts.getTime)).toSet
    assert(events
      === Set((Some("5"), 100L), (None, 100L), (Some("3"), 50L)),
      "the revival must be emitted live, at its own (older) event-ts")
    // a ts-ordered latest view over that changelog KEEPS the ts=100
    // tombstone — the revival is invisible to it. This is the reference's
    // own out-of-order-drop rule for table materialization (an update
    // older than the stored row's ts is discarded), locked here so the
    // interaction is a CONTRACT, not an accident: revivals are visible to
    // log-ordered consumers (the changelog above) and invisible to
    // ts-ordered views until an add at ts >= the tombstone's arrives.
    val view = StatefulOps.latestFromChangelog(
      spark.table("t_revive_agg").as[Upsert[String, String]])
      .collect().map(u => u.key -> u.value).toMap
    assert(view("k") === None,
      "ts-ordered latest view must keep the newer tombstone")
  }

  test("fk join: right-side update re-emits all subscribed left rows (cross-batch)") {
    val oin = MemoryStream[(String, String, Long)] // (orderKey, custKey, ts)
    val cin = MemoryStream[(String, String, Long)] // (custKey, name, ts)
    val orders = new KTable(oin.toDS().map { case (k, fk, t) =>
      Upsert(k, Some(fk), new java.sql.Timestamp(t)) })
    val cust = new KTable(cin.toDS().map { case (k, v, t) =>
      Upsert(k, if (v == "__del") None else Some(v), new java.sql.Timestamp(t)) })
    val joined = orders.fkJoin(cust)(identity)((_, name) => name)
    val q = start(joined.changelog, "t_fkjoin", "append")

    // subscriptions arrive BEFORE the referenced row exists
    oin.addData(("o1", "c1", 1L), ("o2", "c1", 2L)); q.processAllAvailable()
    cin.addData(("c1", "alice", 3L)); q.processAllAvailable()
    var state = latest(spark.table("t_fkjoin").as[Upsert[String, String]].collect())
    assert(state("o1") === Some("alice") && state("o2") === Some("alice"))

    // right update in a LATER batch re-emits both subscribers from state
    cin.addData(("c1", "alicia", 4L)); q.processAllAvailable()
    state = latest(spark.table("t_fkjoin").as[Upsert[String, String]].collect())
    assert(state("o1") === Some("alicia") && state("o2") === Some("alicia"))

    // right tombstone turns inner-join results into tombstones
    cin.addData(("c1", "__del", 5L)); q.processAllAvailable()
    state = latest(spark.table("t_fkjoin").as[Upsert[String, String]].collect())
    assert(state("o1") === None && state("o2") === None)
  }

  test("fk join: fk change unsubscribes from the old referenced key (cross-batch)") {
    val oin = MemoryStream[(String, String, Long)]
    val cin = MemoryStream[(String, String, Long)]
    val orders = new KTable(oin.toDS().map { case (k, fk, t) =>
      Upsert(k, Some(fk), new java.sql.Timestamp(t)) })
    val cust = new KTable(cin.toDS().map { case (k, v, t) =>
      Upsert(k, Some(v), new java.sql.Timestamp(t)) })
    val joined = orders.fkJoin(cust)(identity)((_, name) => name)
    val q = start(joined.changelog, "t_fkmove", "append")

    cin.addData(("c1", "alice", 1L), ("c2", "bob", 2L)); q.processAllAvailable()
    oin.addData(("o1", "c1", 3L)); q.processAllAvailable()
    // o1 re-points c1 -> c2 in a later batch
    oin.addData(("o1", "c2", 4L)); q.processAllAvailable()
    val state = latest(spark.table("t_fkmove").as[Upsert[String, String]].collect())
    assert(state("o1") === Some("bob"))

    // updating the ABANDONED c1 must NOT re-emit o1 (it unsubscribed)
    cin.addData(("c1", "alicia", 5L)); q.processAllAvailable()
    val after = spark.table("t_fkmove").as[Upsert[String, String]].collect()
      .filter(u => u.ts.getTime == 5L)
    assert(after.isEmpty)
  }

  test("sliding window count buffers events across microbatches") {
    val in = MemoryStream[(String, Long)]
    val counted = new KStream(in.toDS().map { case (k, t) =>
      KV(k, 1, new java.sql.Timestamp(t)) })
      .groupByKey.windowedBy(SlidingWindow.of(1000)).count
    val q = start(counted.changelog, "t_sliding")

    in.addData(("k", 100L), ("k", 600L)); q.processAllAvailable()
    // a LATER batch: the window ending at 900 must see 100 and 600 from state
    in.addData(("k", 900L)); q.processAllAvailable()

    val rows = spark.table("t_sliding").as[Upsert[Windowed[String], Long]]
      .collect().map(u => u.key.end.getTime -> u.value.get).toMap
    assert(rows(900L) === 3L) // {100, 600, 900} within [−100, 900]
    assert(rows(600L) === 2L)
  }

  test("sliding window: late-but-within-grace event re-emits affected later windows") {
    val in = MemoryStream[(String, Long)]
    val counted = new KStream(in.toDS().map { case (k, t) =>
      KV(k, 1, new java.sql.Timestamp(t)) })
      .groupByKey
      .windowedBy(SlidingWindow(java.time.Duration.ofMillis(1000),
        java.time.Duration.ofMillis(5000))) // generous grace admits the late row
      .count
    val q = start(counted.changelog, "t_sliding_late")

    in.addData(("k", 900L)); q.processAllAvailable() // window end=900 cnt=1
    // late event at 500 (within grace): window end=900 must now show {500,900}
    in.addData(("k", 500L)); q.processAllAvailable()

    // re-emissions carry the same result ts (the window end) — last arrival
    // wins, matching latestFromChangelog's >= tie rule
    val rows = spark.table("t_sliding_late").as[Upsert[Windowed[String], Long]]
      .collect().groupBy(_.key.end.getTime)
      .map { case (e, us) => e -> us.last.value.get }
    assert(rows(500L) === 1L)
    assert(rows(900L) === 2L) // re-emitted after the late arrival (batch parity)
  }

  test("fk join: same-ts delete+reinsert replays in order (left key stays joined)") {
    val oin = MemoryStream[(String, String, Long)] // (orderKey, custKey|__del, ts)
    val cin = MemoryStream[(String, String, Long)]
    val orders = new KTable(oin.toDS().map { case (k, v, t) =>
      Upsert(k, if (v == "__del") None else Some(v), new java.sql.Timestamp(t)) })
    val cust = new KTable(cin.toDS().map { case (k, v, t) =>
      Upsert(k, Some(v), new java.sql.Timestamp(t)) })
    val joined = orders.fkJoin(cust)(identity)((_, name) => name)
    val q = start(joined.changelog, "t_fkseq", "append")

    cin.addData(("c1", "alice", 1L)); q.processAllAvailable()
    oin.addData(("o1", "c1", 5L)); q.processAllAvailable()
    // delete + reinsert AT THE SAME ts in one batch: a (ts, kind) sort would
    // replay [subscribe, delete] and leave o1 tombstoned; seq order must not
    oin.addData(("o1", "__del", 7L), ("o1", "c1", 7L)); q.processAllAvailable()

    val rows = spark.table("t_fkseq").as[Upsert[String, String]].collect()
    val finalAt7 = rows.filter(u => u.ts.getTime == 7L)
    assert(finalAt7.nonEmpty && finalAt7.last.value === Some("alice"))
  }

  test("fk join: out-of-order left upsert across batches does not regress state") {
    val oin = MemoryStream[(String, String, Long)]
    val cin = MemoryStream[(String, String, Long)]
    val orders = new KTable(oin.toDS().map { case (k, v, t) =>
      Upsert(k, Some(v), new java.sql.Timestamp(t)) })
    val cust = new KTable(cin.toDS().map { case (k, v, t) =>
      Upsert(k, Some(v), new java.sql.Timestamp(t)) })
    val joined = orders.fkJoin(cust)(identity)((_, name) => name)
    val q = start(joined.changelog, "t_fkstale", "append")

    cin.addData(("c1", "alice", 1L), ("c2", "bob", 2L)); q.processAllAvailable()
    oin.addData(("o1", "c2", 10L)); q.processAllAvailable() // current: bob
    // STALE upsert (ts=5 < 10) arrives late: must be ignored, not re-point o1
    oin.addData(("o1", "c1", 5L)); q.processAllAvailable()
    cin.addData(("c1", "alicia", 20L)); q.processAllAvailable() // c1 update

    val rows = spark.table("t_fkstale").as[Upsert[String, String]].collect()
    // o1 never re-subscribed to c1, so the c1 update emits nothing for it
    assert(!rows.exists(u => u.value.contains("alicia")))
    assert(!rows.exists(u => u.value.contains("alice") && u.ts.getTime == 5L))
  }

  test("limitPerKey caps a key's records across microbatches") {
    val in = MemoryStream[(String, Long)]
    val s = new KStream(in.toDS().map { case (k, t) =>
      KV(k, t, new java.sql.Timestamp(t)) }).limitPerKey(3)
    val q = start(s.ds, "t_limit", "append")

    in.addData(("k", 1L), ("k", 2L)); q.processAllAvailable() // 2 kept
    in.addData(("k", 3L), ("k", 4L), ("z", 1L)); q.processAllAvailable()

    val out = spark.table("t_limit").as[KV[String, Long]].collect()
    // k capped at 3 (state remembered the 2 from batch 1); z untouched
    assert(out.count(_.key == "k") === 3)
    assert(out.filter(_.key == "k").map(_.value).sorted === Array(1L, 2L, 3L))
    assert(out.count(_.key == "z") === 1)
  }

  test("session aggregate merges sessions across microbatches (streaming)") {
    val in = MemoryStream[(String, Long)]
    val agg = new KStream(in.toDS().map { case (k, t) =>
      KV(k, 1, new java.sql.Timestamp(t)) })
      .groupByKey
      .windowedBy(SessionWindow(java.time.Duration.ofMillis(30)))
      .aggregate(() => 0L)((_, v, acc) => acc + v)
    // streaming session windows support append (emit on close), not update
    val q = start(agg.changelog, "t_sess_agg", "append")

    in.addData(("k", 0L), ("k", 20L)); q.processAllAvailable()
    // 40 extends the merged session [0, 70) in a LATER batch
    in.addData(("k", 40L)); q.processAllAvailable()
    // 200 starts a fresh session; advancing events push the watermark past
    // both session ends so append mode emits them
    in.addData(("k", 200L)); q.processAllAvailable()
    in.addData(("z", 10000L)); q.processAllAvailable()
    in.addData(("z", 20000L)); q.processAllAvailable()

    val state = latest(spark.table("t_sess_agg").as[Upsert[Windowed[String], Long]]
      .collect().map(u => Upsert(u.key.start.getTime -> u.key.key, u.value, u.ts)))
    assert(state((0L, "k")) === Some(3L))   // merged session folded all 3
    assert(state((200L, "k")) === Some(1L))
    // session reduce shares the same path (null-sentinel init)
    val red = new KStream(Seq(KV("r", 5, ts(0)), KV("r", 7, ts(10))).toDS())
      .groupByKey.windowedBy(SessionWindow(java.time.Duration.ofMillis(30)))
      .reduce(_ max _).changelog.collect()
    assert(red.map(_.value.get).toSeq === Seq(7))
  }

  test("windowed store fetch(key, from, to) over a materialized windowed table") {
    val in = MemoryStream[(String, Long)]
    val counted = new KStream(in.toDS().map { case (k, t) =>
      KV(k, 1, new java.sql.Timestamp(t)) })
      .groupByKey.windowedBy(TumblingWindow.of(1000)).count
    val registry = new graft.iq.StoreRegistry(spark)
    val q = registry.materialize(counted, "win_store")
    queries = q :: queries

    in.addData(("k", 100L), ("k", 1500L), ("k", 2500L), ("z", 150L))
    q.processAllAvailable()

    val fetched = registry.fetch("win_store", "k", 0L, 1999L).collect()
    assert(fetched.length === 2) // windows [0,1000) and [1000,2000), not [2000,3000)
  }
}

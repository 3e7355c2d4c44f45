package graft.queries

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables
import graft.dsl._
import GraftQuery.q

/** Oracle-checked queries that run THROUGH the typed DSL (KStream/KTable +
  * the custom stateful ops) on the batch façade — proving the DSL layer
  * produces the same results as plain SQL, not just the hand-built
  * DataFrame plans.
  */
object DslQueries {

  private def eventsKV(s: SparkSession, d: String) = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("value"), col("ts"))
      .as[(Long, String, Double, Timestamp)]
      .map { case (u, e, v, t) => KV(u, (e, v), t) }
  }

  /** Flagship §7.2 slice via DSL: stream → flatMapValues → selectKey →
    * groupByKey → count (word count over documents).
    */
  val qDslWordcount = q(
    "q_dsl_wordcount",
    "SELECT word, count(*) AS cnt FROM (" +
      "SELECT unnest(string_split(text, ' ')) AS word FROM documents) " +
      "WHERE word <> '' GROUP BY word") { (s, d) =>
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, text) =>
        KV(id, text, new Timestamp(0L))
      }
    new KStream(docs)
      .flatMapValues(_.split(" ").toSeq.filter(_.nonEmpty))
      .selectKey((_, w) => w)
      .groupByKey
      .count
      .changelog
      .select(col("key").as("word"), col("value").as("cnt"))
  }

  /** `KStream.flatMap` via DSL (`IKStream.cs` FlatMap: 1 → N records with
    * NEW keys — the re-keying distinguishes it from flatMapValues): each
    * event fans out to its own type bucket plus a global "all" bucket, then
    * groupByKey.count.
    */
  val qDslFlatMap = q(
    "q_dsl_flat_map",
    "SELECT k, count(*) AS cnt FROM (" +
      "SELECT event_type AS k FROM events " +
      "UNION ALL SELECT 'all' AS k FROM events) GROUP BY k") { (s, d) =>
    import s.implicits._
    new KStream(eventsKV(s, d))
      .flatMap((_, v) => Seq(v._1 -> v._2, "all" -> v._2))
      .groupByKey
      .count
      .changelog
      .select(col("key").as("k"), col("value").as("cnt"))
  }

  /** Tumbling-window count via DSL windowedBy (same oracle as
    * q_window_tumbling).
    */
  val qDslWindowedCount = q(
    "q_dsl_windowed_count",
    "SELECT epoch_ms(date_trunc('hour', ts)) AS wstart, event_type, " +
      "count(*) AS cnt FROM events GROUP BY 1, 2") { (s, d) =>
    import s.implicits._
    new KStream(eventsKV(s, d))
      .selectKey((_, v) => v._1)
      .groupByKey
      .windowedBy(TumblingWindow.of(3600000L))
      .count
      .changelog
      .select(unix_millis(col("key.start")).as("wstart"),
        col("key.key").as("event_type"), col("value").as("cnt"))
  }

  /** CUSTOM window shape via DSL ([[graft.dsl.CustomWindow]], the
    * reference's `WindowOptions` subclassing surface): BUSINESS-WEEK
    * windows [Monday 00:00, Saturday 00:00) — weekend events belong to NO
    * window, a shape the fixed grid (and Spark's native `window()`, even
    * with startTime offsets) cannot express. Oracle: weekday filter +
    * Monday truncation (DuckDB weeks start Monday, `dayofweek` 1–5 =
    * Mon–Fri).
    */
  val qDslCustomWindow = q(
    "q_dsl_custom_window",
    "SELECT epoch_ms(date_trunc('week', ts)) AS wstart, event_type, " +
      "count(*) AS cnt FROM events " +
      "WHERE dayofweek(ts) BETWEEN 1 AND 5 GROUP BY 1, 2") { (s, d) =>
    import s.implicits._
    // epoch day 0 (1970-01-01) was a Thursday: weekday 0=Mon … 6=Sun
    val businessWeek: Long => Seq[(Long, Long)] = { tsMs =>
      val day = 86400000L
      val dayIndex = java.lang.Math.floorDiv(tsMs, day)
      val weekday = java.lang.Math.floorMod(dayIndex + 3, 7)
      if (weekday >= 5) Nil // Sat/Sun: unassigned
      else {
        val monday = (dayIndex - weekday) * day
        Seq((monday, monday + 5 * day))
      }
    }
    new KStream(eventsKV(s, d))
      .selectKey((_, v) => v._1)
      .groupByKey
      .windowedBy(CustomWindow(businessWeek, java.time.Duration.ofDays(5)))
      .count
      .changelog
      .select(unix_millis(col("key.start")).as("wstart"),
        col("key.key").as("event_type"), col("value").as("cnt"))
  }

  /** KGroupedTable add/subtract path via DSL: events → toTable (latest per
    * user) → groupBy(event_type) → count. Equals a plain count over the
    * latest view.
    */
  val qDslTableGroupBy = q(
    "q_dsl_table_groupby",
    "SELECT event_type, count(*) AS cnt FROM (" +
      "SELECT * EXCLUDE rn FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
      "FROM events) WHERE rn = 1) GROUP BY event_type") { (s, d) =>
    import s.implicits._
    // tie-break matches the oracle: (ts, event_id) descending
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
      .as[(Long, String, Long, Timestamp)]
      .map { case (u, e, id, t) => KV(u, e, new Timestamp(t.getTime * 1000 + (id % 1000))) }
    new KStream(ev)
      .toTable
      .groupBy((_, etype) => (etype, 1))
      .count
      .view
      .toDF("event_type", "cnt")
  }

  /** KGroupedTable.reduce via DSL: events → toTable (latest per user) →
    * groupBy(event_type, value) → reduce(max). Max is order-independent and
    * compares existing doubles bit-for-bit (no arithmetic), so the fold is
    * oracle-exact.
    */
  val qDslTableReduce = q(
    "q_dsl_table_reduce",
    "SELECT event_type, max(value) AS max_v FROM (" +
      "SELECT * EXCLUDE rn FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
      "FROM events) WHERE rn = 1) GROUP BY event_type") { (s, d) =>
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"), col("ts"))
      .as[(Long, String, Long, Double, Timestamp)]
      .map { case (u, e, id, v, t) => KV(u, (e, v), new Timestamp(t.getTime * 1000 + (id % 1000))) }
    new KStream(ev)
      .toTable
      .groupBy((_, v) => (v._1, v._2))
      .reduce((a, b) => math.max(a, b), (agg, _) => agg)
      .view
      .toDF("event_type", "max_v")
  }

  /** Stream-table join via the DSL's dual-state stateful op: lineitem stream
    * enriched by the orders table, then aggregated (same oracle as
    * q_join_stream_table). Integer-cents fold keeps the sum exact.
    */
  val qDslStreamTableJoin = q(
    "q_dsl_stream_table_join",
    "SELECT o_orderpriority, count(*) AS cnt, " +
      s"${Exact.sumScaledSql("l_extendedprice * (1 - l_discount)", 10000)} AS revenue_e4 " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "GROUP BY o_orderpriority") { (s, d) =>
    import s.implicits._
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"), col("l_shipdate"))
      .as[(Long, Double, Double, Timestamp)]
      .map { case (k, p, disc, t) => KV(k, math.round(p * (1 - disc) * 10000), t) }
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
      .as[(Long, String, Timestamp)]
      .map { case (k, pr, t) => Upsert(k, Some(pr), new Timestamp(0L)) }
    // orders is one row per key — withUniqueKeys routes the batch join to
    // the scan -> equi-join fast path (no as-of union + window shuffle)
    new KStream(li)
      .join(new KTable(orders).withUniqueKeys)((revE4, priority) => (priority, revE4))
      .selectKey((_, v) => v._1)
      .groupByKey
      .aggregate(() => (0L, 0L))((_, v, acc) => (acc._1 + 1L, acc._2 + v._2))
      .changelog
      .select(col("key").as("o_orderpriority"),
        col("value._1").as("cnt"), col("value._2").as("revenue_e4"))
  }

  /** KTable ⋈ KTable through the DSL's dual-state changelog join: latest
    * order per customer (toTable materialization with (date, orderkey)
    * ordering packed into the event time) joined to the customer table —
    * same oracle as the hand-built q_table_table_join.
    */
  val qDslTableTableJoin = q(
    "q_dsl_table_table_join",
    "SELECT c_custkey, c_name, o_orderkey, o_totalprice FROM customer JOIN (" +
      "SELECT * EXCLUDE rn FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
      "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn " +
      "FROM orders) WHERE rn = 1) ON c_custkey = o_custkey") { (s, d) =>
    import s.implicits._
    // pack (o_orderdate, o_orderkey) into the event time so latest-per-key
    // picks the same row as the oracle's two-level ORDER BY (orderkey < 2^20)
    val orderT = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("odms"))
      .as[(Long, Long, Double, Long)]
      .map { case (ck, ok, tp, odms) =>
        // days-since-epoch (not ms — Catalyst micros would overflow int64)
        KV(ck, (ok, tp), new Timestamp((odms / 86400000L) * (1L << 20) + ok)) }
    val custT = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"))
      .as[(Long, String)]
      .map { case (ck, nm) => Upsert(ck, Some(nm), new Timestamp(0L)) }
    new KTable(custT)
      .join(new KStream(orderT).toTable)((name, ord) => (name, ord._1, ord._2))
      .view
      .select(col("_1").as("c_custkey"), col("_2._1").as("c_name"),
        col("_2._2").as("o_orderkey"), col("_2._3").as("o_totalprice"))
  }

  /** Foreign-key table-table join (KIP-213 superset): every order joins the
    * customer row referenced by o_custkey; result keyed by the order key.
    * Batch fast path = plain equi-join on the extracted key (broadcast-able).
    */
  val qFkJoin = q(
    "q_fk_join",
    "SELECT o_orderkey, c_name, o_totalprice FROM orders " +
      "JOIN customer ON o_custkey = c_custkey") { (s, d) =>
    import s.implicits._
    val orders = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
      .map { case (ok, ck, tp) => Upsert(ok, Some((ck, tp)), new Timestamp(0L)) }
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"))
      .as[(Long, String)]
      .map { case (ck, nm) => Upsert(ck, Some(nm), new Timestamp(0L)) }
    new KTable(orders).withUniqueKeys
      .fkJoin(new KTable(cust).withUniqueKeys)(_._1)((o, name) => (name, o._2))
      .view
      .select(col("_1").as("o_orderkey"), col("_2._1").as("c_name"),
        col("_2._2").as("o_totalprice"))
  }

  /** FK LEFT join with tombstoned right rows: the nation table is filtered
    * through `KTable.filter` (failing rows become tombstones), so customers
    * of filtered-out nations exercise the unmatched-left path.
    */
  val qFkLeftJoin = q(
    "q_fk_left_join",
    "SELECT c_custkey, coalesce(n_name, 'none') AS nation FROM customer " +
      "LEFT JOIN (SELECT * FROM nation WHERE n_regionkey = 1) " +
      "ON c_nationkey = n_nationkey") { (s, d) =>
    import s.implicits._
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"))
      .as[(Long, Long)]
      .map { case (ck, nk) => Upsert(ck, Some(nk), new Timestamp(0L)) }
    val nation = Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .as[(Long, String, Long)]
      .map { case (nk, nm, rk) => Upsert(nk, Some((nm, rk)), new Timestamp(0L)) }
    new KTable(cust).withUniqueKeys
      .fkLeftJoin(new KTable(nation).withUniqueKeys.filter((_, v) => v._2 == 1L))(identity)(
        (_, n) => n.map(_._1).getOrElse("none"))
      .view
      .select(col("_1").as("c_custkey"), col("_2").as("nation"))
  }

  /** Session-window `aggregate` via the DSL's typed fold (same session
    * detection oracle as q_window_session): per-user 30-minute-gap sessions
    * with a custom (count, integer-cents sum) fold.
    */
  val qDslSessionAgg = q(
    "q_dsl_session_agg",
    "WITH x AS (SELECT user_id, ts, value, CASE WHEN lag(ts) OVER " +
      "(PARTITION BY user_id ORDER BY ts) IS NULL OR " +
      "ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE " +
      "THEN 1 ELSE 0 END AS brk FROM events), " +
      "y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts " +
      "ROWS UNBOUNDED PRECEDING) AS sess FROM x) " +
      "SELECT user_id, epoch_ms(min(ts)) AS session_start, count(*) AS cnt, " +
      s"${Exact.sumScaledSql("value", 100)} AS sv_c FROM y GROUP BY user_id, sess") {
    (s, d) =>
      import s.implicits._
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("value"), col("ts"))
        .as[(Long, Double, Timestamp)]
        .map { case (u, v, t) => KV(u, v, t) }
      new KStream(ev).groupByKey
        .windowedBy(SessionWindow(java.time.Duration.ofMinutes(30)))
        .aggregate(() => (0L, 0L))((_, v, acc) =>
          (acc._1 + 1L, acc._2 + math.floor(v * 100 + 0.5).toLong))
        .changelog
        .select(col("key.key").as("user_id"),
          unix_millis(col("key.start")).as("session_start"),
          col("value._1").as("cnt"), col("value._2").as("sv_c"))
  }

  /** `KStream.deduplicate` batch path: first event per user in event-time
    * order, ties broken by event_id on BOTH sides so the check is
    * deterministic at any scale factor (not just the tie-free sf0.01/0.1).
    */
  val qDslDedup = q(
    "q_dsl_dedup",
    "SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM (" +
      "SELECT user_id, event_id, ts, " +
      "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn " +
      "FROM events) WHERE rn = 1") { (s, d) =>
    import s.implicits._
    new KStream(Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"))
        .as[(Long, Long, Timestamp)]
        .map { case (u, e, t) => KV(u, e, t) })
      .deduplicate(withinMs = 3600000L, tieBreak = Seq(col("value")))
      .toDF
      .select(col("key").as("user_id"), col("value").as("event_id"),
        unix_millis(col("ts")).as("ts_ms"))
  }

  val all: Seq[GraftQuery] = Seq(
    qDslWordcount, qDslFlatMap, qDslWindowedCount, qDslCustomWindow,
    qDslTableGroupBy,
    qDslTableReduce, qDslStreamTableJoin, qDslTableTableJoin, qFkJoin,
    qFkLeftJoin, qDslSessionAgg, qDslDedup)
}

package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import GraftQuery.q

/** Time-windowed aggregations (SURVEY §2.7): tumbling, hopping, session.
  * Reference: TumblingWindowOptions / HoppingWindowOptions / (session =
  * Spark-native superset; reference has only the store interfaces).
  * Window starts are emitted as epoch-millis BIGINTs so the DuckDB compare is
  * timestamp-format-agnostic.
  */
object WindowQueries {

  /** Tumbling 1 h window count per event_type
    * (ITimeWindowedKStream.Count; KStreamWindowAggregateProcessor).
    */
  val qWindowTumbling = q(
    "q_window_tumbling",
    "SELECT epoch_ms(date_trunc('hour', ts)) AS wstart, event_type, " +
      "count(*) AS cnt FROM events GROUP BY 1, 2") { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("wstart"),
        col("event_type"), col("cnt"))
  }

  /** Tumbling 6 h aggregate per user (windowed Aggregate; result timestamp =
    * window start). 6 h windows align to the epoch, matching integer division
    * on epoch-millis.
    */
  val qWindowAgg = q(
    "q_window_agg",
    "SELECT (epoch_ms(ts) // 21600000) * 21600000 AS wstart, user_id, " +
      s"count(*) AS cnt, ${Exact.sumScaledSql("value", 100)} AS sv_c FROM events GROUP BY 1, 2") { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "6 hours"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), Exact.sumScaled(col("value"), 100).as("sv_c"))
      .select(unix_millis(col("window.start")).as("wstart"),
        col("user_id"), col("cnt"), col("sv_c"))
  }

  /** Hopping window (size 1 h, advance 30 min) — each record lands in exactly
    * two windows (HoppingWindowOptions.WindowsFor).
    */
  val qWindowHopping = q(
    "q_window_hopping",
    "WITH e AS (SELECT (epoch_ms(ts) // 1800000) * 1800000 AS s0, event_type, value FROM events) " +
      s"SELECT wstart, event_type, count(*) AS cnt, ${Exact.sumScaledSql("value", 100)} AS sv_c FROM (" +
      "SELECT s0 AS wstart, event_type, value FROM e " +
      "UNION ALL SELECT s0 - 1800000 AS wstart, event_type, value FROM e) " +
      "GROUP BY wstart, event_type") { (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), Exact.sumScaled(col("value"), 100).as("sv_c"))
      .select(unix_millis(col("window.start")).as("wstart"),
        col("event_type"), col("cnt"), col("sv_c"))
  }

  /** Session window, 30 min inactivity gap per user (Spark-native superset —
    * reference roadmaps sessions but never implemented them, feature.md:7).
    * Oracle: classic gaps-and-islands segmentation.
    */
  val qWindowSession = q(
    "q_window_session",
    "WITH x AS (SELECT user_id, ts, value, CASE WHEN lag(ts) OVER " +
      "(PARTITION BY user_id ORDER BY ts) IS NULL OR " +
      "ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts) > INTERVAL 30 MINUTE " +
      "THEN 1 ELSE 0 END AS brk FROM events), " +
      "y AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts " +
      "ROWS UNBOUNDED PRECEDING) AS sess FROM x) " +
      "SELECT user_id, epoch_ms(min(ts)) AS session_start, count(*) AS cnt, " +
      s"${Exact.sumScaledSql("value", 100)} AS sv_c FROM y GROUP BY user_id, sess") { (s, d) =>
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("cnt"), Exact.sumScaled(col("value"), 100).as("sv_c"))
      .select(unix_millis(col("session_window.start")).as("session_start"),
        col("user_id"), col("cnt"), col("sv_c"))
      .select("user_id", "session_start", "cnt", "sv_c")
  }

  /** Grace period / late-data drop (KStreamWindowAggregateProcessor:52-58):
    * batch façade of "records later than watermark are dropped" — per-key
    * stream-time is the max ts; drop events older than stream-time − 7 days,
    * then tumbling-count. (Streaming path = withWatermark; see dsl specs.)
    */
  val qWindowGrace = q(
    "q_window_grace",
    "WITH m AS (SELECT max(ts) AS mx FROM events) " +
      "SELECT epoch_ms(date_trunc('day', ts)) AS wstart, count(*) AS cnt " +
      "FROM events, m WHERE ts >= mx - INTERVAL 7 DAY GROUP BY 1") { (s, d) =>
    val ev = Tables.events(s, d)
    val mx = ev.agg(max("ts").as("mx"))
    ev.join(broadcast(mx))
      .filter(col("ts") >= col("mx") - expr("INTERVAL 7 DAYS"))
      .groupBy(window(col("ts"), "1 day"))
      .agg(count(lit(1)).as("cnt"))
      .select(unix_millis(col("window.start")).as("wstart"), col("cnt"))
  }

  /** Sliding 1 h window (KIP-450 analog, superset — absent in the reference):
    * one window [t − 1h, t] per distinct record timestamp, via the DSL's
    * RANGE-frame batch path (codegen'd, one shuffle, no explosion).
    */
  val qWindowSliding = q(
    "q_window_sliding",
    "SELECT DISTINCT event_type, epoch_ms(ts) - 3600000 AS wstart, " +
      "epoch_ms(ts) AS wend, count(*) OVER (PARTITION BY event_type " +
      "ORDER BY epoch_ms(ts) RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS cnt " +
      "FROM events") { (s, d) =>
    import s.implicits._
    import graft.dsl._
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("ts"))
      .as[(String, java.sql.Timestamp)]
      .map { case (et, t) => KV(et, 1, t) }
    new KStream(ev).groupByKey
      .windowedBy(SlidingWindow.of(3600000L))
      .count
      .changelog
      .select(col("key.key").as("event_type"),
        unix_millis(col("key.start")).as("wstart"),
        unix_millis(col("key.end")).as("wend"), col("value").as("cnt"))
  }

  val all: Seq[GraftQuery] = Seq(
    qWindowTumbling, qWindowAgg, qWindowHopping, qWindowSession, qWindowGrace,
    qWindowSliding)
}

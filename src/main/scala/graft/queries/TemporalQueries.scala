package graft.queries

import graft.Tables
import graft.operators.Temporal
import org.apache.spark.sql.functions._
import GraftQuery.q

/** Temporal-join queries over [[graft.operators.Temporal]]: point-in-time
  * (as-of) and keyless point-in-interval (range) joins — the two warehouse
  * temporal shapes the keyed interval join (`q_interval_join`) doesn't
  * cover. Timestamps are emitted as epoch-millis BIGINTs so the DuckDB
  * compare is timestamp-format-agnostic (house rule from WindowQueries).
  */
object TemporalQueries {

  /** As-of join: each purchase picks the latest at-or-before view by the
    * same user (NULL when the user never viewed before buying). The oracle
    * mirrors the exact tie rule — max qualifying ts, then max view id —
    * with a two-level argmax, deliberately NOT a vendor ASOF JOIN (whose
    * tie-breaking is unspecified).
    */
  val qAsofJoin = q(
    "q_asof_join",
    "WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'), " +
      "v AS (SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view'), " +
      "m AS (SELECT p.event_id, max(v.ts) AS ats FROM p LEFT JOIN v " +
      "ON v.user_id = p.user_id AND v.ts <= p.ts GROUP BY p.event_id) " +
      "SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms, " +
      "epoch_ms(m.ats) AS asof_ts_ms, max(v.view_id) AS asof_view_id " +
      "FROM p JOIN m ON m.event_id = p.event_id " +
      "LEFT JOIN v ON v.user_id = p.user_id AND v.ts = m.ats " +
      "GROUP BY 1, 2, 3, 4") { (s, d) =>
    val e = Tables.events(s, d)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = e.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
    Temporal.asofJoin(p, v, Seq("user_id"), "ts", "vts", Seq("view_id"))
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        unix_millis(col("asof_vts")).as("asof_ts_ms"),
        col("asof_view_id"))
  }

  /** Nearest-direction as-of join: each purchase picks the CLOSER of its
    * latest at-or-before view and earliest at-or-after view (exact ms
    * distance; equidistant → the backward match; greatest view id on a
    * same-timestamp tie). The oracle states both argmaxes and the
    * nearest pick naively; the Spark side must reproduce it through the
    * one-shuffle dual-window form.
    */
  val qAsofNearest = q(
    "q_asof_nearest",
    "WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'), " +
      "v AS (SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view'), " +
      "mb AS (SELECT p.event_id, max(v.ts) AS bts FROM p LEFT JOIN v " +
      "ON v.user_id = p.user_id AND v.ts <= p.ts GROUP BY p.event_id), " +
      "mf AS (SELECT p.event_id, min(v.ts) AS fts FROM p LEFT JOIN v " +
      "ON v.user_id = p.user_id AND v.ts >= p.ts GROUP BY p.event_id), " +
      "c AS (SELECT p.event_id, p.user_id, p.ts, " +
      "CASE WHEN bts IS NULL THEN fts WHEN fts IS NULL THEN bts " +
      "WHEN epoch_ms(fts) - epoch_ms(p.ts) < epoch_ms(p.ts) - epoch_ms(bts) " +
      "THEN fts ELSE bts END AS ats " +
      "FROM p JOIN mb USING (event_id) JOIN mf USING (event_id)) " +
      "SELECT c.event_id, c.user_id, epoch_ms(c.ts) AS ts_ms, " +
      "epoch_ms(c.ats) AS asof_ts_ms, max(v.view_id) AS asof_view_id " +
      "FROM c LEFT JOIN v ON v.user_id = c.user_id AND v.ts = c.ats " +
      "GROUP BY 1, 2, 3, 4") { (s, d) =>
    val e = Tables.events(s, d)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = e.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
    Temporal.asofJoin(p, v, Seq("user_id"), "ts", "vts", Seq("view_id"),
        direction = "nearest")
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        unix_millis(col("asof_vts")).as("asof_ts_ms"),
        col("asof_view_id"))
  }

  /** Keyless range join: urgent orders open a 1–3 day window from their
    * order date; every lineitem shipped inside ANY such window matches it
    * (no key relates the two sides). Output: per-window point count + exact
    * scaled quantity, zero-count windows kept — locking both the pairing
    * and the inner-join drop semantics. The oracle states the naive range
    * predicate; the Spark side must reproduce it through the bucketized
    * equi-join (2-day buckets ≈ the median window length).
    */
  val qRangeJoin = q(
    "q_range_join",
    "WITH iv AS (SELECT o_orderkey, o_orderdate AS ws, " +
      "o_orderdate + ((o_orderkey % 3) + 1) * INTERVAL 1 DAY AS we " +
      "FROM orders WHERE o_orderpriority = '1-URGENT'), " +
      "j AS (SELECT o_orderkey, count(*) AS n_pts, " +
      s"${Exact.sumScaledSql("l_quantity", 100)} AS qty_c " +
      "FROM iv JOIN lineitem ON l_shipdate >= ws AND l_shipdate <= we GROUP BY 1) " +
      "SELECT iv.o_orderkey, coalesce(j.n_pts, 0) AS n_pts, " +
      "coalesce(j.qty_c, 0) AS qty_c FROM iv LEFT JOIN j USING (o_orderkey)") { (s, d) =>
    val iv = Tables.orders(s, d)
      .where(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_orderdate").as("ws"),
        expr("o_orderdate + make_dt_interval(CAST(o_orderkey % 3 AS INT) + 1)").as("we"))
    // aggregate pushdown through the range join: the output is
    // per-interval SUM/COUNT, so collapse points to one partial row per
    // DISTINCT timeline value first (≈2.5k ship dates vs 600k lineitems
    // at sf0.1) and re-sum after the join — the ~15M-row matched pair
    // set is never materialized (measured 8.8 → 0.9 s, SCALE.md)
    val pts = Tables.lineitem(s, d).select(col("l_quantity"), col("l_shipdate"))
      .groupBy("l_shipdate")
      .agg(count(lit(1)).as("__n"), Exact.sumScaled(col("l_quantity"), 100).as("__q"))
    val matched = Temporal
      .rangeJoin(pts, iv, "l_shipdate", "ws", "we", bucketMs = 2L * 86400000L)
      .groupBy("o_orderkey")
      .agg(sum(col("__n")).as("n_pts"), sum(col("__q")).as("qty_c"))
    iv.select("o_orderkey")
      .join(matched, Seq("o_orderkey"), "left")
      .select(col("o_orderkey"),
        coalesce(col("n_pts"), lit(0L)).as("n_pts"),
        coalesce(col("qty_c"), lit(0L)).as("qty_c"))
  }

  /** Time-series resample with forward-fill: daily order counts + exact
    * scaled revenue per priority, DENSIFIED over each priority's
    * [first, last] order-day span — empty days exist (≈1.2 orders/day/
    * priority at sf0.01) and must carry the previous day's values. The
    * oracle builds the dense spine with `range()` and mirrors the fill
    * with IGNORE NULLS last_value; the Spark side must produce it via
    * the span-explode + left-join + running-window form.
    */
  val qResampleFfill = q(
    "q_resample_ffill",
    "WITH b AS (SELECT o_orderpriority, " +
      "CAST(floor(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) / 86400000) AS BIGINT) " +
      "* 86400000 AS bucket, CAST(count(*) AS BIGINT) AS n_orders, " +
      s"${Exact.sumScaledSql("o_totalprice", 100)} AS rev_c " +
      "FROM orders GROUP BY 1, 2), " +
      "s AS (SELECT o_orderpriority, unnest(range(min(bucket), max(bucket) + 1, " +
      "86400000)) AS bucket FROM b GROUP BY o_orderpriority), " +
      "j AS (SELECT s.o_orderpriority, s.bucket, b.n_orders, b.rev_c " +
      "FROM s LEFT JOIN b USING (o_orderpriority, bucket)) " +
      "SELECT o_orderpriority, bucket, " +
      "last_value(n_orders IGNORE NULLS) OVER w AS n_orders, " +
      "last_value(rev_c IGNORE NULLS) OVER w AS rev_c FROM j " +
      "WINDOW w AS (PARTITION BY o_orderpriority ORDER BY bucket " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)") { (s, d) =>
    Temporal.resample(
      Tables.orders(s, d).select("o_orderpriority", "o_orderdate", "o_totalprice"),
      Seq("o_orderpriority"), "o_orderdate", bucketMs = 86400000L,
      aggs = Seq(count(lit(1)).as("n_orders"),
        Exact.sumScaled(col("o_totalprice"), 100).as("rev_c")),
      fill = "ffill")
  }

  /** Sweep-line interval concurrency: how many urgent-order windows
    * ([orderdate, orderdate + 1–3 days), half-open) are open at once,
    * per priority class, as the full step function. The oracle counts
    * covering intervals per boundary instant DIRECTLY (`ws <= t < we`
    * join — a formulation independent of the sweep), so the netted
    * running sum is cross-checked against first principles, including
    * instants where the count drops to zero.
    */
  val qConcurrency = q(
    "q_concurrency",
    "WITH iv AS (SELECT o_orderpriority AS p, " +
      "epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS ws, " +
      "epoch_ms(CAST(o_orderdate AS TIMESTAMP) + " +
      "((o_orderkey % 3) + 1) * INTERVAL 1 DAY) AS we FROM orders " +
      "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')), " +
      "ts AS (SELECT DISTINCT p, t FROM " +
      "(SELECT p, ws AS t FROM iv UNION ALL SELECT p, we FROM iv)) " +
      "SELECT ts.p AS o_orderpriority, ts.t, " +
      "CAST(count(iv.ws) AS BIGINT) AS concurrency FROM ts " +
      "LEFT JOIN iv ON iv.p = ts.p AND iv.ws <= ts.t AND ts.t < iv.we " +
      "GROUP BY 1, 2") { (s, d) =>
    val iv = Tables.orders(s, d)
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderpriority"), col("o_orderdate").as("ws"),
        expr("o_orderdate + make_dt_interval(CAST(o_orderkey % 3 AS INT) + 1)").as("we"))
    Temporal.concurrency(iv, Seq("o_orderpriority"), "ws", "we")
  }

  /** Tolerance-gated as-of join (pandas `merge_asof(tolerance=…)`): the
    * backward query's shape with matches farther than 7 days nulled —
    * the oracle adds the window to its qualifying predicate, the Spark
    * side must reproduce it through the per-candidate post-filter on the
    * SAME one-shuffle plan.
    */
  val qAsofTolerance = q(
    "q_asof_tolerance",
    "WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'), " +
      "v AS (SELECT event_id AS view_id, user_id, ts FROM events WHERE event_type = 'view'), " +
      "m AS (SELECT p.event_id, max(v.ts) AS ats FROM p LEFT JOIN v " +
      "ON v.user_id = p.user_id AND v.ts <= p.ts " +
      "AND epoch_ms(p.ts) - epoch_ms(v.ts) <= 604800000 GROUP BY p.event_id) " +
      "SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms, " +
      "epoch_ms(m.ats) AS asof_ts_ms, max(v.view_id) AS asof_view_id " +
      "FROM p JOIN m ON m.event_id = p.event_id " +
      "LEFT JOIN v ON v.user_id = p.user_id AND v.ts = m.ats " +
      "GROUP BY 1, 2, 3, 4") { (s, d) =>
    val e = Tables.events(s, d)
    val p = e.where(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val v = e.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("vts"))
    Temporal.asofJoin(p, v, Seq("user_id"), "ts", "vts", Seq("view_id"),
        toleranceMs = Some(604800000L))
      .select(col("event_id"), col("user_id"),
        unix_millis(col("ts")).as("ts_ms"),
        unix_millis(col("asof_vts")).as("asof_ts_ms"),
        col("asof_view_id"))
  }

  /** Time-series resample with LINEAR interpolation: the ffill query's
    * shape, but interior gap days take the floor of the exact integer
    * interpolant between the surrounding observed days (leading/trailing
    * gaps stay NULL). Both engines compute `prev + ⌊Δv·steps/total⌋` with
    * a true floor division built from `%` (DuckDB's `//` truncates, so
    * the oracle spells the same mod-trick the Spark side uses) — an
    * integer-exact contract with zero float drift, negative deltas
    * included.
    */
  val qResampleInterp = q(
    "q_resample_interp",
    "WITH b AS (SELECT o_orderpriority, " +
      "CAST(floor(epoch_ms(CAST(o_orderdate AS TIMESTAMP)) / 86400000) AS BIGINT) " +
      "* 86400000 AS bucket, CAST(count(*) AS BIGINT) AS n_orders, " +
      s"${Exact.sumScaledSql("o_totalprice", 100)} AS rev_c " +
      "FROM orders GROUP BY 1, 2), " +
      "s AS (SELECT o_orderpriority, unnest(range(min(bucket), max(bucket) + 1, " +
      "86400000)) AS bucket FROM b GROUP BY o_orderpriority), " +
      "j AS (SELECT s.o_orderpriority, s.bucket, b.n_orders, b.rev_c " +
      "FROM s LEFT JOIN b USING (o_orderpriority, bucket)), " +
      "w AS (SELECT o_orderpriority, bucket, n_orders, rev_c, " +
      "last_value(n_orders IGNORE NULLS) OVER wb AS pn, " +
      "first_value(n_orders IGNORE NULLS) OVER wf AS nn, " +
      "last_value(rev_c IGNORE NULLS) OVER wb AS pr, " +
      "first_value(rev_c IGNORE NULLS) OVER wf AS nr, " +
      "(bucket - last_value(CASE WHEN n_orders IS NOT NULL THEN bucket END " +
      "IGNORE NULLS) OVER wb) // 86400000 AS steps, " +
      "(first_value(CASE WHEN n_orders IS NOT NULL THEN bucket END " +
      "IGNORE NULLS) OVER wf - last_value(CASE WHEN n_orders IS NOT NULL " +
      "THEN bucket END IGNORE NULLS) OVER wb) // 86400000 AS total FROM j " +
      "WINDOW wb AS (PARTITION BY o_orderpriority ORDER BY bucket " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), " +
      "wf AS (PARTITION BY o_orderpriority ORDER BY bucket " +
      "ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)) " +
      "SELECT o_orderpriority, bucket, " +
      "CASE WHEN n_orders IS NOT NULL THEN n_orders " +
      "WHEN pn IS NULL OR nn IS NULL THEN NULL ELSE pn + CAST((" +
      "(nn - pn) * steps - ((((nn - pn) * steps % total) + total) % total)" +
      ") / total AS BIGINT) END AS n_orders, " +
      "CASE WHEN rev_c IS NOT NULL THEN rev_c " +
      "WHEN pr IS NULL OR nr IS NULL THEN NULL ELSE pr + CAST((" +
      "(nr - pr) * steps - ((((nr - pr) * steps % total) + total) % total)" +
      ") / total AS BIGINT) END AS rev_c FROM w") { (s, d) =>
    Temporal.resample(
      Tables.orders(s, d).select("o_orderpriority", "o_orderdate", "o_totalprice"),
      Seq("o_orderpriority"), "o_orderdate", bucketMs = 86400000L,
      aggs = Seq(count(lit(1)).as("n_orders"),
        Exact.sumScaled(col("o_totalprice"), 100).as("rev_c")),
      fill = "interp")
  }

  /** Gaps-and-islands merge: urgent/high orders open a 1–3 HOUR service
    * window from their (midnight) order timestamp — same-day windows per
    * priority coalesce into one island, day boundaries split. The oracle
    * states the canonical two-window SQL formulation (running max-end
    * over strictly-preceding rows marks island starts, a running sum
    * numbers them); the Spark side must reproduce it through
    * [[Temporal.mergeIntervals]]'s single-exchange plan.
    */
  val qMergeIntervals = q(
    "q_merge_intervals",
    "WITH iv AS (SELECT o_orderpriority, " +
      "epoch_ms(CAST(o_orderdate AS TIMESTAMP)) AS s, " +
      "epoch_ms(CAST(o_orderdate AS TIMESTAMP) + " +
      "((o_orderkey % 3) + 1) * INTERVAL 1 HOUR) AS e FROM orders " +
      "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')), " +
      "g AS (SELECT o_orderpriority, s, max(e) AS e, count(*) AS n " +
      "FROM iv GROUP BY 1, 2), " +
      "x AS (SELECT o_orderpriority, s, e, n, max(e) OVER " +
      "(PARTITION BY o_orderpriority ORDER BY s " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme FROM g), " +
      "y AS (SELECT o_orderpriority, s, e, n, " +
      "sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END) OVER " +
      "(PARTITION BY o_orderpriority ORDER BY s " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl FROM x) " +
      "SELECT o_orderpriority, min(s) AS island_start, max(e) AS island_end, " +
      "CAST(sum(n) AS BIGINT) AS n_intervals FROM y " +
      "GROUP BY o_orderpriority, isl") { (s, d) =>
    val iv = Tables.orders(s, d)
      .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select(col("o_orderpriority"), col("o_orderdate").as("ws"),
        expr("CAST(o_orderdate AS TIMESTAMP) + make_dt_interval(0, " +
          "CAST(o_orderkey % 3 AS INT) + 1)").as("we"))
    Temporal.mergeIntervals(iv, Seq("o_orderpriority"), "ws", "we")
  }

  /** Sessionization: per-user event sessions with a 30-minute inactivity
    * gap — the classic web-analytics shape, expressed as point-event
    * interval merge (`start = end = ts`, gap tolerance = the session
    * window). Output: one row per session with its span and event count.
    */
  val qSessionize = q(
    "q_sessionize",
    "WITH pt AS (SELECT user_id, epoch_ms(ts) AS t, count(*) AS n FROM events " +
      "WHERE ts IS NOT NULL GROUP BY 1, 2), " +
      "x AS (SELECT user_id, t, n, max(t) OVER (PARTITION BY user_id ORDER BY t " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme FROM pt), " +
      "y AS (SELECT user_id, t, n, " +
      "sum(CASE WHEN pme IS NULL OR t > pme + 1800000 THEN 1 ELSE 0 END) OVER " +
      "(PARTITION BY user_id ORDER BY t " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl FROM x) " +
      "SELECT user_id, min(t) AS session_start, max(t) AS session_end, " +
      "CAST(sum(n) AS BIGINT) AS n_events FROM y GROUP BY user_id, isl") { (s, d) =>
    Temporal.mergeIntervals(
      Tables.events(s, d).select(col("user_id"), col("ts")),
      Seq("user_id"), "ts", "ts", gapToleranceMs = 1800000L)
      .select(col("user_id"), col("island_start").as("session_start"),
        col("island_end").as("session_end"), col("n_intervals").as("n_events"))
  }

  /** The STREAMING as-of enrichment run through its batch façade
    * ([[graft.streaming.AsofEnrich.enrich]] with TimeMode.None — the same
    * `transformWithState` processor the streaming topology runs, one pass,
    * empty initial state): per user, every dimension (view) row enters the
    * per-key timeline state before any fact (purchase) is enriched, so the
    * output must equal the batch as-of join — and the oracle IS
    * `q_asof_join`'s SQL. `preferRight = max` mirrors the batch
    * greatest-payload tie rule for same-timestamp views. This is the
    * equivalence gate for the streaming operator (AsofEnrichSpec holds the
    * multi-batch replay, tolerance, and watermark-compaction contracts).
    */
  val qAsofStream = q(
    "q_asof_stream",
    qAsofJoin.oracle.get) { (s, d) =>
    import s.implicits._
    import graft.streaming.{AsofEnrich, AsofEvent}
    val evs = Tables.events(s, d)
      .where(col("event_type").isin("purchase", "view"))
      .select(col("user_id").as("key"), unix_millis(col("ts")).as("ts"),
        when(col("event_type") === "purchase", col("event_id")).as("l"),
        when(col("event_type") === "view", col("event_id")).as("r"))
      .as[(Long, Long, Option[Long], Option[Long])]
      .map(t => AsofEvent[Long, Long, Long](t._1, t._2, t._3, t._4))
    AsofEnrich.enrich(evs,
        preferRight = (a: Long, b: Long) => math.max(a, b),
        timeMode = org.apache.spark.sql.streaming.TimeMode.None())
      .toDF()
      .select(col("left").as("event_id"), col("key").as("user_id"),
        col("ts").as("ts_ms"), col("asofTs").as("asof_ts_ms"),
        col("right").as("asof_view_id"))
  }

  val all: Seq[GraftQuery] =
    Seq(qAsofJoin, qAsofNearest, qAsofTolerance, qRangeJoin, qResampleFfill,
      qResampleInterp, qConcurrency, qMergeIntervals, qSessionize, qAsofStream)
}

package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import GraftQuery.q

/** Stateless KStream operators (SURVEY §2.2) and KTable view operators
  * (SURVEY §2.3) expressed over the batch façade, plus the grouped
  * aggregations of §2.4. Reference semantics cited per query.
  */
object CoreQueries {

  /** `KStream.Filter` — reference: KStreamFilterProcessor (predicate keep). */
  val qFilter = q(
    "q_filter",
    "SELECT event_id, user_id, value FROM events " +
      "WHERE event_type = 'click' AND value > 50.0") { (s, d) =>
    Tables.events(s, d)
      .filter(col("event_type") === "click" && col("value") > 50.0)
      .select("event_id", "user_id", "value")
  }

  /** `KStream.FilterNot` — inverse predicate. */
  val qFilterNot = q(
    "q_filter_not",
    "SELECT event_id, event_type FROM events " +
      "WHERE NOT (value < 20.0 OR event_type = 'view')") { (s, d) =>
    Tables.events(s, d)
      .filter(!(col("value") < 20.0 || col("event_type") === "view"))
      .select("event_id", "event_type")
  }

  /** `KStream.Map` — re-key + re-value (1→1). */
  val qMap = q(
    "q_map",
    "SELECT user_id AS k, upper(event_type) AS etype, value * 2.0 AS v2 " +
      "FROM events") { (s, d) =>
    Tables.events(s, d).select(
      col("user_id").as("k"),
      upper(col("event_type")).as("etype"),
      (col("value") * 2.0).as("v2"))
  }

  /** `KStream.MapValues` — value-only transform, key untouched. */
  val qMapValues = q(
    "q_map_values",
    "SELECT l_orderkey, l_linenumber, l_extendedprice * (1.0 - l_discount) AS net " +
      "FROM lineitem") { (s, d) =>
    Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("net"))
  }

  /** `KStream.FlatMapValues` — 1→N values (word explode) then count. */
  val qFlatMapValues = q(
    "q_flat_map_values",
    "SELECT word, count(*) AS cnt FROM (" +
      "SELECT unnest(string_split(text, ' ')) AS word FROM documents) " +
      "WHERE word <> '' GROUP BY word") { (s, d) =>
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
  }

  /** `KStream.SelectKey` — re-key only, value untouched. */
  val qSelectKey = q(
    "q_select_key",
    "SELECT event_type AS k, event_id, value FROM events") { (s, d) =>
    Tables.events(s, d).select(
      col("event_type").as("k"), col("event_id"), col("value"))
  }

  /** `KStream.Branch` — ordered predicates, first match wins. Modeled as a
    * branch-tag + per-branch count (reference drops non-matching records; here
    * every record matches the final else branch).
    */
  val qBranch = q(
    "q_branch",
    "SELECT CASE WHEN value < 50 THEN 'low' WHEN value < 120 THEN 'mid' " +
      "ELSE 'high' END AS branch, count(*) AS cnt, " +
      s"${Exact.sumScaledSql("value", 100)} AS sv_c FROM events GROUP BY 1") { (s, d) =>
    Tables.events(s, d)
      .withColumn("branch",
        when(col("value") < 50, "low")
          .when(col("value") < 120, "mid")
          .otherwise("high"))
      .groupBy("branch")
      .agg(count(lit(1)).as("cnt"), Exact.sumScaled(col("value"), 100).as("sv_c"))
  }

  /** `merge` (multi-source union) — two filtered streams unioned, re-grouped. */
  val qMerge = q(
    "q_merge",
    "SELECT user_id, count(*) AS cnt FROM (" +
      "SELECT user_id FROM events WHERE event_type = 'click' " +
      "UNION ALL SELECT user_id FROM events WHERE event_type = 'purchase') " +
      "GROUP BY user_id") { (s, d) =>
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click").select("user_id")
    val buys = ev.filter(col("event_type") === "purchase").select("user_id")
    clicks.union(buys).groupBy("user_id").agg(count(lit(1)).as("cnt"))
  }

  // ---- KTable view semantics (batch façade: final materialized state) ----

  /** `StreamBuilder.Table` / `KStream.ToTable` — latest value per key
    * (upsert-by-key; reference KTableSourceProcessor keeps last write).
    * Deterministic tie-break: ts DESC then event_id DESC.
    */
  private def latestEvents(s: org.apache.spark.sql.SparkSession, d: String) = {
    import org.apache.spark.sql.expressions.Window
    Tables.events(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  private val latestSql =
    "SELECT * EXCLUDE rn FROM (SELECT *, row_number() OVER " +
      "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
      "FROM events) WHERE rn = 1"

  val qTableLatest = q(
    "q_table_latest",
    s"SELECT user_id, event_type, value, epoch_ms(ts) AS ts_ms FROM ($latestSql)") { (s, d) =>
    latestEvents(s, d).select(
      col("user_id"), col("event_type"), col("value"),
      unix_millis(col("ts")).as("ts_ms"))
  }

  /** `KTable.Filter` — rows of the view failing the predicate disappear
    * (tombstone downstream). Final state = filtered latest rows.
    */
  val qTableFilter = q(
    "q_table_filter",
    s"SELECT user_id, value FROM ($latestSql) WHERE value > 100.0") { (s, d) =>
    latestEvents(s, d).filter(col("value") > 100.0).select("user_id", "value")
  }

  /** `KTable.MapValues` — transform the view's values. */
  val qTableMapValues = q(
    "q_table_map_values",
    s"SELECT user_id, upper(event_type) AS etype, value * 0.5 AS half " +
      s"FROM ($latestSql)") { (s, d) =>
    latestEvents(s, d).select(
      col("user_id"), upper(col("event_type")).as("etype"),
      (col("value") * 0.5).as("half"))
  }

  /** `KTable.GroupBy` + `KGroupedTable.Count` — re-keyed changelog count with
    * add/subtract semantics; final state equals a plain count over the latest
    * view (each key contributes exactly its current value).
    */
  val qTableGroupByCount = q(
    "q_table_groupby_count",
    s"SELECT event_type, count(*) AS cnt FROM ($latestSql) GROUP BY event_type") { (s, d) =>
    latestEvents(s, d).groupBy("event_type").agg(count(lit(1)).as("cnt"))
  }

  /** `KGroupedTable.Aggregate` (adder+subtractor) — final state equals the
    * aggregate over current values: sum of latest `value` per event_type.
    */
  val qTableGroupByAgg = q(
    "q_table_groupby_agg",
    s"SELECT event_type, ${Exact.sumScaledSql("value", 100)} AS sv_c FROM ($latestSql) " +
      "GROUP BY event_type") { (s, d) =>
    latestEvents(s, d).groupBy("event_type")
      .agg(Exact.sumScaled(col("value"), 100).as("sv_c"))
  }

  // ---- KGroupedStream aggregations (SURVEY §2.4) ----

  /** Flagship: TPC-H Q1-shaped grouped aggregation (`KGroupedStream.Aggregate`). */
  val q1Agg = q(
    "q1_agg",
    "SELECT l_returnflag, l_linestatus, " +
      s"${Exact.sumScaledSql("l_quantity", 100)} AS sum_qty_c, " +
      s"${Exact.sumScaledSql("l_extendedprice", 100)} AS sum_base_c, " +
      s"${Exact.sumScaledSql("l_extendedprice * (1 - l_discount)", 10000)} AS sum_disc_e4, " +
      "count(*) AS cnt " +
      "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' " +
      "GROUP BY l_returnflag, l_linestatus") { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Exact.sumScaled(col("l_quantity"), 100).as("sum_qty_c"),
        Exact.sumScaled(col("l_extendedprice"), 100).as("sum_base_c"),
        Exact.sumScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000).as("sum_disc_e4"),
        count(lit(1)).as("cnt"))
  }

  /** `KGroupedStream.Count` — running count per key (final state). */
  val qCount = q(
    "q_count",
    "SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id") { (s, d) =>
    Tables.events(s, d).groupBy("user_id").agg(count(lit(1)).as("cnt"))
  }

  /** `KGroupedStream.Reduce` — fold with V=VR; max/min are order-insensitive
    * reducers so the final state is SQL-checkable.
    */
  val qReduce = q(
    "q_reduce",
    "SELECT user_id, max(value) AS mx, min(value) AS mn FROM events GROUP BY user_id") { (s, d) =>
    Tables.events(s, d).groupBy("user_id")
      .agg(max("value").as("mx"), min("value").as("mn"))
  }

  /** `KGroupedStream.Aggregate` with custom fold (sum of squares). */
  val qAggCustom = q(
    "q_agg_custom",
    s"SELECT user_id, ${Exact.sumScaledSql("value * value", 10000)} AS ssq_e4, count(*) AS cnt " +
      "FROM events GROUP BY user_id") { (s, d) =>
    Tables.events(s, d).groupBy("user_id")
      .agg(Exact.sumScaled(col("value") * col("value"), 10000).as("ssq_e4"),
        count(lit(1)).as("cnt"))
  }

  /** Exact distinct (Spark superset op — reference has no distinct). */
  val qDistinct = q(
    "q_distinct",
    "SELECT DISTINCT user_id, event_type FROM events") { (s, d) =>
    Tables.events(s, d).select("user_id", "event_type").distinct()
  }

  /** count(distinct) per group. */
  val qCountDistinct = q(
    "q_count_distinct",
    "SELECT event_type, count(DISTINCT user_id) AS users FROM events GROUP BY event_type") { (s, d) =>
    Tables.events(s, d).groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("users"))
  }

  /** Set intersect (SURVEY §2.6 superset): users who both clicked and
    * purchased. Distinct-set semantics on both engines.
    */
  val qIntersect = q(
    "q_intersect",
    "SELECT user_id FROM events WHERE event_type = 'click' " +
      "INTERSECT SELECT user_id FROM events WHERE event_type = 'purchase'") { (s, d) =>
    val ev = Tables.events(s, d)
    ev.filter(col("event_type") === "click").select("user_id")
      .intersect(ev.filter(col("event_type") === "purchase").select("user_id"))
  }

  /** Set except (SURVEY §2.6 superset): viewers who never purchased. */
  val qExcept = q(
    "q_except",
    "SELECT user_id FROM events WHERE event_type = 'view' " +
      "EXCEPT SELECT user_id FROM events WHERE event_type = 'purchase'") { (s, d) =>
    val ev = Tables.events(s, d)
    ev.filter(col("event_type") === "view").select("user_id")
      .except(ev.filter(col("event_type") === "purchase").select("user_id"))
  }

  /** Rollup (Spark superset — multi-level aggregation). */
  val qRollup = q(
    "q_rollup",
    s"SELECT l_returnflag, l_linestatus, ${Exact.sumScaledSql("l_quantity", 100)} AS sq_c " +
      "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)") { (s, d) =>
    Tables.lineitem(s, d)
      .rollup("l_returnflag", "l_linestatus")
      .agg(Exact.sumScaled(col("l_quantity"), 100).as("sq_c"))
  }

  /** JSON value extraction from the events `props` column. */
  val qJsonExtract = q(
    "q_json_extract",
    "SELECT CAST(json_extract(props, '$.k') AS BIGINT) AS k, count(*) AS cnt " +
      "FROM events GROUP BY 1") { (s, d) =>
    Tables.events(s, d)
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy("k").agg(count(lit(1)).as("cnt"))
  }

  /** HLL approximate distinct (Spark superset). The sketch VALUE has no
    * cross-engine oracle (DuckDB's approx sketch differs), so the entry is
    * oracle-checked as a BOUNDED-ERROR assertion instead: per group, emit
    * whether the HLL estimate (rsd 0.01) lands within ±5% of the exact
    * distinct count — ~5 standard errors, deterministic for a fixed input —
    * and the DuckDB side locks the flag true for every group. The driver's
    * hash compare therefore re-proves the error bound on real data every
    * round (`q_count_distinct` still oracle-checks the exact path, and the
    * pure sketch without the exact-side comparison stage is what a 100 TB
    * run would ship).
    */
  val qApproxDistinct = q(
    "q_approx_distinct",
    "SELECT DISTINCT event_type, CAST(1 AS BIGINT) AS within_5pct FROM events") { (s, d) =>
    // HLL is duplicate-insensitive, so both sides compute over the
    // pre-distinct (event_type, user_id) pairs: one map-side-combined
    // shuffle of distinct pairs replaces countDistinct's row-doubling
    // Expand, the estimate is unchanged, and the exact side is count(*).
    // Null user_ids are excluded like countDistinct/HLL would exclude
    // them — without the filter the exact side would count a null group
    // the sketch ignores.
    Tables.events(s, d)
      .where(col("user_id").isNotNull)
      .select("event_type", "user_id").distinct()
      .groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"),
        count(lit(1)).as("exact_users"))
      .select(col("event_type"),
        (abs(col("approx_users") - col("exact_users")) <=
          col("exact_users") * 0.05).cast("long").as("within_5pct"))
  }

  /** Mergeable percentile sketch (Spark superset): one pass, map-side
    * partial sketches merged per group — the shape that replaces a full
    * sort at 100 TB. Like `q_approx_distinct`, the sketch value itself has
    * no cross-engine oracle (interpolation differs), so the entry asserts
    * the sketch's OWN contract as the oracle-checked output: `accuracy` =
    * 10000 bounds RANK error by 1/10000, so each returned value's rank
    * INTERVAL [(#<ap)+1, #≤ap]/n must intersect [q−0.011, q+0.011] — a
    * 100×-margined, genuinely distribution-free check (an interpolated
    * exact-percentile band is NOT: `percentile(0.49)` on a 2-row group
    * interpolates to a value the sketch's returned DATA value can
    * legitimately sit below). The flag is locked true per group by the
    * DuckDB side. Plan: the window and the groupBy share the
    * `event_type` partitioning — one exchange total.
    */
  val qApproxQuantile = q(
    "q_approx_quantile",
    "SELECT DISTINCT event_type, CAST(1 AS BIGINT) AS within_rank_tol FROM events") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val targets = Seq(0.5, 0.95, 0.99)
    val tol = 0.011
    val w = Window.partitionBy("event_type")
    val withPs = Tables.events(s, d)
      .select(col("event_type"), col("value"))
      .withColumn("ps", percentile_approx(col("value"),
        array(targets.map(lit): _*), lit(10000)).over(w))
    val n = count(col("value"))
    val checks = targets.zipWithIndex.map { case (qt, i) =>
      val ap = element_at(col("ps"), i + 1)
      val below = sum(when(col("value") < ap, 1L).otherwise(0L))
      val atOrBelow = sum(when(col("value") <= ap, 1L).otherwise(0L))
      when(max(ap).isNull, lit(true)).otherwise(
        (below + 1).cast("double") / n <= qt + tol &&
          atOrBelow.cast("double") / n >= qt - tol)
    }
    withPs.groupBy("event_type")
      .agg(checks.reduce(_ && _).cast("long").as("within_rank_tol"))
  }

  val all: Seq[GraftQuery] = Seq(
    qFilter, qFilterNot, qMap, qMapValues, qFlatMapValues, qSelectKey,
    qBranch, qMerge, qTableLatest, qTableFilter, qTableMapValues,
    qTableGroupByCount, qTableGroupByAgg, q1Agg, qCount, qReduce,
    qAggCustom, qDistinct, qCountDistinct, qIntersect, qExcept, qRollup,
    qJsonExtract, qApproxDistinct, qApproxQuantile)
}

package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import GraftQuery.q

/** Join operators (SURVEY §2.5) over the batch façade. Broadcast policy:
  * only fixed-cardinality dims (nation: 25 rows, region: 5) carry an explicit
  * `broadcast()` hint — they are broadcastable at ANY scale, and the fact
  * side then never shuffles for the lookup. SF-scaled sides (customer, part,
  * supplier) get no hint: size-based planning / AQE broadcasts them at small
  * SF and switches to a shuffle join at 100 TB, where a forced broadcast
  * would OOM the executors.
  */
object JoinQueries {

  /** KStream ⋈ KTable — enrichment join, stream-side driven; aggregated so
    * output stays bounded. orders is the table side (unique key).
    */
  val qJoinStreamTable = q(
    "q_join_stream_table",
    "SELECT o_orderpriority, count(*) AS cnt, " +
      s"${Exact.sumScaledSql("l_extendedprice * (1 - l_discount)", 10000)} AS revenue_e4 " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "GROUP BY o_orderpriority") { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"),
        Exact.sumScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000).as("revenue_e4"))
  }

  /** KStream ⟕ KTable — left join; unmatched stream records keep null table
    * side (reference emits joiner(v, null)).
    */
  val qJoinLeft = q(
    "q_join_left",
    "SELECT o_orderstatus, count(*) AS n, count(c_custkey) AS matched " +
      "FROM orders LEFT JOIN customer " +
      "ON o_custkey = c_custkey AND c_acctbal > 5000 " +
      "GROUP BY o_orderstatus") { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), // SF-scaled side: AQE decides the strategy
        col("o_custkey") === col("c_custkey") && col("c_acctbal") > 5000,
        "left")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), count(col("c_custkey")).as("matched"))
  }

  /** KStream ⋈ GlobalKTable — foreign-key lookup against fully-replicated
    * dims; in Spark: broadcast joins so the fact side never shuffles.
    */
  val qJoinGlobal = q(
    "q_join_global",
    "SELECT r_name, n_name, count(*) AS cnt, " +
      s"${Exact.sumScaledSql("c_acctbal", 100)} AS sum_bal_c " +
      "FROM customer JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "GROUP BY r_name, n_name") { (s, d) =>
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name", "n_name")
      .agg(count(lit(1)).as("cnt"), Exact.sumScaled(col("c_acctbal"), 100).as("sum_bal_c"))
  }

  /** KStream ⋈ KStream windowed (interval) join — reference buffers both
    * sides in window stores and matches within [ts−before, ts+after]
    * (KStreamKStreamJoinProcessor). Batch façade: equi-key + time-bounded
    * range condition.
    */
  val qIntervalJoin = q(
    "q_interval_join",
    "SELECT o_orderpriority, count(*) AS cnt, " +
      s"${Exact.sumScaledSql("l_quantity", 100)} AS sq_c " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "AND l_shipdate >= o_orderdate " +
      "AND l_shipdate <= o_orderdate + INTERVAL 60 DAY " +
      "GROUP BY o_orderpriority") { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"), Exact.sumScaled(col("l_quantity"), 100).as("sq_c"))
  }

  /** KStream ⟕ KStream windowed (interval) LEFT join — left records emit
    * with a null right side when nothing matches inside the window
    * (KStreamKStreamJoinProcessor left variant). The orders side is unique
    * per key, so each left row appears exactly once, matched or not.
    */
  val qIntervalLeftJoin = q(
    "q_interval_left_join",
    "SELECT l_returnflag, count(*) AS cnt, " +
      "CAST(sum(CASE WHEN o_orderkey IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS matched " +
      "FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey " +
      "AND l_shipdate >= o_orderdate " +
      "AND l_shipdate <= o_orderdate + INTERVAL 10 DAY " +
      "GROUP BY l_returnflag") { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") &&
          col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 10 DAYS"),
        "left")
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("cnt"),
        sum(when(col("o_orderkey").isNull, 0).otherwise(1)).as("matched"))
  }

  /** KStream ⟗ KStream outer — both sides emit unmatched (null other side).
    * Two per-user aggregates full-outer joined.
    */
  val qJoinOuter = q(
    "q_join_outer",
    "SELECT user_id, clicks, views FROM " +
      "(SELECT user_id, count(*) AS clicks FROM events WHERE event_type = 'click' GROUP BY user_id) c " +
      "FULL OUTER JOIN " +
      "(SELECT user_id, count(*) AS views FROM events WHERE event_type = 'view' GROUP BY user_id) v " +
      "USING (user_id)") { (s, d) =>
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id").agg(count(lit(1)).as("clicks"))
    val views = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(count(lit(1)).as("views"))
    clicks.join(views, Seq("user_id"), "full_outer")
      .select("user_id", "clicks", "views")
  }

  /** KTable ⋈ KTable — changelog join on the table key: latest order per
    * customer joined to the customer table (both sides keyed by custkey).
    */
  val qTableTableJoin = q(
    "q_table_table_join",
    "SELECT c_custkey, c_name, o_orderkey, o_totalprice FROM customer JOIN (" +
      "SELECT * EXCLUDE rn FROM (SELECT o_custkey, o_orderkey, o_totalprice, " +
      "row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn " +
      "FROM orders) WHERE rn = 1) ON c_custkey = o_custkey") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val latestOrder = Tables.orders(s, d)
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)))
      .filter(col("rn") === 1)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    Tables.customer(s, d)
      .join(latestOrder, col("c_custkey") === col("o_custkey"))
      .select("c_custkey", "c_name", "o_orderkey", "o_totalprice")
  }

  /** left-semi (Spark superset — EXISTS). */
  val qSemiJoin = q(
    "q_semi_join",
    "SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
      "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)") { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
  }

  /** left-anti (Spark superset — NOT EXISTS). */
  val qAntiJoin = q(
    "q_anti_join",
    "SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
      "(SELECT 1 FROM orders WHERE o_custkey = c_custkey)") { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  /** Top-k per group (rank window over join). */
  val qTopK = q(
    "q_topk",
    "SELECT c_mktsegment, o_orderkey, o_totalprice FROM (" +
      "SELECT c_mktsegment, o_orderkey, o_totalprice, row_number() OVER " +
      "(PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn " +
      "FROM orders JOIN customer ON o_custkey = c_custkey) WHERE rn <= 3") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("c_mktsegment")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= 3)
      .select("c_mktsegment", "o_orderkey", "o_totalprice")
  }

  /** Analytic window functions — running sum + row_number per supplier. */
  val qRunning = q(
    "q_running",
    "SELECT l_suppkey, l_orderkey, l_linenumber, " +
      "row_number() OVER w AS rn, CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) OVER w AS BIGINT) AS run_qty_c " +
      "FROM lineitem WHERE l_suppkey <= 20 " +
      "WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber " +
      "ROWS UNBOUNDED PRECEDING)") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("l_suppkey")
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
    Tables.lineitem(s, d)
      .filter(col("l_suppkey") <= 20)
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        row_number().over(w).as("rn"),
        sum(Exact.asInt(col("l_quantity"), 100)).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
          .as("run_qty_c"))
  }

  /** Discrete (type-1) median per group, rank-based: the ⌈n/2⌉-th smallest
    * VALUE — an actual data point, so no interpolation arithmetic crosses
    * engines. Both window functions share one partitioning → a single
    * shuffle; at scale this is the exact-percentile pattern (for sketched
    * percentiles see `q_approx_distinct`'s rows-only family).
    */
  val qMedian = q(
    "q_median",
    "WITH r AS (SELECT event_type, value, " +
      "row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn, " +
      "count(*) OVER (PARTITION BY event_type) AS n FROM events) " +
      s"SELECT event_type, ${Exact.quantSql("value", 100)} AS med_c " +
      "FROM r WHERE rn = (n + 1) // 2") { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy("event_type").orderBy(col("value"), col("event_id"))
    val part = Window.partitionBy("event_type")
    Tables.events(s, d)
      .select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(ord))
      .withColumn("n", count(lit(1)).over(part))
      .filter(col("rn") === expr("(n + 1) DIV 2"))
      .select(col("event_type"), Exact.quant(col("value"), 100).as("med_c"))
  }

  val all: Seq[GraftQuery] = Seq(
    qJoinStreamTable, qJoinLeft, qJoinGlobal, qIntervalJoin,
    qIntervalLeftJoin, qJoinOuter,
    qTableTableJoin, qSemiJoin, qAntiJoin, qTopK, qRunning, qMedian)
}

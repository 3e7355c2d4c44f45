package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import GraftQuery.q

/** Composite multi-join analytics (TPC-H Q3/Q5/Q10-shaped): exercise join
  * ordering, pushdown through joins, and rank-limit on aggregated outputs —
  * the plan shapes a 100 TB warehouse lives on.
  */
object CompositeQueries {

  /** Q3-shaped: unshipped-order revenue, top 10 orders. Filters push into
    * all three scans; ranking on the exact integer revenue keeps the top-k
    * deterministic.
    */
  val q3Shipping = q(
    "q3_shipping",
    "SELECT o_orderkey, revenue_e4, epoch_ms(o_orderdate) AS odate_ms FROM (" +
      "SELECT o_orderkey, " +
      s"${Exact.sumScaledSql("l_extendedprice * (1 - l_discount)", 10000)} AS revenue_e4, " +
      "any_value(o_orderdate) AS o_orderdate " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-03-15' " +
      "AND l_shipdate > TIMESTAMP '1996-03-15' " +
      "GROUP BY o_orderkey) " +
      "ORDER BY revenue_e4 DESC, o_orderkey LIMIT 10") { (s, d) =>
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-03-15 00:00:00")))
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit(java.sql.Timestamp.valueOf("1996-03-15 00:00:00")))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey")
      .agg(
        Exact.sumScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
          .as("revenue_e4"),
        first(col("o_orderdate")).as("o_orderdate"))
      .orderBy(col("revenue_e4").desc, col("o_orderkey"))
      .limit(10)
      .select(col("o_orderkey"), col("revenue_e4"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"))
  }

  /** Q5-shaped: revenue per nation within one region and order-date year.
    * region/nation broadcast; orders/lineitem co-shuffle on the key.
    */
  val q5Region = q(
    "q5_region",
    "SELECT n_name, count(*) AS cnt, " +
      s"${Exact.sumScaledSql("l_extendedprice * (1 - l_discount)", 10000)} AS revenue_e4 " +
      "FROM region JOIN nation ON n_regionkey = r_regionkey " +
      "JOIN customer ON c_nationkey = n_nationkey " +
      "JOIN orders ON o_custkey = c_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' " +
      "AND o_orderdate < TIMESTAMP '1998-01-01' " +
      "GROUP BY n_name") { (s, d) =>
    val dims = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    Tables.lineitem(s, d)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(dims), col("o_custkey") === col("c_custkey"))
      .groupBy("n_name")
      .agg(count(lit(1)).as("cnt"),
        Exact.sumScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
          .as("revenue_e4"))
  }

  /** Q10-shaped: revenue lost to returned items per customer, top 20. */
  val q10Returns = q(
    "q10_returns",
    "SELECT c_custkey, c_name, revenue_e4 FROM (" +
      "SELECT c_custkey, any_value(c_name) AS c_name, " +
      s"${Exact.sumScaledSql("l_extendedprice * (1 - l_discount)", 10000)} AS revenue_e4 " +
      "FROM customer JOIN orders ON c_custkey = o_custkey " +
      "JOIN lineitem ON l_orderkey = o_orderkey " +
      "WHERE l_returnflag = 'R' GROUP BY c_custkey) " +
      "ORDER BY revenue_e4 DESC, c_custkey LIMIT 20") { (s, d) =>
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey")
      .agg(first("c_name").as("c_name"),
        Exact.sumScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
          .as("revenue_e4"))
      .orderBy(col("revenue_e4").desc, col("c_custkey"))
      .limit(20)
      .select("c_custkey", "c_name", "revenue_e4")
  }

  /** Pivot (Spark superset): per-user event-type counts as columns. */
  val qPivot = q(
    "q_pivot",
    "SELECT user_id, " +
      "sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS click, " +
      "sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS view, " +
      "sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchase " +
      "FROM events GROUP BY user_id") { (s, d) =>
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", Seq("click", "view", "purchase"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("click", "view", "purchase"))
  }

  /** Salted aggregation (skew pattern): two-phase groupBy equals the direct
    * aggregate — the oracle proves the pattern's correctness.
    */
  val qSaltedAgg = q(
    "q_salted_agg",
    "SELECT l_returnflag, count(*) AS cnt, " +
      s"${Exact.sumScaledSql("l_quantity", 100)} AS sq_c " +
      "FROM lineitem GROUP BY l_returnflag") { (s, d) =>
    graft.operators.Salting.saltedAggregate(
      Tables.lineitem(s, d), Seq("l_returnflag"), 16,
      Seq(count(lit(1)).as("cnt"), Exact.sumScaled(col("l_quantity"), 100).as("sq_c")),
      Seq(sum(col("cnt")).as("cnt"), sum(col("sq_c")).as("sq_c")))
  }

  val all: Seq[GraftQuery] = Seq(q3Shipping, q5Region, q10Returns, qPivot, qSaltedAgg)
}

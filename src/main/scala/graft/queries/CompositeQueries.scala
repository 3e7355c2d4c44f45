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
    // customer scales with SF (~1.5 TB at 100 TB total) — no broadcast hint;
    // size-based planning broadcasts it at small SF and shuffles at scale.
    // Only fixed-cardinality dims (nation: 25, region: 5) are force-broadcast.
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
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
    * region/nation broadcast (fixed-size); orders/lineitem co-shuffle on the
    * key; the customer-side join is left to size-based planning.
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
      .join(dims, col("o_custkey") === col("c_custkey")) // customer-scaled: AQE decides
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
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
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
      "CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click, " +
      "CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view, " +
      "CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase " +
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

  /** Salted equi-join (skew pattern): the salted two-shuffle join equals the
    * direct join — the oracle proves the pattern returns the exact multiset.
    */
  val qSaltedJoin = q(
    "q_salted_join",
    "SELECT p_brand, CAST(count(*) AS BIGINT) AS cnt, " +
      s"${Exact.sumScaledSql("l_extendedprice * (1 - l_discount)", 10000)} AS rev_e4 " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY p_brand") { (s, d) =>
    graft.operators.Salting
      .saltedJoin(Tables.lineitem(s, d), "l_partkey", Tables.part(s, d), "p_partkey", 8)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("cnt"),
        Exact.sumScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
          .as("rev_e4"))
  }

  /** Q14-shaped: promo revenue vs total per ship-year. Conditional
    * aggregation over a part join (AQE-sized); both sums exact integers so the
    * ratio can be computed client-side without float drift.
    */
  val q14Promo = q(
    "q14_promo",
    "SELECT year(l_shipdate) AS yr, " +
      s"${Exact.sumScaledSql("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 10000)} AS promo_e4, " +
      s"${Exact.sumScaledSql("l_extendedprice * (1 - l_discount)", 10000)} AS total_e4 " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1") { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey")) // SF-scaled: AQE decides
      .groupBy(year(col("l_shipdate")).as("yr"))
      .agg(
        Exact.sumScaled(
          when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0)),
          10000).as("promo_e4"),
        Exact.sumScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
          .as("total_e4"))
  }

  /** Q18-shaped: large-volume orders — aggregate lineitem per order, keep
    * orders whose total quantity exceeds 300, enrich with customer. The
    * aggregate-then-join shape: the HAVING filter shrinks the fact side
    * BEFORE the join, so only qualifying orders are ever joined.
    */
  val q18Large = q(
    "q18_large",
    "SELECT c_custkey, o_orderkey, epoch_ms(o_orderdate) AS odate_ms, " +
      s"sq_c FROM (SELECT l_orderkey, ${Exact.sumScaledSql("l_quantity", 100)} AS sq_c " +
      "FROM lineitem GROUP BY l_orderkey HAVING sq_c > 30000) " +
      "JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN customer ON c_custkey = o_custkey") { (s, d) =>
    val bigOrders = Tables.lineitem(s, d)
      .groupBy("l_orderkey")
      .agg(Exact.sumScaled(col("l_quantity"), 100).as("sq_c"))
      .filter(col("sq_c") > 30000)
    bigOrders
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
      .select(col("c_custkey"), col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("odate_ms"), col("sq_c"))
  }

  /** Q9-shaped: profit per supplier nation per order-year — a five-table
    * join (lineitem ⋈ orders co-shuffle; nation broadcast; part/supplier
    * sized by AQE — SF-scaled, so no forced broadcast).
    */
  val q9Profit = q(
    "q9_profit",
    "SELECT n_name, year(o_orderdate) AS yr, " +
      s"${Exact.sumScaledSql("l_extendedprice * (1 - l_discount)", 10000)} AS profit_e4 " +
      "FROM lineitem JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN part ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN nation ON n_nationkey = s_nationkey " +
      "WHERE p_type = 'PROMO' GROUP BY n_name, yr") { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
        col("p_partkey") === col("l_partkey")) // SF-scaled: AQE decides
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("n_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).as("yr"))
      .agg(Exact.sumScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
        .as("profit_e4"))
  }

  /** Q12-shaped: per return-flag (the synthetic schema's stand-in for
    * shipmode), high- vs low-priority line counts within a ship-date year —
    * conditional counting over a fact-fact co-shuffle join with the date
    * filter pushed into the lineitem scan.
    */
  val q12Priority = q(
    "q12_priority",
    "SELECT l_returnflag, " +
      "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_cnt, " +
      "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_cnt " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01' " +
      "GROUP BY l_returnflag") { (s, d) =>
    val hi = col("o_orderpriority").isInCollection(Seq("1-URGENT", "2-HIGH"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_returnflag")
      .agg(sum(when(hi, 1).otherwise(0)).as("high_cnt"),
        sum(when(hi, 0).otherwise(1)).as("low_cnt"))
  }

  /** Q4-shaped: order-priority histogram of 1996 orders that have at least
    * one returned line — aggregation over a LEFT-SEMI join (EXISTS
    * decorrelated), date filter pushed into the orders scan, the semi join's
    * build side pruned to the single join column.
    */
  val q4PriorityExists = q(
    "q4_priority_exists",
    "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS cnt FROM orders " +
      "WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01' " +
      "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey AND l_returnflag = 'R') " +
      "GROUP BY o_orderpriority") { (s, d) =>
    Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")))
      .join(Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
          .select("l_orderkey"),
        col("o_orderkey") === col("l_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Q13-shaped: customer distribution by order count INCLUDING zero-order
    * customers — left outer join + two-level aggregation (per-customer count,
    * then histogram). The outer join is what a semi/inner join can't express:
    * the zeros must survive.
    */
  val q13Custdist = q(
    "q13_custdist",
    "SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (" +
      "SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count " +
      "FROM customer LEFT JOIN orders ON c_custkey = o_custkey " +
      "GROUP BY c_custkey) GROUP BY c_count") { (s, d) =>
    Tables.customer(s, d).select("c_custkey")
      .join(Tables.orders(s, d).select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** Q17-shaped: small-quantity revenue — lines whose quantity is below 20 %
    * of their part's average. The correlated AVG subquery decorrelates into
    * a per-part aggregate joined back to the fact; the inequality is
    * cross-multiplied to integers (5·qty·cnt < sum) so both engines compare
    * exactly instead of through a float average.
    */
  val q17SmallQty = q(
    "q17_small_qty",
    // floor(), not CAST: DuckDB CAST(double AS BIGINT) ROUNDS while Spark's
    // .cast("long") truncates — floor is identical on both engines even if
    // a future generator emits non-integral quantities
    "WITH pa AS (SELECT l_partkey AS pk, CAST(sum(CAST(floor(l_quantity) AS BIGINT)) AS BIGINT) AS sq, " +
      "CAST(count(*) AS BIGINT) AS cnt FROM lineitem GROUP BY l_partkey) " +
      "SELECT CAST(count(*) AS BIGINT) AS n_lines, " +
      s"${Exact.sumScaledSql("l_extendedprice", 100)} AS rev_c " +
      "FROM lineitem JOIN pa ON l_partkey = pk " +
      "WHERE 5 * CAST(floor(l_quantity) AS BIGINT) * cnt < sq") { (s, d) =>
    val li = Tables.lineitem(s, d)
    val pa = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(floor(col("l_quantity"))).as("sq"), count(lit(1)).as("cnt"))
    li.join(pa, col("l_partkey") === col("pk"))
      .filter(lit(5) * floor(col("l_quantity")) * col("cnt") < col("sq"))
      .agg(count(lit(1)).as("n_lines"),
        Exact.sumScaled(col("l_extendedprice"), 100).as("rev_c"))
  }

  /** Q11-shaped: nations holding an outsized share of supplier balance —
    * per-group totals filtered against a fraction of the GLOBAL total (the
    * scalar-subquery shape). The one-row global total cross-joins in
    * broadcast; integer cents make the 10 % threshold exact.
    */
  val q11Important = q(
    "q11_important",
    "WITH per AS (SELECT s_nationkey, " +
      s"${Exact.sumScaledSql("s_acctbal", 100)} AS bal_c " +
      "FROM supplier GROUP BY s_nationkey), " +
      "tot AS (SELECT CAST(sum(bal_c) AS BIGINT) AS t FROM per) " +
      "SELECT n_name, bal_c FROM per JOIN nation ON n_nationkey = s_nationkey, tot " +
      "WHERE bal_c * 10 > t") { (s, d) =>
    val per = Tables.supplier(s, d).groupBy("s_nationkey")
      .agg(Exact.sumScaled(col("s_acctbal"), 100).as("bal_c"))
    val tot = per.agg(sum(col("bal_c")).as("t"))
    per.crossJoin(broadcast(tot))
      .filter(col("bal_c") * 10 > col("t"))
      .join(broadcast(Tables.nation(s, d)),
        col("n_nationkey") === col("s_nationkey"))
      .select(col("n_name"), col("bal_c"))
  }

  /** The modern training-data curation pipeline, end-to-end in ONE plan:
    * keep-first substring dedup (boilerplate cut, first occurrence
    * survives) → minimum-length filter on the SURVIVING tokens →
    * domain-mixture sampling to a token budget over the post-cleaning
    * counts → epoch fan-out → contiguous sequence packing. Every stage is
    * an already-oracle-locked operator; this query locks their
    * COMPOSITION — the DuckDB oracle chains the same CTEs, so positions,
    * integer sampling rules, and running-fill seq ids must agree
    * bit-for-bit through all five stages.
    *
    * Scale note: the mixture's per-domain totals collect executes the
    * cleaning subtree once before the final plan runs it again — at corpus
    * scale you would materialize `cleaned` as parquet between the two (the
    * incremental-index pattern); composing in one plan here keeps the
    * oracle honest end-to-end.
    */
  val qCurationPipeline2 = q(
    "q_curation_pipeline2", {
      val toks5 = TextQueries.tokensSqlCol("clean_text")
      val dt2 =
        s"SELECT c.doc_id, dd.source, CAST(len($toks5) AS BIGINT) AS n_tokens " +
          "FROM cleaned c JOIN documents dd USING (doc_id) " +
          s"WHERE len($toks5) >= 5"
      s"WITH ${SpanQueries.keep1CleanedCtes}, " +
        s"${SamplingQueries.mixtureCtesFrom(dt2)}, " +
        SamplingQueries.packedTailSql(1024L)
    }) { (s, d) =>
    import graft.operators.Sampling
    val cleaned = SpanQueries.keep1CleanedDf(s, d)
    val dt2 = cleaned
      .join(Tables.documents(s, d).select("doc_id", "source"), Seq("doc_id"))
      .select(col("doc_id"), col("source"),
        size(TextQueries.tokensCol(col("clean_text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 5)
    val m = Sampling.mixtureByTokenBudget(dt2, col("source"), col("doc_id"),
        col("n_tokens"), SamplingQueries.MixtureWeights,
        SamplingQueries.MixtureBudget)
      .select("doc_id", "source", "n_tokens", "copies")
    SamplingQueries.packedTailDf(m, 1024L)
  }

  val all: Seq[GraftQuery] = Seq(q3Shipping, q5Region, q10Returns, qPivot,
    qSaltedAgg, qSaltedJoin, q14Promo, q18Large, q9Profit, q12Priority,
    q4PriorityExists, q13Custdist, q17SmallQty, q11Important,
    qCurationPipeline2)
}

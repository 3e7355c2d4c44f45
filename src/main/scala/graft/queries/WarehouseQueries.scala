package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._
import GraftQuery.q

/** The remaining TPC-H plan shapes (Q2/Q6/Q7/Q8/Q15/Q16/Q19/Q20/Q21/Q22),
  * adapted to the synthetic star schema (no partsupp / commitdate / phone —
  * the lineitem (partkey, suppkey) pairs stand in for partsupp, and
  * returnflag-based conditions replace the missing date columns). Together
  * with CompositeQueries this completes all 22 TPC-H query shapes: scan-heavy
  * range filters, disjunctive pushdown, correlated EXISTS / NOT EXISTS,
  * scalar subqueries, min-per-group join-back, and NOT IN anti joins — the
  * decorrelation patterns a 100 TB warehouse planner must handle.
  */
object WarehouseQueries {

  private def ts(s: String) = lit(java.sql.Timestamp.valueOf(s + " 00:00:00"))

  /** Q6-shaped: forecast-revenue — a pure scan + global aggregate with three
    * range predicates, ALL pushed into the parquet scan (PushedFilters shows
    * shipdate + discount + quantity). The cheapest possible plan: no shuffle
    * except the single-row partial-agg gather.
    */
  val q6Forecast = q(
    "q6_forecast",
    "SELECT CAST(count(*) AS BIGINT) AS cnt, " +
      s"${Exact.sumScaledSql("l_extendedprice * l_discount", 10000)} AS disc_rev_e4 " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
      "AND l_shipdate < TIMESTAMP '1997-01-01' " +
      "AND l_discount >= 0.03 AND l_discount <= 0.07 AND l_quantity < 24") { (s, d) =>
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 && col("l_quantity") < 24)
      .agg(count(lit(1)).as("cnt"),
        Exact.sumScaled(col("l_extendedprice") * col("l_discount"), 10000).as("disc_rev_e4"))
  }

  /** Q7-shaped: shipping volume between two nations per year. The nation dim
    * joins twice under different roles (supplier side, customer side) — both
    * broadcast (25 rows); the symmetric pair predicate lands after both.
    */
  val q7Volume = q(
    "q7_volume",
    "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
      "year(l_shipdate) AS yr, " +
      s"${Exact.sumScaledSql("l_extendedprice * (1 - l_discount)", 10000)} AS rev_e4 " +
      "FROM lineitem JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN customer ON c_custkey = o_custkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN nation n1 ON n1.n_nationkey = s_nationkey " +
      "JOIN nation n2 ON n2.n_nationkey = c_nationkey " +
      "WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') " +
      "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1') " +
      "GROUP BY supp_nation, cust_nation, yr") { (s, d) =>
    val n1 = Tables.nation(s, d)
      .select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey")) // SF-scaled: AQE decides
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(n1), col("n1_key") === col("s_nationkey"))
      .join(broadcast(n2), col("n2_key") === col("c_nationkey"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), year(col("l_shipdate")).as("yr"))
      .agg(Exact.sumScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
        .as("rev_e4"))
  }

  /** Q8-shaped: one nation's market share of PROMO-part revenue inside one
    * region's customer market, per order year. Share = conditional sum over
    * total — both kept as exact integers so the ratio needs no float.
    */
  val q8Share = q(
    "q8_share",
    "SELECT year(o_orderdate) AS yr, " +
      s"${Exact.sumScaledSql("CASE WHEN n2.n_name = 'NATION_3' THEN l_extendedprice * (1 - l_discount) ELSE 0 END", 10000)} AS nation_e4, " +
      s"${Exact.sumScaledSql("l_extendedprice * (1 - l_discount)", 10000)} AS total_e4 " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN customer ON c_custkey = o_custkey " +
      "JOIN nation n1 ON n1.n_nationkey = c_nationkey " +
      "JOIN region ON r_regionkey = n1.n_regionkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN nation n2 ON n2.n_nationkey = s_nationkey " +
      "WHERE r_name = 'ASIA' AND p_type = 'PROMO' " +
      "GROUP BY yr") { (s, d) =>
    val custSide = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("n1_key"), col("n_regionkey"))),
        col("n1_key") === col("c_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
        col("r_regionkey") === col("n_regionkey"))
    val suppSide = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
        .select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation"))),
        col("n2_key") === col("s_nationkey"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === "PROMO"),
        col("p_partkey") === col("l_partkey")) // SF-scaled: AQE decides
      .join(Tables.orders(s, d), col("o_orderkey") === col("l_orderkey"))
      .join(custSide, col("c_custkey") === col("o_custkey"))
      .join(suppSide, col("s_suppkey") === col("l_suppkey"))
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(
        Exact.sumScaled(
          when(col("supp_nation") === "NATION_3",
            col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0)),
          10000).as("nation_e4"),
        Exact.sumScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
          .as("total_e4"))
  }

  /** Q15-shaped: top supplier by quarterly revenue — the max-of-an-aggregate
    * scalar subquery. The one-row max broadcasts into the filter; suppliers
    * tying at the max all survive (exact integer revenue makes the equality
    * well-defined, no float epsilon).
    */
  val q15TopSupplier = q(
    "q15_top_supplier",
    "WITH rev AS (SELECT l_suppkey AS sk, " +
      s"${Exact.sumScaledSql("l_extendedprice * (1 - l_discount)", 10000)} AS total_e4 " +
      "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' " +
      "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) " +
      "SELECT s_suppkey, s_name, total_e4 " +
      "FROM supplier JOIN rev ON s_suppkey = sk, " +
      "(SELECT max(total_e4) AS m FROM rev) " +
      "WHERE total_e4 = m") { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
      .groupBy(col("l_suppkey").as("sk"))
      .agg(Exact.sumScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
        .as("total_e4"))
    val m = rev.agg(max(col("total_e4")).as("m"))
    rev.crossJoin(broadcast(m)) // one row — broadcast is free at any scale
      .filter(col("total_e4") === col("m"))
      .join(Tables.supplier(s, d), col("s_suppkey") === col("sk")) // SF-scaled: AQE decides
      .select(col("s_suppkey"), col("s_name"), col("total_e4"))
  }

  /** Q16-shaped: distinct supplier count per part attribute bucket, with a
    * NOT IN exclusion list. The lineitem (partkey, suppkey) pairs stand in
    * for partsupp; NOT IN over non-null keys plans as a broadcast anti join
    * (the exclusion side is tiny at any scale: suppliers in deficit).
    */
  val q16SupplierCnt = q(
    "q16_supplier_cnt",
    "SELECT p_brand, p_type, p_size, " +
      "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt " +
      "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps " +
      "JOIN part ON p_partkey = l_partkey " +
      "WHERE p_brand <> 'Brand#1' AND p_size IN (1, 4, 9, 16, 25, 36, 49) " +
      "AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) " +
      "GROUP BY p_brand, p_type, p_size") { (s, d) =>
    val ps = Tables.lineitem(s, d).select("l_partkey", "l_suppkey").distinct()
    val excluded = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 0).select("s_suppkey")
    ps.join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(Tables.part(s, d) // SF-scaled: AQE decides
          .filter(col("p_brand") =!= "Brand#1" &&
            col("p_size").isInCollection(Seq(1, 4, 9, 16, 25, 36, 49))),
        col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Q19-shaped: disjunctive brand/size/quantity predicates — the OR-of-ANDs
    * shape. The part-side conjuncts stay evaluable at the part scan (brand ∈
    * {1,2,3} ∧ size bound unions push down); the mixed residual lands on the
    * joined rows.
    */
  val q19Disjunct = q(
    "q19_disjunct",
    "SELECT CAST(count(*) AS BIGINT) AS cnt, " +
      s"${Exact.sumScaledSql("l_extendedprice * (1 - l_discount)", 10000)} AS rev_e4 " +
      "FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity >= 1 AND l_quantity <= 21) " +
      "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity >= 10 AND l_quantity <= 30) " +
      "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity >= 20 AND l_quantity <= 40)") { (s, d) =>
    val b1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
      col("l_quantity") >= 1 && col("l_quantity") <= 21
    val b2 = col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
      col("l_quantity") >= 10 && col("l_quantity") <= 30
    val b3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
      col("l_quantity") >= 20 && col("l_quantity") <= 40
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("p_partkey") === col("l_partkey")) // SF-scaled: AQE decides
      .filter(b1 || b2 || b3)
      .agg(count(lit(1)).as("cnt"),
        Exact.sumScaled(col("l_extendedprice") * (lit(1) - col("l_discount")), 10000)
          .as("rev_e4"))
  }

  /** Q20-shaped: suppliers of one nation who moved serious volume of a part
    * family — an IN-subquery over a grouped HAVING, planned as a semi join.
    * The qualifying set aggregates per (part, supplier) BEFORE touching the
    * supplier dim, so the heavy fact scan feeds one agg, not a join.
    */
  val q20Excess = q(
    "q20_excess",
    "SELECT s_suppkey, s_name FROM supplier " +
      "JOIN nation ON n_nationkey = s_nationkey " +
      "WHERE n_name = 'NATION_5' AND s_suppkey IN (" +
      "SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE p_name LIKE 'small%' GROUP BY l_partkey, l_suppkey " +
      "HAVING sum(CAST(floor(l_quantity) AS BIGINT)) > 60)") { (s, d) =>
    val qual = Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_name").startsWith("small")),
        col("p_partkey") === col("l_partkey")) // SF-scaled: AQE decides
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(floor(col("l_quantity")).cast("long")).as("sq"))
      .filter(col("sq") > 60)
      .select("l_suppkey")
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_5")),
        col("n_nationkey") === col("s_nationkey"))
      .join(qual, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
  }

  /** Q21-shaped: suppliers who alone returned lines on multi-supplier
    * finished orders — correlated EXISTS (some other supplier on the order)
    * plus NOT EXISTS (no other supplier also returned). The oracle keeps the
    * correlated form; the Spark plan decorrelates both into ONE per-order
    * aggregate (distinct suppliers, distinct returning suppliers) joined back
    * to the fact — two correlated subqueries for the price of one shuffle.
    */
  val q21Waiting = q(
    "q21_waiting",
    "SELECT s_name, CAST(count(*) AS BIGINT) AS numwait " +
      "FROM supplier JOIN lineitem l1 ON l1.l_suppkey = s_suppkey " +
      "JOIN orders ON o_orderkey = l1.l_orderkey " +
      "WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R' " +
      "AND EXISTS (SELECT 1 FROM lineitem l2 WHERE l2.l_orderkey = l1.l_orderkey " +
      "AND l2.l_suppkey <> l1.l_suppkey) " +
      "AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = l1.l_orderkey " +
      "AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R') " +
      "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10") { (s, d) =>
    // Per-order stats decorrelate both subqueries: EXISTS(other supplier) ⇔
    // n_supp > 1; NOT EXISTS(other returning supplier) ⇔ the returning-
    // supplier set is exactly {l1.suppkey} ⇔ n_r_supp = 1 (l1 is itself 'R').
    // Two-phase instead of two countDistincts: dedupe (order, supplier) pairs
    // first, then count — avoids the Expand (2× row multiplication) a
    // multi-distinct aggregate plans, and both phases keep map-side partials.
    val ordStats = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      .agg(max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"))
      .groupBy(col("ok"))
      .agg(count(lit(1)).as("n_supp"), sum(col("has_r")).as("n_r_supp"))
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(ordStats, col("l_orderkey") === col("ok"))
      .filter(col("n_supp") > 1 && col("n_r_supp") === 1)
      .join(Tables.supplier(s, d), col("s_suppkey") === col("l_suppkey")) // AQE decides
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** Q22-shaped: well-funded customers gone quiet (no orders since 2000),
    * per nation — a scalar AVG subquery (cross-multiplied to exact integers:
    * bal·n > Σbal) and a NOT EXISTS anti join against recent orders. The
    * date predicate pushes into the orders scan BEFORE the anti join builds.
    */
  val q22Opportunity = q(
    "q22_opportunity",
    "WITH pos AS (SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS s, " +
      "CAST(count(*) AS BIGINT) AS n FROM customer WHERE c_acctbal > 0) " +
      "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS cnt, " +
      s"${Exact.sumScaledSql("c_acctbal", 100)} AS bal_c " +
      "FROM customer, pos " +
      "WHERE CAST(round(c_acctbal * 100) AS BIGINT) * n > s " +
      "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
      "AND o_orderdate >= TIMESTAMP '2000-01-01') " +
      "GROUP BY c_nationkey") { (s, d) =>
    val cust = Tables.customer(s, d)
    val pos = cust.filter(col("c_acctbal") > 0)
      .agg(sum(Exact.asInt(col("c_acctbal"), 100)).as("s"), count(lit(1)).as("n"))
    cust.crossJoin(broadcast(pos)) // one row — broadcast is free at any scale
      .filter(Exact.asInt(col("c_acctbal"), 100) * col("n") > col("s"))
      .join(Tables.orders(s, d).filter(col("o_orderdate") >= ts("2000-01-01"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(count(lit(1)).as("cnt"), Exact.sumScaled(col("c_acctbal"), 100).as("bal_c"))
  }

  /** Q2-shaped: the minimum-cost supplier per part within a region — the
    * correlated min subquery, decorrelated into a per-part min joined back on
    * equality. Unit cost quantizes to integer cents (identical IEEE division
    * then floor on both engines) so the min and the equality are exact. The
    * part-type filter semi-reduces the pair set BEFORE the per-part min: the
    * min over a part's suppliers is untouched by which parts survive.
    */
  val q2MinCost = q(
    "q2_min_cost",
    "WITH ps AS (SELECT l_partkey AS pk, l_suppkey AS sk, " +
      s"min(${Exact.quantSql("l_extendedprice / l_quantity", 100)}) AS cost_c " +
      "FROM lineitem GROUP BY 1, 2), " +
      "eligible AS (SELECT pk, sk, cost_c, s_name, n_name FROM ps " +
      "JOIN supplier ON s_suppkey = sk " +
      "JOIN nation ON n_nationkey = s_nationkey " +
      "JOIN region ON r_regionkey = n_regionkey " +
      "WHERE r_name = 'EUROPE' AND pk IN (SELECT p_partkey FROM part WHERE p_type = 'STANDARD')), " +
      "best AS (SELECT pk AS bpk, min(cost_c) AS best_c FROM eligible GROUP BY pk) " +
      "SELECT pk AS p_partkey, sk AS s_suppkey, s_name, n_name, cost_c " +
      "FROM eligible JOIN best ON pk = bpk AND cost_c = best_c") { (s, d) =>
    // Both filters are PER-KEY (part type, supplier region), so they commute
    // with the per-(part, supplier) min — semi-reduce the fact scan BEFORE
    // the pair aggregate instead of aggregating all pairs and discarding most.
    val eurSupp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("n_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("r_regionkey") === col("n_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"))
    val ps = Tables.lineitem(s, d)
      .join(Tables.part(s, d).filter(col("p_type") === "STANDARD")
          .select("p_partkey"),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(eurSupp.select("s_suppkey"),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(min(Exact.quant(col("l_extendedprice") / col("l_quantity"), 100)).as("cost_c"))
    val eligible = ps
      .join(eurSupp, col("s_suppkey") === col("sk")) // AQE decides
      .select(col("pk"), col("sk"), col("cost_c"), col("s_name"), col("n_name"))
    val best = eligible.groupBy(col("pk").as("bpk")).agg(min(col("cost_c")).as("best_c"))
    eligible
      .join(best, col("pk") === col("bpk") && col("cost_c") === col("best_c"))
      .select(col("pk").as("p_partkey"), col("sk").as("s_suppkey"),
        col("s_name"), col("n_name"), col("cost_c"))
  }

  val all: Seq[GraftQuery] = Seq(
    q6Forecast, q7Volume, q8Share, q15TopSupplier, q16SupplierCnt,
    q19Disjunct, q20Excess, q21Waiting, q22Opportunity, q2MinCost)
}

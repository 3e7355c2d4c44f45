package graft.queries

import graft.Tables
import org.apache.spark.sql.DataFrame
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
    // DELIBERATELY the collect-form mixture (r18): both in-plan variants —
    // with and without a pinned dt2 exchange — measured 1.25–1.26× SLOWER
    // at the bench config in alternating same-window A/Bs (controls flat).
    // Unlike pipelines 3/4/6, the upstream here is the span-dedup subtree,
    // whose own internal shuffles already serialize the plan; adding the
    // in-plan totals branch (or another exchange) costs more in stage
    // barriers than the collect's separate simple-plan execution. See
    // OPTIMIZATION_r18.md "q_curation_pipeline2".
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

  /** The round-10 quality/curation operators composed into ONE plan —
    * the published web-corpus recipe end-to-end: Gopher rule filtering →
    * C4 line/page cleaning → boilerplate-prefix stripping (per source) →
    * overlap-fraction benchmark decontamination → temperature-weighted
    * mixture sampling. Every stage is an already-oracle-locked operator;
    * this entry locks their COMPOSITION (derived-text tokenizations,
    * the prefix-table join over a derived column, benchmark grams vs
    * cleaned grams) value-exact through all five stages.
    *
    * Corpus-specific policy knobs, chosen where each rule has real
    * selectivity on the synthetic corpus and documented for what they
    * are: (a) the Gopher stop-word rule is DROPPED (the synthetic
    * vocabulary contains no English stop words — the per-rule columns
    * exist precisely so a pipeline can drop an inapplicable rule);
    * (b) C4 line-cleaning falls back to the original text when no line
    * qualifies (the corpus is single-line, punctuation-free word soup;
    * the page-level drop rule still gates), so the projection is
    * exercised without erasing the corpus; (c) decontamination uses
    * 3-grams at a 20% overlap threshold — the setting that separates
    * REAL leaks from random collisions at every SF: near-duplicates of
    * benchmark docs overlap ~100% while the random-text floor stays
    * under ~15% (p90 measured 2.7% at sf0.01, 15.4% at sf0.1; 2-grams
    * of the ~40-word vocabulary saturate at sf0.1 — median 96% — and
    * 5-grams never collide at all).
    *
    * Scale note: like `q_curation_pipeline2`, the temperature-weight
    * derivation collects per-domain totals (bounded by #domains), which
    * runs the cleaning subtree once before the final plan runs it again —
    * at corpus scale you would materialize the cleaned corpus as parquet
    * between the two; composing in one plan here keeps the oracle honest
    * end-to-end.
    */
  val qCurationPipeline3 = q(
    "q_curation_pipeline3", {
      val stageCtes =
        // stage 1: Gopher rules (minus stop words) — mirror of
        // q_quality_gopher's flag arithmetic, applied as one filter
        "corpus AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 100 <> 0), " +
          "wr AS (SELECT doc_id, source, text, " +
          "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w, " +
          "string_split(text, chr(10)) AS ls FROM corpus), " +
          "gf AS (SELECT doc_id, source, text FROM wr WHERE " +
          "len(w) BETWEEN 50 AND 100000 " +
          "AND 3*len(w) <= coalesce(list_sum(list_transform(w, x -> len(x))), 0) " +
          "AND coalesce(list_sum(list_transform(w, x -> len(x))), 0) <= 10*len(w) " +
          "AND len(regexp_extract_all(text, '#'))*10 <= len(w) " +
          "AND len(regexp_extract_all(text, '\\.\\.\\.'))*10 <= len(w) " +
          "AND len(list_filter(ls, l -> regexp_matches(trim(l), '^[-*•]')))*10 <= len(ls)*9 " +
          "AND len(list_filter(ls, l -> regexp_matches(l, '\\.\\.\\.\\s*$')))*10 <= len(ls)*3 " +
          "AND len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))*5 >= len(w)*4), " +
          // stage 2: C4 clean — kept lines where any qualify, else the
          // original text; page-drop rule gates
          "c4 AS (SELECT doc_id, source, text, " +
          "list_filter(string_split(text, chr(10)), l -> " +
          "regexp_matches(l, '[.!?\"]\\s*$') AND " +
          "len(list_filter(regexp_split_to_array(trim(l), '\\s+'), x -> x <> '')) >= 5 AND " +
          "NOT contains(lower(l), 'javascript')) AS keptl, " +
          "(contains(lower(text), 'lorem ipsum') OR contains(text, '{')) AS pdrop FROM gf), " +
          "s2 AS (SELECT doc_id, source, CASE WHEN len(keptl) > 0 " +
          "THEN array_to_string(keptl, chr(10)) ELSE text END AS text2 FROM c4 WHERE NOT pdrop), " +
          // stage 3: boilerplate-prefix strip (k=2, minDf=2, per source)
          // over the stage-2 text — mirror of q_boilerplate
          s"bt AS (SELECT doc_id, source, ${TextQueries.tokensSqlCol("text2")} AS toks FROM s2), " +
          "bpre AS (SELECT doc_id, source, toks, CASE WHEN len(toks) >= 2 " +
          "THEN array_to_string(toks[1:2], ' ') END AS pre FROM bt), " +
          "bf AS (SELECT source, pre, CAST(1 AS INT) AS bp FROM bpre WHERE pre IS NOT NULL " +
          "GROUP BY source, pre HAVING count(*) >= 2), " +
          "s3 AS (SELECT doc_id, source, " +
          "coalesce(CASE WHEN bp IS NOT NULL THEN array_to_string(toks[3:], ' ') " +
          "ELSE array_to_string(toks, ' ') END, '') AS text3 " +
          "FROM bpre LEFT JOIN bf USING (source, pre)), " +
          // stage 4: overlap-fraction decontamination (3-grams, 20% ppm)
          // of the stripped text vs the RAW benchmark slice — mirror of
          // q_decontaminate_frac / cleanByOverlap
          s"bgr AS (SELECT DISTINCT unnest(${TextQueries.ngramsSql(3)}) AS gr " +
          "FROM documents WHERE doc_id % 100 = 0), " +
          s"dgr AS (SELECT doc_id, unnest(list_distinct(${TextQueries.ngramsSqlCol("text3", 3)})) AS gr FROM s3), " +
          "ost AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gt, " +
          "CAST(sum(CASE WHEN gr IN (SELECT gr FROM bgr) THEN 1 ELSE 0 END) AS BIGINT) AS gm " +
          "FROM dgr GROUP BY doc_id), " +
          "s4 AS (SELECT s3.doc_id, s3.source, s3.text3 FROM s3 LEFT JOIN ost USING (doc_id) " +
          "WHERE NOT (coalesce(gm, 0) * 1000000 > coalesce(gt, 0) * 200000))"
      // stage 5: temperature mixture over the surviving token counts —
      // the shared mixture rule chain + derived sqrt weights
      val dt3 =
        s"SELECT doc_id, source, CAST(len(${TextQueries.tokensSqlCol("text3")}) AS BIGINT) AS n_tokens " +
          s"FROM s4 WHERE len(${TextQueries.tokensSqlCol("text3")}) >= 1"
      s"WITH $stageCtes, " +
        s"${SamplingQueries.mixtureCtesWith(dt3, SamplingQueries.sqrtTempWeightsCte)} " +
        "SELECT doc_id, source, n_tokens, copies FROM m"
    }) { (s, d) =>
    curationPipeline3(Tables.documents(s, d), stagedDir = None)
  }

  /** Scratch-parquet stage checkpoint shared by the composed pipelines:
    * `None` keeps one logical plan; `Some(dir)` materializes the stage
    * and re-reads it, so downstream passes stop replaying upstream.
    */
  private def stageCheckpoint(stagedDir: Option[String])(
      df: DataFrame, tag: String): DataFrame = stagedDir match {
    case None => df
    case Some(dir) =>
      val path = s"$dir/$tag"
      df.write.mode("overwrite").parquet(path)
      df.sparkSession.read.parquet(path)
  }

  /** The `q_curation_pipeline3` flow as a reusable function: Gopher →
    * C4 → boilerplate-prefix strip → overlap-fraction decontamination →
    * temperature mixture.
    *
    * `stagedDir = None` composes all five stages into ONE logical plan
    * (what the oracle checks end-to-end). That plan re-executes the
    * map-side cleaning subtree ~4× — the decontamination join and the
    * mixture's bounded totals-collect each replay their upstream
    * (documented cost anatomy in PLANS.md). `stagedDir = Some(dir)`
    * is the production form those docs promised: the cleaned corpus is
    * MATERIALIZED to scratch parquet after stage 3 and again after
    * stage 4, so every stage executes exactly once and downstream
    * passes re-read the (much smaller) cleaned text instead of
    * replaying Gopher/C4/strip. Row-identical to the one-plan form
    * (`CurationPipelineSpec`); measured crossover in SCALE.md.
    */
  def curationPipeline3(docs: DataFrame,
      stagedDir: Option[String]): DataFrame = {
    import graft.operators.{Boilerplate, Decontaminate, QualityFilters, Sampling}
    val checkpoint = stageCheckpoint(stagedDir) _
    // In the one-plan form (stagedDir = None) every SELF-JOINING stage
    // consumes its input twice (prefix table + join-back; overlap counts +
    // anti join; totals + sampled rows). Left as bare map-side subtrees
    // those consumers each REPLAY the upstream cleaning (~4× the regex
    // work, plus a full extra execution for the old driver-side totals
    // collect — the documented r11 "one-plan honesty cost"). `share` pins
    // ONE hash exchange at each such boundary instead: both consumers plan
    // the identical Exchange subtree, exchange reuse collapses them, and
    // every stage executes exactly once — the in-plan analog of the staged
    // parquet materialization (guide §2.4: share one exchange), paying one
    // shuffle of the (shrinking) cleaned text instead of N recomputes of
    // the cleaning subtree. The staged form already materializes, so it
    // keeps the bare composition.
    val share: DataFrame => DataFrame =
      if (stagedDir.isEmpty) df => df.repartition(col("doc_id")) else identity
    val bench = docs.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id"), col("text").as("text_clean"))
    val corpus = docs.filter(col("doc_id") % 100 =!= 0)
      .select("doc_id", "source", "text")
    val g = QualityFilters.gopherFlags(corpus, "text")
      .filter(col("g_word_count") && col("g_mean_word_len") &&
        col("g_symbol_ratio") && col("g_bullet_lines") &&
        col("g_ellipsis_lines") && col("g_alpha_words"))
      .select("doc_id", "source", "text")
    val s2 = share(QualityFilters.c4CleanLines(g, "text")
      .filter(!col("c4_page_drop"))
      .select(col("doc_id"), col("source"),
        when(col("c4_lines_kept") > 0, col("c4_text"))
          .otherwise(col("text")).as("text2")))
    val s3 = share(checkpoint(
      Boilerplate.stripFrequentPrefixes(s2, "doc_id", "text2",
          "source", k = 2, minDf = 2L)
        .select("doc_id", "source", "text_clean"),
      "stage3_clean"))
    val s4 = checkpoint(
      Decontaminate.cleanByOverlap(s3, bench, "doc_id", "text_clean",
        maxOverlapPpm = 200000L, n = 3),
      "stage4_decontaminated")
    val dt = share(s4.select(col("doc_id"), col("source"),
        size(TextQueries.tokensCol(col("text_clean"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1))
    // totals → weights → rules derived IN-PLAN (no driver collect): the old
    // domainTokenTotals collect executed the whole cleaning subtree once
    // more before the final plan ran it again
    Sampling.sqrtTemperatureMixtureInPlan(dt, col("source"), col("doc_id"),
        col("n_tokens"), SamplingQueries.MixtureBudget)
      .select("doc_id", "source", "n_tokens", "copies")
  }

  /** End-to-end curation in CCNet ORDER (Wenzek et al. 2020 §3: dedup
    * before quality filtering): cross-document LINE dedup first
    * ([[graft.operators.Boilerplate.stripFrequentLines]]), then Gopher
    * rules → C4 line cleaning → overlap-fraction decontamination →
    * temperature mixture — the line-removal output (`text_kept`) is the
    * input of every downstream stage. Same policy knobs as
    * `q_curation_pipeline3` (stop-word rule dropped, C4
    * falls back to the stage input when no line qualifies, 3-grams at
    * 20 % ppm); the boilerplate-PREFIX stage is absent — in this
    * ordering the line dedup IS the boilerplate removal.
    *
    * The synthetic corpus has no within-source duplicate lines at any
    * SF (measured), so the oracle locks the full composed flow on the
    * line-strip IDENTITY path; the removal→downstream interplay (a
    * stripped banner changing Gopher/C4/decontamination verdicts) is
    * spec-locked on planted fixtures in `CurationPipelineSpec`.
    */
  val qCurationPipeline4 = q(
    "q_curation_pipeline4", {
      val stageCtes =
        "corpus AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 100 <> 0), " +
          // stage 1: frequent-line removal per source (mirror of
          // q_strip_lines, scoped to the corpus slice)
          "lt AS (SELECT doc_id, source, string_split(text, chr(10)) AS ls FROM corpus), " +
          "lex AS (SELECT doc_id, source, unnest(ls) AS l, " +
          "unnest(range(1, len(ls) + 1)) AS pos FROM lt), " +
          "lfq AS (SELECT source, l FROM (SELECT source, l, " +
          "count(DISTINCT doc_id) AS df FROM lex WHERE NOT regexp_matches(l, '^\\s*$') " +
          "GROUP BY source, l) WHERE df >= 2), " +
          "lre AS (SELECT lex.doc_id, " +
          "array_to_string(list(lex.l ORDER BY lex.pos) FILTER (WHERE lfq.l IS NULL), chr(10)) AS tk " +
          "FROM lex LEFT JOIN lfq ON lex.source = lfq.source AND lex.l = lfq.l " +
          "GROUP BY lex.doc_id), " +
          "st1 AS (SELECT c.doc_id, c.source, coalesce(lre.tk, '') AS text1 " +
          "FROM corpus c LEFT JOIN lre ON c.doc_id = lre.doc_id), " +
          // stage 2: Gopher rules (minus stop words) over the STRIPPED text
          "wr AS (SELECT doc_id, source, text1, " +
          "list_filter(regexp_split_to_array(text1, '\\s+'), x -> x <> '') AS w, " +
          "string_split(text1, chr(10)) AS ls FROM st1), " +
          "gf AS (SELECT doc_id, source, text1 FROM wr WHERE " +
          "len(w) BETWEEN 50 AND 100000 " +
          "AND 3*len(w) <= coalesce(list_sum(list_transform(w, x -> len(x))), 0) " +
          "AND coalesce(list_sum(list_transform(w, x -> len(x))), 0) <= 10*len(w) " +
          "AND len(regexp_extract_all(text1, '#'))*10 <= len(w) " +
          "AND len(regexp_extract_all(text1, '\\.\\.\\.'))*10 <= len(w) " +
          "AND len(list_filter(ls, l -> regexp_matches(trim(l), '^[-*•]')))*10 <= len(ls)*9 " +
          "AND len(list_filter(ls, l -> regexp_matches(l, '\\.\\.\\.\\s*$')))*10 <= len(ls)*3 " +
          "AND len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))*5 >= len(w)*4), " +
          // stage 3: C4 clean with fallback; page-drop gates
          "c4 AS (SELECT doc_id, source, text1, " +
          "list_filter(string_split(text1, chr(10)), l -> " +
          "regexp_matches(l, '[.!?\"]\\s*$') AND " +
          "len(list_filter(regexp_split_to_array(trim(l), '\\s+'), x -> x <> '')) >= 5 AND " +
          "NOT contains(lower(l), 'javascript')) AS keptl, " +
          "(contains(lower(text1), 'lorem ipsum') OR contains(text1, '{')) AS pdrop FROM gf), " +
          "s3 AS (SELECT doc_id, source, CASE WHEN len(keptl) > 0 " +
          "THEN array_to_string(keptl, chr(10)) ELSE text1 END AS text2 FROM c4 WHERE NOT pdrop), " +
          // stage 4: overlap-fraction decontamination (3-grams, 20% ppm)
          // vs the RAW benchmark slice
          s"bgr AS (SELECT DISTINCT unnest(${TextQueries.ngramsSql(3)}) AS gr " +
          "FROM documents WHERE doc_id % 100 = 0), " +
          s"dgr AS (SELECT doc_id, unnest(list_distinct(${TextQueries.ngramsSqlCol("text2", 3)})) AS gr FROM s3), " +
          "ost AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS gt, " +
          "CAST(sum(CASE WHEN gr IN (SELECT gr FROM bgr) THEN 1 ELSE 0 END) AS BIGINT) AS gm " +
          "FROM dgr GROUP BY doc_id), " +
          "s4 AS (SELECT s3.doc_id, s3.source, s3.text2 FROM s3 LEFT JOIN ost USING (doc_id) " +
          "WHERE NOT (coalesce(gm, 0) * 1000000 > coalesce(gt, 0) * 200000))"
      val dt4 =
        s"SELECT doc_id, source, CAST(len(${TextQueries.tokensSqlCol("text2")}) AS BIGINT) AS n_tokens " +
          s"FROM s4 WHERE len(${TextQueries.tokensSqlCol("text2")}) >= 1"
      s"WITH $stageCtes, " +
        s"${SamplingQueries.mixtureCtesWith(dt4, SamplingQueries.sqrtTempWeightsCte)} " +
        "SELECT doc_id, source, n_tokens, copies FROM m"
    }) { (s, d) =>
    curationPipeline4(Tables.documents(s, d), stagedDir = None)
  }

  /** The `q_curation_pipeline4` flow (CCNet order — see the query doc) as
    * a reusable function, with the same [[stageCheckpoint]] staging
    * option as [[curationPipeline3]].
    */
  def curationPipeline4(docs: DataFrame,
      stagedDir: Option[String]): DataFrame = {
    import graft.operators.{Boilerplate, Decontaminate, QualityFilters, Sampling}
    val checkpoint = stageCheckpoint(stagedDir) _
    // same shared-exchange rationale as [[curationPipeline3]] — but here
    // stripFrequentLines' per-doc regroup aggregate ALREADY hash-partitions
    // on doc_id, so Spark elides these pinned repartitions as redundant
    // (the strip aggregate's exchange is what every downstream consumer
    // reuses at runtime; only the cheap map-side Gopher/C4 projections
    // above it replay per consumer). Kept as declarations of the intended
    // boundary: if the strip shape ever stops partitioning by doc_id, the
    // pin re-materializes instead of the subtree silently replaying.
    val share: DataFrame => DataFrame =
      if (stagedDir.isEmpty) df => df.repartition(col("doc_id")) else identity
    val bench = docs.filter(col("doc_id") % 100 === 0)
      .select(col("doc_id"), col("text").as("text_kept"))
    val corpus = docs.filter(col("doc_id") % 100 =!= 0)
      .select("doc_id", "source", "text")
    // stage 1 (the CCNet inversion): cross-document line dedup FIRST
    val s1 = Boilerplate.stripFrequentLines(corpus, "doc_id", "text",
        "source", minDf = 2L)
      .select("doc_id", "source", "text_kept")
    // stage 2: Gopher rules (minus stop words) over the stripped text
    val s2 = QualityFilters.gopherFlags(s1, "text_kept")
      .filter(col("g_word_count") && col("g_mean_word_len") &&
        col("g_symbol_ratio") && col("g_bullet_lines") &&
        col("g_ellipsis_lines") && col("g_alpha_words"))
      .select("doc_id", "source", "text_kept")
    // stage 3: C4 clean, falling back to the stage input when no line
    // qualifies; page-level drop gates
    val s3 = share(checkpoint(
      QualityFilters.c4CleanLines(s2, "text_kept")
        .filter(!col("c4_page_drop"))
        .select(col("doc_id"), col("source"),
          when(col("c4_lines_kept") > 0, col("c4_text"))
            .otherwise(col("text_kept")).as("text_kept")),
      "stage3_clean"))
    // stage 4: overlap-fraction decontamination vs the raw bench slice
    val s4 = checkpoint(
      Decontaminate.cleanByOverlap(s3, bench, "doc_id", "text_kept",
        maxOverlapPpm = 200000L, n = 3),
      "stage4_decontaminated")
    // stage 5: temperature mixture over surviving token counts — totals →
    // weights → rules in-plan (no driver collect; see curationPipeline3)
    val dt = share(s4.select(col("doc_id"), col("source"),
        size(TextQueries.tokensCol(col("text_kept"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") >= 1))
    Sampling.sqrtTemperatureMixtureInPlan(dt, col("source"), col("doc_id"),
        col("n_tokens"), SamplingQueries.MixtureBudget)
      .select("doc_id", "source", "n_tokens", "copies")
  }

  /** Dedup → quality gate → DSIR selection composed into ONE flow — the
    * "curate then pick what looks like the target domain" recipe (the
    * DSIR paper's own pipeline position: selection runs AFTER cleaning).
    * Stage anatomy: exact dedup survivors ([[graft.operators.Dedup
    * .exact]]) → ≥ 5-token quality gate → `Dsir.fit` on the SURVIVING
    * German docs vs the surviving English docs → Gumbel-top-40 draw.
    * Locks the derived-corpus composition the standalone q_dsir entries
    * can't: the model is fitted on post-dedup text, so a collapsed
    * duplicate must shift every bucket count it touched (both engines
    * recompute from the same survivor set, value-exact).
    */
  val qCurationPipeline5 = q(
    "q_curation_pipeline5", {
      val toks = TextQueries.tokensSqlCol("text")
      val stageCtes =
        "sur AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)), " +
          "base AS (SELECT d.doc_id, d.text, d.lang FROM documents d " +
          s"JOIN sur USING (doc_id) WHERE len($toks) >= 5)"
      s"WITH $stageCtes, " +
        SamplingQueries.dsirCtesOver(
          "SELECT text FROM base WHERE lang = 'de'",
          "SELECT doc_id, text FROM base WHERE lang = 'en'") +
        s", ${SamplingQueries.dsirDrawSql(seed = 11L, k = 40)}"
    }) { (s, d) =>
    import graft.operators.{Dedup, Dsir}
    val base = Dedup.exact(Tables.documents(s, d), "doc_id", "text")
      .filter(size(TextQueries.tokensCol(col("text"))) >= 5)
      .select("doc_id", "text", "lang")
    // ONE tagged fit pass (r18): the dedup+gate subtree `base` executes
    // once for both model sides instead of once per side
    val model = Dsir.fitSplit(base,
      when(col("lang") === "de", lit(true))
        .when(col("lang") === "en", lit(false)),
      "text", buckets = SamplingQueries.DsirBuckets)
    Dsir.resample(base.filter(col("lang") === "en"), "doc_id", "text",
      model, k = 40, seed = 11L)
  }

  /** The MODERN curation flow — every post-r16 stage composed into one
    * value-checked plan: URL dedup (canonical-key survivors) → PII
    * masking (the MASKED text flows downstream, so a changed byte moves
    * every later stage) → learned classifier gate (hashed-gram linear
    * logit ≥ 0) → BPE model-true token counts → static-weight token-
    * budget mixture. The oracle chains the five stages' shared CTE
    * mirrors ([[TextQueries.urlCanonSql]]/[[TextQueries.piiMaskCtes]]/
    * [[TextQueries.clfCtes]]/[[BpeQueries.bpeCtesOver]]/
    * [[SamplingQueries.mixtureCtesFrom]]) — one definition per rule on
    * each side, so a drift in ANY stage breaks the hash.
    */
  val qCurationPipeline6 = q(
    "q_curation_pipeline6", {
      val curl = TextQueries.urlCanonSql(s"(${TextQueries.urlPlantSql})")
      s"WITH RECURSIVE c AS (SELECT doc_id, $curl AS curl FROM documents), " +
        "sur AS (SELECT doc_id FROM documents WHERE doc_id IN " +
        "(SELECT min(doc_id) FROM c WHERE curl IS NOT NULL GROUP BY curl) " +
        "OR doc_id % 97 = 0), " +
        TextQueries.piiMaskCtes(
          s"SELECT d.doc_id, d.source, ${TextQueries.piiPlantSql} AS t " +
            "FROM documents d JOIN sur USING (doc_id)") + ", " +
        TextQueries.clfCtes("SELECT doc_id, t AS text FROM msk", "text") + ", " +
        "kept AS (SELECT k.doc_id, k.source, k.t FROM msk k " +
        "LEFT JOIN clf USING (doc_id) " +
        s"WHERE ${TextQueries.ClfBiasMicro} + coalesce(lg, 0) >= 0), " +
        BpeQueries.bpeCtesOver(BpeQueries.FixedModel,
          "SELECT doc_id, t AS text FROM kept") + ", " +
        "cnt6 AS (SELECT k.doc_id, k.source, " +
        "CAST(coalesce(len(ts), 0) AS BIGINT) AS n_tokens " +
        "FROM kept k LEFT JOIN agg USING (doc_id)), " +
        SamplingQueries.mixtureCtesFrom(
          "SELECT doc_id, source, n_tokens FROM cnt6 WHERE n_tokens >= 1") +
        " SELECT doc_id, source, n_tokens, copies FROM m"
    }) { (s, d) =>
    curationPipeline6(Tables.documents(s, d))
  }

  /** The `q_curation_pipeline6` flow as a reusable function (also the
    * round-18 full-pipeline scale-rehearsal subject).
    */
  def curationPipeline6(docs: DataFrame): DataFrame = {
    import graft.operators.{Bpe, Pii, QualityClassifier, Sampling, Urls}
    // stage 1: URL dedup on the canonical planted url (the free
    // pre-content dedup key) — null-url docs pass through
    val s1 = Urls.dedupByUrl(docs.withColumn("url", TextQueries.urlPlantCol),
      "doc_id", "url")
    // stage 2: PII mask the planted payload; the MASKED text flows on
    val planted = s1.select(col("doc_id"), col("source"),
      TextQueries.piiPlantCol.as("t"))
    val masked = Pii.maskPii(planted, "t")
      .select(col("doc_id"), col("source"), col("t_masked").as("t"))
    // stage 3: learned classifier gate (map-side logit >= 0)
    val s3 = QualityClassifier.filterByScore(masked, "t",
      TextQueries.ClfModel, thresholdMicro = 0L)
    // stage 4: model-true token counts -> static token-budget mixture, the
    // totals/rules in-plan behind one pinned exchange (the collect form
    // replayed URL-dedup → mask → gate → BPE once more for the totals —
    // see curationPipeline3)
    val dt = s3.select(col("doc_id"), col("source"),
      Bpe.tokenCount(col("t"), BpeQueries.FixedModel).as("n_tokens"))
      .filter(col("n_tokens") >= 1)
      .repartition(col("doc_id"))
    Sampling.mixtureByTokenBudgetInPlan(dt, col("source"), col("doc_id"),
        col("n_tokens"), SamplingQueries.MixtureWeights,
        SamplingQueries.MixtureBudget)
      .select("doc_id", "source", "n_tokens", "copies")
  }

  /** The 2024-era model-driven curation flow — the round-18 learned
    * stages composed into ONE value-checked plan: multi-class LID gate
    * (keep docs the fused K-class kernel labels 'en') → n-gram-LM
    * perplexity gate (English-fitted stupid-backoff trigram model, keep
    * per-token NLL ≤ 4.0 in micro-units — an ABSOLUTE gate, so no
    * window; the bucketed form is `q_lm_ppl_buckets`) → embedding-space
    * cluster balance (join survivors to their vectors, nearest-of-8
    * centroid assignment, ≤ 8 per cluster by the deterministic
    * hash-rank rule). Every stage reuses its standalone oracle mirror
    * ([[TextQueries.clfMultiCtes]] / [[LmQueries.lmCtesOver]] / the
    * `q_cluster_balanced` window SQL), so a drift in ANY stage breaks
    * the hash.
    *
    * Scale anatomy: stages 1–2 are map-side projections (models as plan
    * reference objects); the vector join is keyed on the id both tables
    * share (co-partitioned at production scale, broadcast at this SF);
    * the cap's window is the ONE added shuffle.
    */
  // declared BEFORE the query val: the SQL string interpolates these at
  // object init, and a forward val reference would silently embed 0
  private val Pipeline7NllGate = 4000000L
  private val Pipeline7Cap = 8

  val qCurationPipeline7 = q(
    "q_curation_pipeline7", {
      val cosCE = s"${VectorQueries.dotSql("embedding", "ce")} / " +
        s"(${VectorQueries.normSql("embedding")} * ${VectorQueries.normSql("ce")})"
      s"WITH ${TextQueries.clfMultiCtes("SELECT doc_id, text FROM documents")}, " +
        "lid AS (SELECT d.doc_id, d.text FROM documents d " +
        "JOIN mlab USING (doc_id) WHERE clf_label = " +
        s"'${TextQueries.ClfMultiLabels.head}'), " +
        LmQueries.lmCtesOver(
          "SELECT text FROM documents WHERE lang = 'en'",
          "SELECT doc_id, text FROM lid") + ", " +
        s"nl AS (SELECT sc.doc_id, ${LmQueries.nllExprSql} AS nll " +
        "FROM sc JOIN dt USING (doc_id)), " +
        s"ppl AS (SELECT doc_id, nll FROM nl WHERE nll IS NOT NULL AND " +
        s"nll <= $Pipeline7NllGate), " +
        "cc AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings " +
        "WHERE vec_id < 8), " +
        "asg AS (SELECT doc_id, cid, cos FROM (SELECT p.doc_id, cid, " +
        s"$cosCE AS cos, row_number() OVER (PARTITION BY p.doc_id ORDER BY " +
        s"$cosCE DESC, cid) AS rn FROM ppl p " +
        "JOIN embeddings e ON e.vec_id = p.doc_id, cc WHERE e.vec_id >= 8) " +
        "WHERE rn = 1) " +
        "SELECT doc_id, cid AS centroid_id, nll AS lm_nll_per_tok_q FROM " +
        "(SELECT a.doc_id, cid, p.nll, row_number() OVER (PARTITION BY cid " +
        s"ORDER BY (${TextQueries.hash32Sql("CAST(a.doc_id AS VARCHAR)")} " +
        "% 1000), a.doc_id) AS kr FROM asg a JOIN ppl p USING (doc_id)) " +
        s"WHERE kr <= $Pipeline7Cap"
    }) { (s, d) =>
    curationPipeline7(s, Tables.documents(s, d), Tables.embeddings(s, d))
  }

  /** The `q_curation_pipeline7` flow as a reusable function. */
  def curationPipeline7(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, emb: DataFrame): DataFrame = {
    import graft.operators.{NgramLm, QualityClassifier, Sampling, Similarity}
    // stage 1: multi-class LID gate (one fused kernel pass, map-side)
    val s1 = QualityClassifier.classifyMulti(docs, "text",
        TextQueries.ClfMultiModels)
      .where(col("clf_label") === TextQueries.ClfMultiLabels.head)
      .select("doc_id", "text")
    // stage 2: LM perplexity gate — English-fitted reference model (the
    // CCNet shape: the reference corpus is independent of the gate),
    // absolute integer NLL threshold so the stage stays a projection;
    // fit constants shared with the standalone q_lm_* entries
    val model = NgramLm.fit(docs.filter(col("lang") === "en"), "text",
      n = LmQueries.N, minCount = LmQueries.MinCount)
    val s2 = NgramLm.scoreWithNll(s1, "text", model)
      .where(col("lm_nll_per_tok_q").isNotNull &&
        col("lm_nll_per_tok_q") <= Pipeline7NllGate)
      .select("doc_id", "lm_nll_per_tok_q")
    // stage 3: embedding cluster balance over the survivors
    val cents = Similarity.collectCentroids(
      emb.filter(col("vec_id") < 8), "vec_id", "embedding")
    val joined = s2.join(
      emb.filter(col("vec_id") >= 8).withColumnRenamed("vec_id", "doc_id"),
      Seq("doc_id"))
    Sampling.clusterBalancedCap(joined, "doc_id", "embedding", cents,
        Pipeline7Cap)
      .select("doc_id", "centroid_id", "lm_nll_per_tok_q")
  }

  val all: Seq[GraftQuery] = Seq(q3Shipping, q5Region, q10Returns, qPivot,
    qSaltedAgg, qSaltedJoin, q14Promo, q18Large, q9Profit, q12Priority,
    q4PriorityExists, q13Custdist, q17SmallQty, q11Important,
    qCurationPipeline2, qCurationPipeline3, qCurationPipeline4,
    qCurationPipeline5, qCurationPipeline6, qCurationPipeline7)
}

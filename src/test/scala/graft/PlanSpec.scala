package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode

/** Physical-plan assertions for headline queries: the properties that make
  * these plans survive a 100 TB scale-up (broadcast dims, predicate pushdown,
  * column pruning, no unnecessary shuffles) are locked in here so a future
  * refactor can't silently regress them.
  *
  * Runs against the sf0.001 test data (read-only).
  */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  /** The FINAL adaptive plan (query stages materialized, exchange reuse
    * visible): the static tree duplicates every shared subtree once per
    * consumer, so runtime-dedupe properties (r18's pinned shared
    * exchanges) are only assertable here.
    */
  private def finalPlan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, dir)
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("q3_shipping broadcasts both dimension sides; fact table never shuffles pre-join") {
    val p = plan("q3_shipping")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    assert(!p.contains("SortMergeJoin"), "dims must broadcast, not sort-merge")
    // dimension filter reaches the parquet scan
    assert(p.contains("EqualTo(c_mktsegment,BUILDING)"), "pushdown lost")
  }

  test("q_fk_join on unique-key snapshots: scan -> broadcast join, no stateful fold") {
    val p = plan("q_fk_join")
    assert(p.contains("BroadcastHashJoin"))
    assert(!p.contains("FlatMapGroupsWithState") && !p.contains("MapGroups"),
      "snapshot fast path must skip the latest-per-key fold")
    // column pruning: the orders scan reads only the three needed columns
    assert(p.contains("struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>"),
      "orders scan must be pruned to 3 columns")
  }

  test("q1_agg aggregates with map-side partials inside codegen") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "partial+final agg expected")
    // AQE hides codegen ids pre-execution; assert the agg strategy instead
    assert(!p.contains("SortAggregate"), "must stay a hash aggregate")
  }

  test("q_join_global broadcasts the dimension (fact side never shuffles)") {
    val p = plan("q_join_global")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"))
  }

  test("q_filter pushes the predicate into the parquet scan") {
    val p = plan("q_filter")
    assert(p.contains("EqualTo(event_type,click)"), "predicate must reach the scan")
    assert(p.contains("[codegen id :"), "filter must stay inside codegen")
  }

  test("hash sampling is a pure map-side filter: zero shuffles") {
    val p = plan("q_sample_hash")
    assert(!p.contains("Exchange"), "sampling must not shuffle")
    assert(p.contains("md5_prefix32"), "bucket filter via the native expression")
  }

  test("q_semdedup: map-side assignment, within-cell equi-join — no cartesian anywhere") {
    val p = plan("q_semdedup")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      "semantic dedup must pair via the cell equi-join, never all-pairs:\n" + p.take(1500))
    // nearest-centroid assignment is a literal-array fold, not a join
    assert(!p.contains("rangepartitioning"), p.take(1500))
  }

  test("q_shuffle_shard: one hash shuffle on shard, local sort — never a global sort") {
    val p = plan("q_shuffle_shard")
    assert("\\+- Exchange".r.findAllIn(p).size == 1, p.take(1500))
    assert(!p.contains("rangepartitioning"),
      "a global sort would range-partition:\n" + p.take(1500))
    assert(p.contains("hashpartitioning(shard"), p.take(1500))
  }

  test("q9_profit five-table join broadcasts all three dimensions") {
    val p = plan("q9_profit")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, "part/supplier/nation broadcast")
    assert(!p.contains("SortMergeJoin"))
  }

  test("q_ann_ivf assignment is a map-side fold: no join, no window exchange") {
    val p = plan("q_ann_ivf")
    assert(!p.contains("Window"), "argmax must be a per-row fold, not row_number")
    // only the balancing repartition + the final groupBy(cid) agg may shuffle
    assert("\\+- Exchange".r.findAllIn(p).size <= 2, p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "no centroid crossJoin")
  }

  test("q_ann_multi: corpus never shuffles before the bucket join (query side broadcast)") {
    val p = plan("q_ann_multi")
    assert(p.contains("BroadcastHashJoin"), "query set must broadcast")
    assert(!p.contains("SortMergeJoin"), "corpus must not shuffle for the join")
  }

  test("q_decontaminate: benchmark grams broadcast into the semi join") {
    val p = plan("q_decontaminate")
    assert(p.contains("BroadcastHashJoin LeftSemi"),
      "corpus n-grams must probe a broadcast benchmark set, never shuffle for it")
    assert(!p.contains("SortMergeJoin LeftSemi"), p.take(2000))
  }

  test("q_decontaminate_bloom: corpus rows never shuffle (map-side Bloom probe)") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val df = SparkEntry.queries("q_decontaminate_bloom")(spark, dir)
    // the BLOOM flagging leg must carry NO join at all — the benchmark
    // side is a broadcast Bloom filter probed in a Filter. The only joins
    // in the whole query are the EXACT comparison leg the oracle-checked
    // no-false-negative assertion added (its gram semi join) plus the two
    // id-level flag joins of the reporting wrapper
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.size === 3,
      s"expected exact-leg semi join + two flag joins, got ${joins.size}")
    val p = plan("q_decontaminate_bloom")
    assert(!p.contains("SortMergeJoin"), "id flag join must broadcast at this size")
    // build + probe are the native runtime-filter expressions — the whole
    // Bloom path must stay inside codegen with no Scala UDF anywhere
    val udfs = df.queryExecution.optimizedPlan.collect {
      case pl if pl.expressions.exists(_.exists(
        _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.ScalaUDF])) => pl
    }
    assert(udfs.isEmpty, s"Bloom probe must not use a ScalaUDF:\n${udfs.mkString("\n")}")
  }

  test("batch ANN serving joins broadcast query sides; the corpus never shuffles pre-join") {
    Seq("q_ann_multiprobe_batch", "q_ann_ivf_search_batch").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("BroadcastHashJoin"), s"$name: query side must broadcast")
      assert(!p.contains("SortMergeJoin"), s"$name: corpus must not sort-merge")
      // the only Exchanges allowed are the broadcast itself and the final
      // per-query ranking shuffle — nothing repartitions the corpus before
      // the bucket/cell join
      val joins = df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
      assert(joins.size === 1, s"$name: exactly one probe join, got ${joins.size}")
    }
  }

  test("q_ann_topk_batch ranks via partial-aggregated heaps, not a window over the cross product") {
    val df = SparkEntry.queries("q_ann_topk_batch")(spark, dir)
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    // the k-capped heap aggregate must run two-phase (partial before the
    // shuffle), so the exchange carries partitions x queries x k rows --
    // a row_number window would shuffle the whole corpus x queries product
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      "topk_ids must aggregate two-phase:\n" + p.take(1500))
    assert(!p.contains("Window"), "no window ranking on the batch-exact path")
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastHashJoin"),
      "query sample must ride as literals, not a join")
  }

  test("q_ngram_jaccard prep is join-free: scan -> explode -> one reused blocking shuffle") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, RepartitionByExpression}
    val df = SparkEntry.queries("q_ngram_jaccard")(spark, dir)
    // candidate generation blocks on (source, shingle-hash): every
    // RepartitionByExpression in the plan is THAT one blocking repartition
    // (the logical tree duplicates it per agg branch; physical reuse below)
    val repartKeys = df.queryExecution.optimizedPlan.collect {
      case r: RepartitionByExpression =>
        r.partitionExpressions.map(_.sql).mkString(",") }
    assert(repartKeys.distinct.size === 1 &&
      repartKeys.head.contains("source"),
      s"expected one blocking key, got $repartKeys")
    // the only joins are id-equality size joins AFTER the pair scan — the
    // prep stage itself (scan -> explode) must not join for `source`
    val joins = df.queryExecution.optimizedPlan.collect { case j: Join => j }
    assert(joins.size === 2, s"expected the two size joins only, got ${joins.size}")
    assert(joins.forall(j => j.condition.exists(c =>
      c.toString.contains("ida") || c.toString.contains("idb"))),
      "a non-id join crept into the pair path")
    // (the two branches' identical Exchanges dedupe at AQE runtime into a
    // ReusedExchange — runtime-only, so not assertable on the static plan)
  }

  test("ANN query paths are join-free top-k: pushed scan filter + TakeOrdered") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    for (name <- Seq("q_ann_ivf_search", "q_ann_multiprobe")) {
      val df = SparkEntry.queries(name)(spark, dir)
      // probe selection happens driver-side over k centroids/bits, so the
      // corpus leg must carry NO join at any corpus size
      assert(df.queryExecution.optimizedPlan.collect { case j: Join => j }.isEmpty,
        s"$name grew a join")
      val p = plan(name)
      assert(p.contains("TakeOrderedAndProject"),
        s"$name lost the top-k short-circuit (global sort instead?)")
      assert(p.contains("PushedFilters: [IsNotNull(vec_id)"),
        s"$name no longer pushes the id predicate into the scan")
    }
  }

  test("q_embed_near_dup candidates shuffle on the LSH bucket; no label-keyed join") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    import org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression
    val df = SparkEntry.queries("q_embed_near_dup")(spark, dir)
    // candidate generation must block on (label, band, bucket): the run
    // scan's one repartition keys on an expression list including the
    // bucket — blocking on the fixed-cardinality label alone is
    // O(N^2/|labels|) at 100 TB. Structural check (not a plan-string grep):
    // robust to rendering changes around the expressions.
    val bucketRepart = df.queryExecution.optimizedPlan.collect {
      case r: RepartitionByExpression
        if r.partitionExpressions.exists(_.toString.contains("__bkt")) => r
    }
    assert(bucketRepart.nonEmpty, "candidate scan lost the __bkt bucket partitioning")
    // the only joins left are id-equality verify joins — nothing may shuffle
    // pairs on the label
    assert(!df.queryExecution.optimizedPlan.collect { case j: Join => j }
      .exists(j => j.condition.exists(_.toString.contains("label"))),
      "a join blocks on label")
  }

  test("q_chunk_tokens is pure map-side: no Exchange anywhere") {
    val p = plan("q_chunk_tokens")
    assert(!p.contains("Exchange"), "chunking must not shuffle:\n" + p.take(1500))
    assert(p.contains("Generate"), "expected the per-doc start-sequence explode")
  }

  test("q_pack_sequences shuffles once, on the packing group only") {
    val p = plan("q_pack_sequences")
    // one Exchange for the per-source running-sum window, nothing else
    assert("Exchange".r.findAllIn(p.replace("ReusedExchange", "")).size <= 2,
      p.take(1500)) // Exchange node + its Arguments echo line
  }

  test("q_dsl_stream_table_join unique-snapshot path: equi join, no as-of window") {
    val p = plan("q_dsl_stream_table_join")
    // the withUniqueKeys snapshot skips the union + last(...) as-of fold and
    // the row_number latest-per-key fold — scan -> join only
    assert(!p.contains("Window"), "unique snapshot must not need a window fold")
    assert(!p.contains("RunningWindowFunction"), p.take(1500))
    assert(p.contains("Join"), "expected a plain equi join")
  }

  test("q6_forecast pushes all three range predicates into the scan; one exchange total") {
    val p = plan("q6_forecast")
    assert(p.contains("GreaterThanOrEqual(l_shipdate,1996-01-01"), "shipdate range lost")
    assert(p.contains("LessThan(l_quantity,24.0)"), "quantity bound lost")
    assert(p.contains("GreaterThanOrEqual(l_discount,0.03)"), "discount range lost")
    // scan-agg only: the single exchange is the final single-partition gather
    assert("Exchange".r.findAllIn(p).size <= 2, p.take(1500)) // node + echo line
    assert(!p.contains("SortAggregate"))
  }

  test("q19_disjunct splits the OR across sides: both scans get pushed disjunctions") {
    val p = plan("q19_disjunct")
    // part-only conjuncts extracted from the OR-of-ANDs and pushed to part
    assert(p.contains("And(EqualTo(p_brand,Brand#1),LessThanOrEqual(p_size,15))"),
      "part-side disjunction must reach the part scan")
    // lineitem-only conjuncts (quantity ranges) pushed to lineitem
    assert(p.contains("And(GreaterThanOrEqual(l_quantity,1.0),LessThanOrEqual(l_quantity,21.0))"),
      "lineitem-side disjunction must reach the lineitem scan")
  }

  test("q21_waiting decorrelates without an Expand (no multi-distinct blowup)") {
    val p = plan("q21_waiting")
    // two countDistincts would plan an Expand (2x the fact rows); the
    // two-phase pair-dedupe aggregate must keep the plan Expand-free
    assert(!p.contains("Expand"), "multi-distinct Expand crept back in")
    assert("HashAggregate".r.findAllIn(p).size >= 4, "two-phase x two-level aggs expected")
    // the l1 side reads only R rows: filter pushed into its scan
    assert(p.contains("EqualTo(l_returnflag,R)"), "R filter must reach the scan")
  }

  test("q2_min_cost semi-reduces the fact scan before the pair aggregate") {
    val p = plan("q2_min_cost")
    assert(p.contains("LeftSemi"), "part/supplier filters must semi-reduce pre-agg")
    assert(!p.contains("CartesianProduct"))
    // the pair aggregate reads a pruned lineitem scan (4 columns)
    assert(p.contains("struct<l_partkey:bigint,l_suppkey:bigint,l_quantity:double,l_extendedprice:double>"),
      "lineitem scan must be pruned to the 4 pair-agg columns")
  }

  test("q22_opportunity: scalar broadcast, date-scoped anti join pushdown") {
    val p = plan("q22_opportunity")
    assert(p.contains("LeftAnti"), "NOT EXISTS must plan as an anti join")
    assert(p.contains("GreaterThanOrEqual(o_orderdate,2000-01-01"),
      "anti-join build side must scan only recent orders")
    assert(!p.contains("CartesianProduct"), "one-row scalar must broadcast")
  }

  test("q_sample_mixture: in-plan totals behind ONE shared tokenize pass; domain IN pushed to the scan") {
    val p = plan("q_sample_mixture")
    // r18: totals/rules moved IN-PLAN (no driver collect, which executed
    // the tokenize pass once more before the final plan ran it again);
    // the tokenized frame is pinned behind a doc_id repartition both the
    // totals aggregate and the sampled rows read (runtime exchange reuse)
    assert(p.contains("REPARTITION_BY_COL"), "shared tokenize boundary lost")
    assert(p.contains("In(source"), "weighted-domain pre-filter must reach the scan")
    assert(p.contains("md5_prefix32"), "ppm bucket via the native expression")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "rules frame must broadcast back:\n" + p.take(2000))
    val f = finalPlan("q_sample_mixture")
    assert("ReusedExchange".r.findAllIn(f).size >= 1,
      "the pinned exchange must dedupe at runtime (totals + sampled rows):\n" +
        f.take(2500))
  }

  test("q_dedup_spans: gram pipeline is explode -> hash ops, never all-pairs") {
    val p = plan("q_dedup_spans")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "span detection must never pair docs all-against-all")
    assert(!p.contains("SortMergeJoin"), "dup-hash set joins hash-side")
    // the exact-content collapse must stay a HASH aggregate (a string agg
    // BUFFER would silently flip it to a corpus-wide SortAggregate)
    assert(!p.contains("SortAggregate"), "content collapse must hash-aggregate")
    // island merging is ONE per-content sort feeding both window ops
    assert("Sort \\(".r.findAllIn(p).size <= 1,
      "span merge must sort once, partitioned by content")
  }

  test("non-unique KTables keep the stateful latest-per-key fold (semantic guard)") {
    import spark.implicits._
    import graft.dsl._
    // two upserts for one key: the fold is REQUIRED for correctness here
    val t = new KTable(Seq(
      Upsert("k", Some(1), ts(1)), Upsert("k", Some(2), ts(2))).toDS())
    val p = t.view.queryExecution
      .explainString(ExplainMode.fromString("formatted"))
    // the fold must be present (row_number window in batch; MapGroups is the
    // streaming op's batch lowering) — a non-unique table may never skip it
    assert(p.contains("Window") || p.contains("MapGroups"))
    assert(t.view.collect().toMap === Map("k" -> 2))
  }

  test("quality filters are pure map-side with one tokenization per row") {
    for (name <- Seq("q_quality_gopher", "q_c4_clean")) {
      val p = plan(name)
      assert(!p.contains("Exchange"), s"$name must not shuffle:\n" + p.take(1200))
    }
    // the word/line arrays materialize ONCE (CollapseProject keeps the
    // non-cheap multi-referenced aliases in their own projection) — a
    // collapsed plan would re-split the text for every flag
    val g = plan("q_quality_gopher")
    assert("AS __gf_w".r.findAllIn(g).size == 1, g.take(1500))
    assert("AS __gf_ls".r.findAllIn(g).size == 1, g.take(1500))
  }

  test("q_curation_pipeline3: shared-exchange composition — every stage executes ONCE at runtime") {
    val p = plan("q_curation_pipeline3")
    // r18 re-plan: the three stage boundaries each self-joining consumer
    // reads (cleaned s2, stripped s3, token counts dt) are pinned
    // REPARTITION_BY_COL exchanges, and the mixture totals/weights/rules
    // moved IN-PLAN (the old driver collect executed the whole cleaning
    // subtree once more). The static tree textually duplicates the shared
    // subtrees per consumer — the single-execution property lives in the
    // FINAL adaptive plan's ReusedExchange nodes, asserted below.
    assert("REPARTITION_BY_COL".r.findAllIn(p).size >= 3,
      "the three pinned stage boundaries lost:\n" + p.take(2500))
    assert(!p.contains("CartesianProduct"), p.take(2500))
    // prefix join-back, gram probe, and the rules join-back broadcast
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(2500))
    // no global sort anywhere (the weights window sorts a #domains frame;
    // a rangepartitioning exchange would mean a corpus-level sort)
    assert(!p.contains("rangepartitioning"),
      "corpus-level sort snuck in:\n" + p.take(2500))
    val f = finalPlan("q_curation_pipeline3")
    assert("ReusedExchange".r.findAllIn(f).size >= 3,
      "shared stage boundaries must dedupe at runtime:\n" + f.take(2500))
  }

  test("q_image_dedup_incremental: probe prunes the index scan and broadcasts the batch") {
    val p = plan("q_image_dedup_incremental")
    // the batch's (band, bv) keys reach the index scan: flat IN as a
    // data filter (row-group pruning) + band partition pruning
    assert(p.contains("PushedFilters: [In(bv"),
      "bv IN pushdown lost:\n" + p.take(2000))
    assert(p.contains("PartitionFilters: [") && p.contains("band#"),
      "band partition pruning lost:\n" + p.take(2000))
    // the corpus-sized index never shuffles: the batch side broadcasts
    assert(p.contains("BroadcastHashJoin") && !p.contains("SortMergeJoin") &&
      !p.contains("CartesianProduct"), p.take(2000))
    assert("\\+- Exchange".r.findAllIn(p).size <= 3, p.take(2000))
  }

  test("q_curation_pipeline4: CCNet order on shared exchanges — no corpus-level sort, runtime reuse") {
    val p = plan("q_curation_pipeline4")
    // r18 re-plan (see q_curation_pipeline3): mixture totals/weights/rules
    // in-plan; the pipeline's shared boundaries ELIDE here — the line
    // strip's per-doc regroup aggregate already hash-partitions on doc_id,
    // so the pinned repartitions are redundant and Spark drops them (zero
    // NEW shuffles; the strip aggregate's exchange is what every consumer
    // reuses at runtime, asserted below; the map-side Gopher/C4
    // projections above it replay per consumer — measured a wash at sf0.1,
    // bounded by 2× regex over the stripped text). The decontamination
    // anti join plans sort-merge WITHOUT any exchange — both sides
    // co-partitioned on doc_id — per-partition sorts instead of
    // broadcasting a corpus-derived dirty set (the safer 100 TB shape).
    // A corpus-level global sort would show as rangepartitioning: absent.
    assert(!p.contains("CartesianProduct"), p.take(2500))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 4, p.take(2500))
    assert(!p.contains("rangepartitioning"),
      "corpus-level sort snuck in:\n" + p.take(2500))
    val f = finalPlan("q_curation_pipeline4")
    assert("ReusedExchange".r.findAllIn(f).size >= 2,
      "shared stage boundaries must dedupe at runtime:\n" + f.take(2500))
  }

  test("q_strip_lines: tiny-table broadcasts, ordered reassembly without a sort node") {
    val p = plan("q_strip_lines")
    // exchanges: the (group, line, doc) distinct agg's two phases + the
    // per-doc regroup — the frequent-line table and the final doc join
    // both broadcast back
    assert("\\+- Exchange".r.findAllIn(p).size <= 3, p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    // line order is restored via sort_array INSIDE the aggregate — a Sort
    // node would mean a per-doc (or global) sort snuck in
    assert(!p.contains("Sort ("), "reassembly must not plan a sort:\n" + p.take(2000))
  }

  test("q_bigram_rarity: gram count table joins broadcast, no sort-merge anywhere") {
    val p = plan("q_bigram_rarity")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
  }

  test("q_approx_quantile: window and groupBy share the event_type exchange") {
    val p = plan("q_approx_quantile")
    // the rank-interval check folds the sketch window and the count
    // aggregate over ONE hash partitioning — a second Exchange would mean
    // the groupBy stopped riding the window's partitioning
    assert("Exchange".r.findAllIn(p.replace("ReusedExchange", "")).size <= 2,
      p.take(2000)) // Exchange node + its Arguments echo line
    assert(p.contains("Window"), "expected the per-group sketch window")
  }

  test("q_asof_join: union + ONE key shuffle + one window — no range explosion") {
    val p = plan("q_asof_join")
    // the whole as-of resolves on a single hash partitioning by user_id
    assert("\\+- Exchange".r.findAllIn(p).size == 1, p.take(2000))
    assert(p.contains("Window"), "expected the carry-forward window")
    assert(!p.contains("Join"), "as-of must not plan any join operator:\n" + p.take(2000))
    // both side filters reach their scans
    assert(p.contains("EqualTo(event_type,purchase)") &&
      p.contains("EqualTo(event_type,view)"), "pushdown lost:\n" + p.take(2000))
  }

  test("q_asof_nearest: both directions ride the SAME single exchange — no join") {
    val p = plan("q_asof_nearest")
    // dual-window nearest still resolves on one hash partitioning; the
    // forward pass costs only a second in-partition sort
    assert("\\+- Exchange".r.findAllIn(p).size == 1, p.take(2000))
    assert(!p.contains("Join"), "nearest as-of must not plan any join:\n" + p.take(2000))
    assert("\\+- Window".r.findAllIn(p).size == 2,
      "expected the backward + forward window pair:\n" + p.take(2000))
  }

  test("q_resample_ffill: span explode + broadcast join-back + ONE window, no extra shuffle") {
    val p = plan("q_resample_ffill")
    // two key-side exchanges (per-bucket agg, span re-agg); the dense
    // frame keeps the keys partitioning, so the ffill window adds NONE
    assert("\\+- Exchange".r.findAllIn(p).size == 2, p.take(2000))
    assert(p.contains("Generate") && p.contains("Window"), p.take(2000))
    assert(p.contains("BroadcastHashJoin LeftOuter"),
      "sparse aggregates must broadcast back onto the dense spine:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("BroadcastNestedLoopJoin"),
      p.take(2000))
  }

  test("q_concurrency: netted sweep — two exchanges, one window, zero joins") {
    val p = plan("q_concurrency")
    assert("\\+- Exchange".r.findAllIn(p).size == 2, p.take(2000))
    assert(!p.contains("Join"), "the sweep must not plan a self-join:\n" + p.take(2000))
    assert(p.contains("Generate") && p.contains("Window"), p.take(2000))
    // the per-instant netting aggregate combines map-side before its exchange
    assert(p.contains("partial_sum"), "map-side netting lost:\n" + p.take(2000))
  }

  test("q_merge_intervals: distinct-start sweep — two exchanges, zero joins") {
    val p = plan("q_merge_intervals")
    // (keys, start) pre-agg + keys window repartition; the final island
    // groupBy rides the keys partitioning (a subset of its grouping keys)
    // and adds NO third exchange
    assert("\\+- Exchange".r.findAllIn(p).size == 2, p.take(2000))
    assert(!p.contains("Join"), "island merge must not plan a join:\n" + p.take(2000))
    assert("\\+- Window".r.findAllIn(p).size == 2,
      "expected the prev-max-end + island-number window pair:\n" + p.take(2000))
    assert(p.contains("In(o_orderpriority"), "priority pushdown lost:\n" + p.take(2000))
  }

  test("q_sessionize: point-event sessionization keeps the merge-intervals shape") {
    val p = plan("q_sessionize")
    assert("\\+- Exchange".r.findAllIn(p).size == 2, p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
    assert(p.contains("IsNotNull(ts)"), "null-ts pushdown lost:\n" + p.take(2000))
  }

  test("q_resample_interp: growing-frame window pair on the ffill plan shape") {
    val p = plan("q_resample_interp")
    assert("\\+- Exchange".r.findAllIn(p).size == 2, p.take(2000))
    assert(p.contains("BroadcastHashJoin LeftOuter"),
      "sparse aggregates must broadcast back onto the dense spine:\n" + p.take(2000))
    // backward pass + REVERSED-order forward pass: two windows, two
    // in-partition sorts, and crucially no unbounded-FOLLOWING frame
    // (which Spark evaluates by re-aggregating the remainder per row —
    // quadratic on a long key span; measured 3.34 → 0.86 s at sf0.1)
    assert("\\+- Window".r.findAllIn(p).size == 2 &&
      "\\+- Sort".r.findAllIn(p).size == 2, p.take(2000))
    assert(!p.toLowerCase.contains("unboundedfollowing") &&
      !p.toLowerCase.contains("unbounded following"),
      "an unbounded-following frame re-entered the plan:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin"), p.take(2000))
  }

  test("q_bm25: term filter map-side, stats broadcast, top-n via TakeOrderedAndProject") {
    val p = plan("q_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      "global top-n must not sort the full ranking:\n" + p.take(2000))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
    // the (N, avgdl) corpus stats ride one broadcast row (a cross join of
    // a 1-row side plans as BroadcastNestedLoopJoin — bounded, correct)
    assert(p.contains("BroadcastExchange"), p.take(2000))
  }

  test("q_ccnet_buckets: one exchange, rank+count windows share the sort, no joins") {
    val p = plan("q_ccnet_buckets")
    assert("\\+- Exchange".r.findAllIn(p).size == 1, p.take(2000))
    assert("\\+- Window".r.findAllIn(p).size == 2 &&
      "\\+- Sort".r.findAllIn(p).size == 1, p.take(2000))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("q_outlier_mad: per-key stat frames broadcast back; scans stay column-pruned") {
    val p = plan("q_outlier_mad")
    // two sequential aggregate passes are inherent to MAD (deviations
    // need the median first); each collapses to one row per key and
    // broadcasts — the input itself never shuffles or sort-merges
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(2000))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string,n_chars:bigint>"),
      "column pruning lost:\n" + p.take(2500))
  }

  test("q_bm25_indexed: probe prunes to query-term buckets; top-n never sorts the ranking") {
    val p = plan("q_bm25_indexed")
    // the index scan reads ONLY the query terms' bucket partitions plus
    // the stats partition — the corpus is never rescanned
    assert(p.contains("PartitionFilters: [__tb") && p.contains(",stats)"),
      "bucket partition pruning lost:\n" + p.take(2500))
    assert(p.contains("In(term, [hash,join,spark,window])"),
      "term pushdown lost:\n" + p.take(2500))
    // the df leg prunes to the term column alone
    assert(p.contains("ReadSchema: struct<term:string>"),
      "df-side column pruning lost:\n" + p.take(2500))
    assert(p.contains("TakeOrderedAndProject"),
      "global top-n must not sort the full ranking:\n" + p.take(2500))
    assert(!p.contains("SortMergeJoin"), p.take(2500))
  }

  test("q_bm25_wand: survivor scoring keeps bucket pruning, block filter, and top-n shape") {
    val p = plan("q_bm25_wand")
    // same bucket partition pruning as the plain probe
    assert(p.contains("PartitionFilters: [__tb") && p.contains(",stats)"),
      "bucket partition pruning lost:\n" + p.take(2500))
    assert(p.contains("In(term, [hash,join,spark,window])"),
      "term pushdown lost:\n" + p.take(2500))
    // the WAND block-range prune rides the posting scan as a filter on
    // the derived doc-block (floorDiv via pmod)
    assert(p.contains("pmod(doc_id"),
      "block-range prune filter lost:\n" + p.take(2500))
    assert(p.contains("TakeOrderedAndProject") && !p.contains("SortMergeJoin"),
      p.take(2500))
  }

  test("q_pii_mask: one map-side projection — no shuffle, no join, pruned scan") {
    val p = plan("q_pii_mask")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "PII masking must stay a map-side projection:\n" + p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "column pruning lost:\n" + p.take(2500))
  }

  test("q_url_canon: one map-side projection — no shuffle, no join, pruned scan") {
    val p = plan("q_url_canon")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "URL canonicalization must stay a map-side projection:\n" + p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,source:string>"),
      "column pruning lost:\n" + p.take(2500))
  }

  test("q_html_extract: the extraction regex chain is one map-side projection — no shuffle, no join, pruned scan") {
    val p = plan("q_html_extract")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "HTML extraction must stay a map-side projection:\n" + p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "column pruning lost:\n" + p.take(2500))
  }

  test("q_html_links: href explode + canonicalization stays map-side — no shuffle, no join") {
    val p = plan("q_html_links")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "link extraction must stay Scan -> Generate -> Project:\n" + p.take(2000))
    assert(p.contains("Generate"), p.take(2000))
  }

  test("q_curation_pipeline6: projections + URL-key aggregate + the shared token-count boundary") {
    val p = plan("q_curation_pipeline6")
    // mask/gate/encode/copies all fold into projections; the survivor
    // semi-join broadcasts at this SF (AQE re-plans it co-partitioned at
    // corpus scale — the measured, expected switch; SCALE.md r18). r18
    // adds the pinned doc_id boundary the in-plan mixture's totals and
    // sampled rows share (the old totals collect replayed URL-dedup →
    // mask → gate → BPE once more).
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(2500))
    assert(p.contains("REPARTITION_BY_COL"),
      "shared token-count boundary lost:\n" + p.take(2500))
    val f = finalPlan("q_curation_pipeline6")
    assert("ReusedExchange".r.findAllIn(f).size >= 1,
      "the shared boundary must dedupe at runtime:\n" + f.take(2500))
    // distinct runtime shuffles stay bounded: URL-key aggregate, the
    // pinned boundary, and the totals aggregate (plus AQE bookkeeping)
    assert(("ShuffleQueryStage \\d+".r.findAllIn(f).map(identity).toSet.size <= 4),
      "unexpected extra runtime shuffle:\n" + f.take(2500))
  }

  test("q_cluster_balanced: centroid assignment is map-side; the cap costs exactly ONE exchange (the per-cluster window)") {
    val p = plan("q_cluster_balanced")
    // centroids ride the plan as a literal array (bounded-collect
    // contract) — never a join side; the only shuffle is the
    // centroid_id window partitioning the per-cluster rank needs
    assert(!p.contains("Join"),
      "assignment must fold into a projection, not a join:\n" + p.take(2500))
    // the fixture's round-robin rebalance is test-data plumbing; the
    // OPERATOR may add only the one centroid_id hash exchange
    assert("""Arguments: hashpartitioning\(centroid_id""".r.findAllIn(p).size == 1
      && """Arguments: hashpartitioning""".r.findAllIn(p).size == 1,
      "expected exactly the one centroid_id window Exchange:\n" + p.take(2500))
  }

  test("q_cluster_diverse: prototype drop shares the one centroid_id exchange between its rank and count windows") {
    val p = plan("q_cluster_diverse")
    assert(!p.contains("Join"), p.take(2500))
    // row_number + count over the same partitioning must share ONE
    // centroid_id hash exchange — a second hash exchange means the
    // frames stopped sharing the partitioning (the round-robin node is
    // the fixture's test-data rebalance)
    assert("""Arguments: hashpartitioning\(centroid_id""".r.findAllIn(p).size == 1
      && """Arguments: hashpartitioning""".r.findAllIn(p).size == 1,
      "rank and count windows must share one shuffle:\n" + p.take(2500))
  }

  test("q_curation_pipeline7: LID + LM gates stay projections; the vector join broadcasts; the cap adds the ONE hash exchange") {
    val p = plan("q_curation_pipeline7")
    // both learned models ride the plan as reference objects — the only
    // join is survivors×embeddings, broadcast at this SF (AQE re-plans
    // co-partitioned at corpus scale)
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      p.take(2500))
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
    assert("""Arguments: hashpartitioning\(centroid_id""".r.findAllIn(p).size == 1
      && """Arguments: hashpartitioning""".r.findAllIn(p).size == 1,
      "expected exactly the cluster-cap window Exchange:\n" + p.take(2500))
  }

  test("q_quality_classifier: learned-model inference is one map-side projection — no shuffle, no join, pruned scan") {
    val p = plan("q_quality_classifier")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "classifier scoring must stay map-side (weights ride the plan as " +
        "a reference object, never a join side):\n" + p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "column pruning lost:\n" + p.take(2500))
  }

  test("q_lang_classifier: K-class LID is ONE map-side kernel pass — no shuffle, no join, pruned scan") {
    val p = plan("q_lang_classifier")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "multi-class scoring must stay map-side (the K×buckets weight " +
        "matrix rides the plan as a reference object):\n" + p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "column pruning lost:\n" + p.take(2500))
    // the fused array is consumed via its alias — exactly one kernel call
    assert("dsir_score_multi".r.findAllIn(p).size <= 2, // tree + detail line
      "the fused kernel must appear once, not re-inlined per consumer:\n" +
        p.take(2500))
  }

  test("q_bpe_tokens: the fused encode kernel is one map-side projection — no shuffle, no join, pruned scan") {
    val p = plan("q_bpe_tokens")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "BPE encode must stay a map-side projection (the model is a plan " +
        "reference object, never a join side):\n" + p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "column pruning lost:\n" + p.take(2500))
  }

  test("q_bpe_pack: BPE counts feed packing with exactly ONE exchange (the group shuffle the window needs)") {
    val p = plan("q_bpe_pack")
    // count the detail headers ("(n) Exchange") — the formatted explain
    // prints every node twice (tree line + detail section)
    assert("""\(\d+\) Exchange""".r.findAllIn(p).size == 1,
      "packing by model-true counts must add no shuffle beyond the " +
        "per-group window partitioning:\n" + p.take(2500))
    assert(!p.contains("Join"), p.take(2000))
  }

  test("q_bm25_wand_batch: survivors broadcast into the one scoring pass — the postings fan-out never shuffles to meet them") {
    val p = plan("q_bm25_wand_batch")
    // the r16 in-plan survivor join planned as a SHUFFLE of the full
    // postings x queries fan-out (measured 1.7x the plain probe's
    // shuffle records at Q=128 — SCALE.md "Batch-WAND crossover"); the
    // r17 shape collects the sidecar-bounded survivor pairs and
    // broadcasts them, so NO sort-merge or shuffled-hash join may
    // appear anywhere in the probe
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      "the survivor filter must be broadcast, not a shuffle join:\n" +
        p.take(2500))
    // dfreq + query pairs + survivor pairs all ride broadcasts
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3, p.take(2500))
    // bucket partition pruning and term pushdown survive on the scan
    assert(p.contains("PartitionFilters: [__tb"),
      "bucket partition pruning lost:\n" + p.take(2500))
    // the only shuffles left: the per-(query, doc) aggregate and the
    // per-query rank window
    assert("\\+- Exchange".r.findAllIn(p).size <= 2,
      "an extra shuffle entered the scoring pass:\n" + p.take(2500))
  }

  test("q_ann_ivfpq: the rerank scan reads only shortlist ids, top-k never sorts the corpus") {
    val p = plan("q_ann_ivfpq")
    // the exact-cosine rerank fetches ONLY the ADC shortlist's ids — the
    // id IN (...) filter is pushed into the corpus scan
    assert(p.contains("In(vec_id"),
      "shortlist id pushdown lost:\n" + p.take(2500))
    assert(p.contains("TakeOrderedAndProject"),
      "top-k must not sort the corpus:\n" + p.take(2500))
    assert(!p.contains("Join"), "the rerank is a filtered scan, not a join:\n" +
      p.take(2500))
  }

  test("q_ann_ivfpq_batch: shortlist and query vectors broadcast into the rerank") {
    val p = plan("q_ann_ivfpq_batch")
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2,
      "shortlist + query-vector joins must broadcast:\n" + p.take(2500))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      p.take(2500))
    // per-query ranking is a bounded window, not a global sort of the corpus
    assert(p.contains("Window"), p.take(2500))
  }

  test("q_dsir_weights: scoring is ONE map-side codegen'd projection, no Exchange") {
    val p = plan("q_dsir_weights")
    assert(!p.contains("Exchange"),
      "DSIR scoring must not shuffle — the model is a plan reference:\n" +
        p.take(1500))
    assert(p.contains("codegen id"),
      "the dsir_score kernel must stay inside codegen:\n" + p.take(1500))
    assert(!p.contains("Generate"),
      "scoring must not explode grams (that is the fit pass only):\n" +
        p.take(1500))
  }

  test("q_dsir_sample: one TakeOrdered over the scored scan; only the k-row rank window repartitions") {
    val p = plan("q_dsir_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "the draw must be a TakeOrdered, not a global sort:\n" + p.take(2000))
    // the single allowed Exchange is the SinglePartition one feeding the
    // rank window over the k already-taken rows
    val exchanges = "\\+- Exchange".r.findAllIn(p).size
    assert(exchanges <= 1 && (exchanges == 0 || p.contains("SinglePartition")),
      "only the bounded rank window may repartition:\n" + p.take(2000))
  }

  test("q_range_join: keyless range join plans as a bucket EQUI-join, never nested-loop") {
    val p = plan("q_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range predicate must ride the bucket equi-join:\n" + p.take(2000))
    // interval side explodes to buckets (Generate) and the join stays a
    // broadcast hash join; the point side pre-aggregates per distinct
    // ship date (aggregate pushdown — the pair set never materializes),
    // with the partial half map-side before its exchange
    assert(p.contains("Generate") && p.contains("BroadcastHashJoin"), p.take(2000))
    assert(p.contains("partial_count"),
      "point-side partial aggregation lost:\n" + p.take(2000))
    assert(p.contains("struct<l_quantity:double,l_shipdate:timestamp"),
      "lineitem scan must be pruned to 2 columns:\n" + p.take(2000))
  }

  test("q_lm_score: LM scoring is one map-side projection — the count table rides the plan, never a join side") {
    val p = plan("q_lm_score")
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "ngram_lm_score must stay Scan -> Project (the CCNet deploy shape " +
        "— model ships to workers, corpus never shuffles):\n" + p.take(2000))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      "column pruning lost:\n" + p.take(2500))
  }

  test("q_lm_ppl_buckets: scoring stays map-side; the ONLY exchange is the per-language percentile window") {
    val p = plan("q_lm_ppl_buckets")
    assert(!p.contains("Join"), p.take(2500))
    assert("""\(\d+\) Exchange\n""".r.findAllIn(p).size == 1 &&
      p.contains("Window"),
      "expected exactly the one lang-partition Window exchange:\n" +
        p.take(2500))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Md5Prefix32

/** Deterministic sampling / split assignment for training-data curation —
  * beyond the reference's operator set (SURVEY COVERAGE "training-data
  * pipeline operators"); the reference has no sampling surface at all.
  *
  * All sampling here is HASH-based, never `rand()`:
  *  - reproducible across runs, retries, and engines (the DuckDB oracle
  *    computes the same md5-derived buckets bit-for-bit);
  *  - stable under repartitioning — a row's fate depends only on its id, so
  *    speculative re-execution or AQE re-planning cannot change the sample
  *    (Spark's `df.sample` is seed + partition-layout dependent);
  *  - embarrassingly parallel: a filter on a codegen'd expression, no
  *    shuffle, fully pushdown-transparent for other predicates.
  *
  * At 100 TB: sampling and split assignment are pure map-side narrow ops;
  * `perKeyCap` is the only shuffling member (one hash partition by key).
  */
object Sampling {

  /** Hash bucket in [0, 1000): first 8 hex chars of md5(id) mod 1000 via the
    * native [[Md5Prefix32]] expression (codegen'd, no UDF).
    */
  def bucket(id: Column): Column =
    pmod(Md5Prefix32.md5Prefix32(id.cast("string")), lit(1000L))

  /** Keep ~`perMille`/1000 of rows, deterministically by id. */
  def hashSample(df: DataFrame, id: Column, perMille: Int): DataFrame =
    df.where(bucket(id) < perMille)

  /** Stratified sampling: per-stratum keep rates (per mille), e.g.
    * down-sample dominant classes while keeping rare ones whole.
    */
  def stratified(df: DataFrame, strata: Column, id: Column,
      rates: Map[String, Int], defaultPerMille: Int): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPerMille)) { case (acc, (k, r)) =>
      when(strata === k, lit(r)).otherwise(acc)
    }
    df.where(bucket(id) < rate)
  }

  /** Train/val/test split assignment: contiguous hash ranges sized by
    * `perMilleBounds` (cumulative upper bounds, last bucket catches the
    * rest). A row's split never changes as the corpus grows.
    */
  def assignSplit(df: DataFrame, id: Column,
      perMilleBounds: Seq[(String, Int)]): DataFrame = {
    val b = bucket(id)
    val expr = perMilleBounds.init.foldRight(
      lit(perMilleBounds.last._1): Column) { case ((name, bound), acc) =>
      when(b < bound, lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Cap rows per key at `n`, deterministically (ordered by hash-of-id then
    * id): bounds any key's contribution — e.g. at most N documents per
    * domain — regardless of skew. One shuffle on the key.
    */
  def perKeyCap(df: DataFrame, key: Column, id: Column, n: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(key).orderBy(bucket(id), id)
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") <= n)
      .drop("__rn")
  }

  // ---- embedding-cluster-balanced selection ----

  private def requireClusterCols(df: DataFrame, op: String): Unit =
    Seq("centroid_id", "cosine", "__rn", "__n").foreach { c =>
      require(!df.columns.contains(c),
        s"Sampling.$op: input already has a '$c' column; rename it first " +
          "(the cluster assignment appends centroid_id/cosine)")
    }

  /** Cluster-balanced cap (the DataComp-style embedding-space balance:
    * k-means clusters over an embedding column, then at most `cap` docs
    * per CLUSTER) — flattens head clusters the way [[perKeyCap]] flattens
    * head domains, but in semantic space: near-duplicate-rich clusters
    * stop dominating the mixture. Assignment is [[Similarity.ivfAssign]]
    * (centroids ride the plan as one literal array — the bounded-collect
    * centroid contract); the cap is the deterministic hash-rank rule, so
    * the selection is reproducible and oracle-mirrorable. Output keeps
    * `centroid_id` and `cosine` for downstream audit.
    *
    * At 100 TB: one map-side assignment pass + ONE shuffle on
    * centroid_id (the same per-key ranking cost as any window); k is
    * thousands at most, so the ranking state per partition is bounded by
    * the cap, never the corpus.
    */
  def clusterBalancedCap(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])], cap: Int): DataFrame = {
    require(cap >= 1, s"Sampling.clusterBalancedCap: cap must be >= 1, got $cap")
    requireClusterCols(df, "clusterBalancedCap")
    perKeyCap(Similarity.ivfAssign(df, idCol, vecCol, centroids),
      col("centroid_id"), col(idCol), cap)
  }

  /** D4-style prototype drop (Tirumala et al. 2023: after SemDeDup,
    * DROP the most PROTOTYPICAL documents — the ones nearest their
    * cluster centroid — and keep the diverse tail; the paper's
    * diversification half): within each cluster, rank by cosine-to-
    * centroid descending and drop the top `dropPpm`/10⁶ fraction.
    * The drop count per cluster is the exact integer
    * `(n·dropPpm) div 10⁶`, so both engines agree with no float
    * thresholds; ties (identical cosines) break by id.
    *
    * Same scale shape as [[clusterBalancedCap]]: map-side assignment +
    * one centroid_id shuffle for the window pair (rank + count share
    * the partitioning).
    */
  def clusterPrototypeDrop(df: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])], dropPpm: Long): DataFrame = {
    require(dropPpm >= 0 && dropPpm < 1000000L,
      s"Sampling.clusterPrototypeDrop: dropPpm must be in [0, 1e6), got " +
        s"$dropPpm (1e6 would drop every cluster whole)")
    requireClusterCols(df, "clusterPrototypeDrop")
    val assigned = Similarity.ivfAssign(df, idCol, vecCol, centroids)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("centroid_id"))
    assigned
      .withColumn("__rn", row_number().over(
        w.orderBy(col("cosine").desc, col(idCol))).cast("long"))
      .withColumn("__n", count(lit(1)).over(w))
      .where(col("__rn") > expr(s"(__n * ${dropPpm}L) div 1000000L"))
      .drop("__rn", "__n")
  }

  /** Fine hash bucket in [0, 1e6): the mixture sampler needs ppm resolution
    * — at a 10^9-row domain a per-mille grid quantizes the kept volume by
    * ±0.05%, a ppm grid by ±0.00005%.
    */
  def bucketPpm(id: Column): Column =
    pmod(Md5Prefix32.md5Prefix32(id.cast("string")), lit(1000000L))

  /** Domain-mixture sampling to a token budget — the "data mixture" step of
    * a training-data pipeline (weights per source/domain, total token
    * budget; cf. the published GPT-3 / Pile / LLaMA mixture tables, where
    * high-quality domains are sampled for MULTIPLE epochs and bulk domains
    * for a fraction of one).
    *
    * For each `(domain, weightPpm)` entry the target volume is
    * `budgetTokens * weightPpm / 1e6` tokens. With `total` = the domain's
    * available tokens, every row of that domain receives
    * `copies = target / total` full epochs (integer), plus one more with
    * probability `(target mod total) / total` — decided DETERMINISTICALLY
    * by the row's hash bucket, so the sampled mixture is reproducible
    * bit-for-bit (and expressible in the DuckDB oracle). Rows with zero
    * copies are dropped; domains absent from `weightsPpm` are dropped
    * entirely. All arithmetic is integer (ppm grid) — no float rate can
    * drift between engines.
    *
    * Output: the id, domain and token-count columns plus `copies`
    * (`>= 1`) — the caller materializes repeats downstream (e.g.
    * `explode(sequence(1, copies))` right before sequence packing) so the
    * engine never shuffles duplicated rows around.
    *
    * Distributed shape: ONE small aggregate (per-domain token totals —
    * bounded by the number of domains, the same bounded-collect contract as
    * k-means centroids) to the driver, then a pure map-side filter; the
    * corpus itself never shuffles.
    */
  def mixtureByTokenBudget(df: DataFrame, domainCol: Column, idCol: Column,
      tokenCountCol: Column, weightsPpm: Seq[(String, Long)],
      budgetTokens: Long,
      precomputedTotals: Option[Map[String, Long]] = None): DataFrame = {
    require(weightsPpm.nonEmpty, "mixtureByTokenBudget: no domain weights")
    require(weightsPpm.forall(_._2 > 0),
      "mixtureByTokenBudget: weights must be positive ppm values")
    require(weightsPpm.map(_._1).distinct.size == weightsPpm.size,
      "mixtureByTokenBudget: duplicate domain in weightsPpm — the rule " +
        "chain would silently keep only the last entry")
    require(budgetTokens > 0, "mixtureByTokenBudget: budgetTokens must be > 0")
    Md5Prefix32.register(df.sparkSession) // idempotent; bare sessions lack it
    // pass [[domainTokenTotals]] output when the totals already exist
    // (e.g. they derived the temperature weights) — one corpus aggregate,
    // not one per consumer
    val totals = precomputedTotals.getOrElse(
      domainTokenTotals(df, domainCol, tokenCountCol).toMap)
    val rules = weightsPpm.flatMap { case (dom, ppm) =>
      totals.get(dom).filter(_ > 0).map { total =>
        // BigInt: budget×ppm exceeds Long at trillion-token budgets, and a
        // silent Long wrap would drop the heaviest domain with no error
        // (runs once per domain on the driver — cost is nil). target and
        // remPpm both fit a Long afterwards: target <= budgetTokens,
        // remPpm < 1e6
        val target = BigInt(budgetTokens) * ppm / 1000000
        (dom, (target / total).toLong,
          (target % total * 1000000 / total).toLong)
      }
    }
    require(rules.nonEmpty,
      s"mixtureByTokenBudget: none of the weighted domains " +
        s"(${weightsPpm.map(_._1).mkString(", ")}) have rows in the input")
    val copiesBase = rules.foldLeft(lit(null).cast("long")) {
      case (acc, (dom, copies, _)) => when(domainCol === dom, copies).otherwise(acc)
    }
    val remPpm = rules.foldLeft(lit(null).cast("long")) {
      case (acc, (dom, _, rem)) => when(domainCol === dom, rem).otherwise(acc)
    }
    val copies = copiesBase +
      when(bucketPpm(idCol) < remPpm, 1L).otherwise(0L)
    df.where(domainCol.isin(rules.map(_._1): _*))
      .withColumn("copies", copies)
      .where(col("copies") > 0)
  }

  /** Materialize [[mixtureByTokenBudget]]'s `copies` column as one row per
    * epoch copy: adds `epoch` in `[0, copies)` via a map-side
    * `explode(sequence(...))` — the documented place to fan out repeats,
    * right before sequence packing, so duplicated rows never ride through
    * earlier shuffles. Rows with `copies < 1` are dropped (the sampler
    * never emits them; defensive against hand-built inputs, since a
    * descending `sequence(0, -1)` would otherwise fabricate epochs).
    */
  def explodeCopies(df: DataFrame, copiesCol: Column,
      epochName: String = "epoch"): DataFrame =
    df.where(copiesCol >= 1)
      .withColumn(epochName,
        explode(sequence(lit(0L), copiesCol.cast("long") - 1L)))

  /** Deterministic global shuffle + sharding — the last-mile permutation
    * before training: every row gets a `shard` in [0, nShards) and a
    * 1-based within-shard position `shard_pos`, both driven by the
    * md5-derived order key `hash(id ++ ":" ++ seed)` (ties broken by id).
    * Varying `seed` yields an independent permutation per epoch without
    * touching the data.
    *
    * The plan is the shape that survives 100 TB: ONE hash shuffle on
    * `shard` plus a per-shard LOCAL sort for the position window — never a
    * global sort, whose range partitioner needs a sampling pass and makes
    * the write a barrier on the skew of one key range. Writing
    * `.repartition(nShards, col("shard")).sortWithinPartitions("shard_pos")`
    * then gives each training reader one sequential shard file in
    * permutation order.
    *
    * A row's ORDER KEY is a pure function of (id, seed), so it never
    * changes as the corpus grows — but `shard_pos` is dense within the
    * shard and therefore corpus-dependent by design (a permutation of N
    * rows must be). Ids must be distinct.
    */
  def shuffleShard(df: DataFrame, id: Column, nShards: Int,
      seed: String = ""): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    Md5Prefix32.register(df.sparkSession) // idempotent; bare sessions lack it
    Seq("shard", "shard_pos", "__ok").foreach { c =>
      require(!df.columns.contains(c),
        s"input already has a $c column; rename it before shuffleShard")
    }
    val key = Md5Prefix32.md5Prefix32(
      concat(id.cast("string"), lit(":" + seed)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__ok"), id)
    df.withColumn("__ok", key)
      .withColumn("shard", pmod(col("__ok"), lit(nShards.toLong)))
      .withColumn("shard_pos", row_number().over(w))
      .drop("__ok")
  }

  // ---- in-plan mixture (no driver collect) -------------------------------
  // [[mixtureByTokenBudget]] collects per-domain totals to the driver and
  // bakes the copies rules into literals — which means the totals pass
  // EXECUTES THE WHOLE UPSTREAM SUBTREE once before the final plan runs it
  // again. Composed after an expensive derivation (the curation pipelines)
  // that doubles the query. The in-plan form below computes totals, rules,
  // and the per-row copies arithmetic INSIDE the returned plan: the rules
  // frame (bounded by #domains) broadcast-joins back, the driver never
  // touches data, and the query is ONE action end-to-end. All arithmetic
  // mirrors the driver form on an exact integer/decimal grid (DECIMAL(38,0)
  // where budget×ppm or rem×1e6 could overflow a Long), so the output rows
  // are bit-identical to the collect form — the same values the DuckDB
  // oracle CTEs (`SamplingQueries.mixtureCtesWith`) compute.
  //
  // Difference worth knowing: the collect form fails loudly when NO
  // weighted domain has rows; the in-plan form returns an empty frame
  // (there is no driver-side point to check without adding an action).

  /** Per-domain token totals as a tiny aggregated FRAME (`__dom`,
    * `__total`) — the in-plan analog of [[domainTokenTotals]] (same null
    * and `total > 0` drops).
    */
  def domainTotalsDf(df: DataFrame, domainCol: Column,
      tokenCountCol: Column): DataFrame =
    df.groupBy(domainCol.as("__dom"))
      .agg(sum(tokenCountCol.cast("long")).as("__total"))
      .where(col("__dom").isNotNull && col("__total") > 0)

  /** (budget, ppm, total) → (copies, rem_ppm) on the exact integer grid of
    * [[mixtureByTokenBudget]]'s driver arithmetic: `target = budget·ppm/1e6`
    * and `rem_ppm = (target mod total)·1e6/total`, both via DECIMAL(38,0)
    * intermediates (budget×ppm and rem×1e6 overflow a Long at
    * trillion-token budgets / petabyte domains; `div` floors like BigInt
    * division on the non-negative operands here). Input: a frame with
    * `__dom`, `__total`, `__ppm`; output `__dom`, `__copies`, `__rem`.
    */
  private def mixtureRulesFrame(weighted: DataFrame,
      budgetTokens: Long): DataFrame =
    weighted
      .withColumn("__target",
        expr(s"(CAST($budgetTokens AS DECIMAL(38,0)) * __ppm) div 1000000"))
      .withColumn("__copies", expr("__target div __total"))
      .withColumn("__rem",
        expr("(CAST(__target % __total AS DECIMAL(38,0)) * 1000000) div __total"))
      .select(col("__dom"), col("__copies"), col("__rem"))

  /** Join the rules frame back and materialize `copies` (same row rule as
    * [[mixtureByTokenBudget]]: base copies + 1 when the row's ppm bucket
    * falls under the domain's remainder rate; rows at 0 drop). The rules
    * side is bounded by #domains — broadcast.
    */
  private def applyMixtureRules(df: DataFrame, domainCol: Column,
      idCol: Column, rules: DataFrame): DataFrame =
    df.join(broadcast(rules), domainCol === col("__dom"))
      .withColumn("copies",
        col("__copies") + when(bucketPpm(idCol) < col("__rem"), 1L).otherwise(0L))
      .where(col("copies") > 0)
      .drop("__dom", "__copies", "__rem")

  private def requireMixtureScratchFree(df: DataFrame, op: String): Unit =
    Seq("__dom", "__total", "__ppm", "__target", "__copies", "__rem")
      .foreach { c =>
        require(!df.columns.contains(c),
          s"Sampling.$op: input already has a '$c' column; rename it first " +
            "(the in-plan mixture uses it as scratch)")
      }

  /** [[mixtureByTokenBudget]] with the totals/rules computed IN-PLAN (see
    * the section comment). The static `weightsPpm.isin` filter is still
    * applied directly so the domain pruning keeps pushing into the scan.
    */
  def mixtureByTokenBudgetInPlan(df: DataFrame, domainCol: Column,
      idCol: Column, tokenCountCol: Column, weightsPpm: Seq[(String, Long)],
      budgetTokens: Long): DataFrame = {
    require(weightsPpm.nonEmpty, "mixtureByTokenBudgetInPlan: no domain weights")
    require(weightsPpm.forall(_._2 > 0),
      "mixtureByTokenBudgetInPlan: weights must be positive ppm values")
    require(weightsPpm.map(_._1).distinct.size == weightsPpm.size,
      "mixtureByTokenBudgetInPlan: duplicate domain in weightsPpm")
    require(budgetTokens > 0, "mixtureByTokenBudgetInPlan: budgetTokens must be > 0")
    requireMixtureScratchFree(df, "mixtureByTokenBudgetInPlan")
    Md5Prefix32.register(df.sparkSession)
    val spark = df.sparkSession
    import spark.implicits._
    val w = weightsPpm.toDF("__dom", "__ppm")
    val kept = df.where(domainCol.isin(weightsPpm.map(_._1): _*))
    val rules = mixtureRulesFrame(
      domainTotalsDf(kept, domainCol, tokenCountCol).join(w, "__dom"),
      budgetTokens)
    applyMixtureRules(kept, domainCol, idCol, rules)
  }

  /** α = 1/2 temperature weights over a [[domainTotalsDf]] frame, in-plan:
    * the exact-integer isqrt (float sqrt then the two driver-mirrored
    * corrections — multiply form down, division form up, matching
    * [[isqrt]]) and largest-remainder apportionment (window over the
    * #domains-sized frame; remainder DESC, domain name tiebreak). Output:
    * `__dom`, `__ppm` (> 0 rows only) — bit-identical to
    * [[sqrtTemperatureWeightsPpm]] over the collected totals.
    */
  private[operators] def sqrtTemperatureWeightsDf(tot: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wAll = Window.partitionBy() // #domains rows — single tiny partition
    tot
      .withColumn("__g", floor(sqrt(col("__total").cast("double"))).cast("long"))
      .withColumn("__g1",
        when(col("__g") > 0 && col("__g") * col("__g") > col("__total"),
          col("__g") - 1).otherwise(col("__g")))
      .withColumn("__wt",
        when(expr("__g1 + 1 <= (__total div (__g1 + 1))"), col("__g1") + 1)
          .otherwise(col("__g1")))
      .withColumn("__s", sum(col("__wt")).over(wAll))
      .withColumn("__base", expr("(__wt * 1000000) div __s"))
      .withColumn("__remn", expr("(__wt * 1000000) % __s"))
      .withColumn("__extras", lit(1000000L) - sum(col("__base")).over(wAll))
      .withColumn("__rk", row_number().over(
        wAll.orderBy(col("__remn").desc, col("__dom"))))
      .withColumn("__ppm",
        col("__base") + when(col("__rk") <= col("__extras"), 1L).otherwise(0L))
      .where(col("__ppm") > 0)
      .select(col("__dom"), col("__total"), col("__ppm"))
  }

  /** The derive-sqrt-temperature-weights → mixture chain fully in-plan:
    * ONE logical consumer of `df` for the totals (the weights and rules
    * share the same tiny aggregate — its partial-aggregate exchange
    * dedupes under exchange reuse) and one for the sampled rows. The
    * in-plan replacement for the
    * `domainTokenTotals` → `sqrtTemperatureWeightsPpm` →
    * `mixtureByTokenBudget(precomputedTotals)` driver chain.
    */
  def sqrtTemperatureMixtureInPlan(df: DataFrame, domainCol: Column,
      idCol: Column, tokenCountCol: Column, budgetTokens: Long): DataFrame = {
    require(budgetTokens > 0, "sqrtTemperatureMixtureInPlan: budgetTokens must be > 0")
    requireMixtureScratchFree(df, "sqrtTemperatureMixtureInPlan")
    Md5Prefix32.register(df.sparkSession)
    val rules = mixtureRulesFrame(
      sqrtTemperatureWeightsDf(domainTotalsDf(df, domainCol, tokenCountCol)),
      budgetTokens)
    applyMixtureRules(df, domainCol, idCol, rules)
  }

  // ---- temperature-based mixture weights --------------------------------
  // The published multilingual/multi-domain sampling rule (mBERT, XLM-R,
  // mT5): sample domain d with p_d ∝ n_d^α, α ∈ (0, 1] — α = 1 is
  // proportional (big domains dominate), α → 0 approaches uniform
  // (low-resource domains up-weighted). The weights feed
  // [[mixtureByTokenBudget]] as its ppm table.

  /** Per-domain token totals — ONE bounded aggregate to the driver (the
    * k-means-centroids contract). Null domains and null/empty totals drop,
    * matching the SQL mirror's `JOIN ... USING (source)` + `total > 0`.
    * Compute once and feed BOTH the weights helper and
    * [[mixtureByTokenBudget]]'s `precomputedTotals` so the corpus is
    * scanned a single time.
    */
  def domainTokenTotals(df: DataFrame, domainCol: Column,
      tokenCountCol: Column): Seq[(String, Long)] =
    df.groupBy(domainCol.as("__dom"))
      .agg(sum(tokenCountCol.cast("long")).as("__total"))
      .collect() // bounded by #domains — the k-means-centroids contract
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => r.getString(0) -> r.getLong(1))
      .filter(_._2 > 0).sortBy(_._1).toSeq

  /** Largest-remainder apportionment of integer weights onto the ppm grid:
    * Σ ppm = exactly 1e6, remainder units to the largest fractional parts
    * (ties → domain name order) — deterministic, no float in sight.
    */
  private def largestRemainderPpm(weights: Seq[(String, BigInt)])
      : Seq[(String, Long)] = {
    val total = weights.map(_._2).sum
    require(total > 0, "temperature weights: all domains empty")
    val based = weights.map { case (d, w) =>
      val scaled = w * 1000000
      (d, (scaled / total).toLong, (scaled % total))
    }
    val extras = 1000000L - based.map(_._2).sum
    val bump = based.sortBy { case (d, _, rem) => (-rem, d) }
      .take(extras.toInt).map(_._1).toSet
    based.map { case (d, base, _) =>
      d -> (base + (if (bump(d)) 1L else 0L))
    }.filter(_._2 > 0)
  }

  /** Exact integer square root (clamped — float sqrt can be off by one at
    * perfect-square boundaries, and a ±1 weight flip would desync the
    * oracle).
    */
  private[operators] def isqrt(n: Long): Long = {
    require(n >= 0, s"isqrt of $n")
    val g = math.sqrt(n.toDouble).toLong
    val g1 = if (g > 0 && g * g > n) g - 1 else g
    // division form: (g1+1)² would overflow Long near Long.MaxValue and
    // wrap negative, silently returning an off-by-one "exact" root
    if (g1 + 1 <= n / (g1 + 1)) g1 + 1 else g1
  }

  /** Temperature weights at α = 1/2 in EXACT integer arithmetic
    * (`isqrt(total_d)` + largest-remainder ppm): bit-reproducible across
    * engines, which is what lets `q_sample_temperature` hash-match a
    * DuckDB oracle. The α people tune lives in
    * [[temperatureWeightsPpm]]; this is the locked, auditable instance.
    */
  def sqrtTemperatureWeightsPpm(df: DataFrame, domainCol: Column,
      tokenCountCol: Column): Seq[(String, Long)] =
    sqrtTemperatureWeightsPpm(domainTokenTotals(df, domainCol, tokenCountCol))

  /** Pure form over precomputed [[domainTokenTotals]] — use this when the
    * totals also feed [[mixtureByTokenBudget]], so the corpus is
    * aggregated once, not once per consumer.
    */
  def sqrtTemperatureWeightsPpm(totals: Seq[(String, Long)]): Seq[(String, Long)] =
    largestRemainderPpm(totals.map { case (d, t) => d -> BigInt(isqrt(t)) })

  /** General-α temperature weights (driver-side `math.pow` over a handful
    * of per-domain totals; the float is confined to the WEIGHT TABLE and
    * immediately frozen onto an integer grid — apportionment then shares
    * [[largestRemainderPpm]] with the exact path, so Σppm = 1e6 holds by
    * construction). Use [[sqrtTemperatureWeightsPpm]] when cross-engine
    * exactness matters.
    */
  def temperatureWeightsPpm(df: DataFrame, domainCol: Column,
      tokenCountCol: Column, alpha: Double): Seq[(String, Long)] = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0, 1], got $alpha")
    largestRemainderPpm(domainTokenTotals(df, domainCol, tokenCountCol)
      .map { case (d, t) =>
        d -> BigDecimal(math.pow(t.toDouble, alpha) * 1e9).toBigInt
      })
  }
}

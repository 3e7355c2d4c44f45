package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{NgramLmKernel, NgramLmScore}

/** N-gram language model with stupid backoff (Brants et al. EMNLP'07) —
  * the LEARNED fluency scorer the CCNet pipeline (Wenzek et al. 2020)
  * runs over every crawl document: train on a clean reference corpus,
  * score everything by perplexity, bucket head/middle/tail per language.
  * The engine already has the integer-exact corpus-statistic analog
  * ([[QualityFilters.bigramRarity]]) and the percentile machinery
  * ([[QualityFilters.percentileBuckets]]); this adds the actual LM, so
  * the composed stage is CCNet as published, not an approximation.
  *
  * Stupid backoff is chosen DELIBERATELY over Kneser-Ney: it is the
  * smoothing Brants et al. designed for distributed corpus-scale
  * training — the model is nothing but raw gram counts (no discount
  * redistribution pass, no continuation counts), so [[fit]] is ONE
  * distributed explode+aggregate and the quality at scale is the
  * paper's headline result. Scoring rule and integer micro-unit parity
  * story live on [[graft.functions.NgramLmKernel]].
  *
  * Spark-first anatomy, sized for 100 TB:
  *  - [[fit]]: tokens derive once per row, all orders 1..n explode as
  *    ONE flattened array → one map-side-combined count aggregate, tail
  *    pruned by `minCount` BEFORE the driver collect, which is LOUDLY
  *    capped by `maxEntries`. Uniform `minCount` across orders keeps
  *    the table prefix-closed (a context is a prefix of its gram, and
  *    prefix count ≥ gram count), which the backoff loop relies on.
  *    Gram order is implicit in the key (tokens never contain spaces —
  *    every [[Tokenizer]] rule splits them out), so the model is one
  *    string→count table plus the corpus token total.
  *  - Scoring is ONE codegen'd map-side projection; the count table
  *    rides the plan as a reference object. This is exactly how CCNet
  *    deploys KenLM — the model artifact ships to every worker; the
  *    corpus never shuffles. Fit the model on a bounded REFERENCE
  *    corpus (CCNet uses Wikipedia), not the 100 TB crawl itself —
  *    that is what keeps the table collectable; `maxEntries` is the
  *    loud guard, and the [[Dsir.fitSampled]] hash-sample pattern
  *    composes upstream if the reference corpus needs thinning.
  */
object NgramLm {

  /** A fitted model: pruned gram→count table (orders 1..n mixed; order
    * = spaces+1), the corpus token total (the order-1 denominator,
    * UNpruned so OOV mass stays honest), and the feature rule that
    * training used (tokenizer tag + n — scoring MUST split text the way
    * training did, the [[Bpe.Model]] rule).
    */
  final case class Model(tokenizerTag: String, n: Int, totalTokens: Long,
      grams: Array[(String, Long)]) {
    require(n >= 1 && n <= 8, s"NgramLm.Model: order must be in [1, 8], got $n")
    require(totalTokens > 0,
      s"NgramLm.Model: totalTokens must be > 0, got $totalTokens — a model " +
        "fitted on an empty corpus scores nothing")
    grams.foreach { case (g, c) =>
      require(g.nonEmpty && c > 0,
        s"NgramLm.Model: malformed entry ('$g', $c)")
    }

    /** Executable form (one plan reference object; built once). The
      * [[graft.functions.LmTable]] holder keeps expression equals/
      * hashCode identity-based — a raw HashMap field would make Catalyst
      * planning traverse the whole model per comparison.
      */
    @transient lazy val table: graft.functions.LmTable = {
      val m = new java.util.HashMap[String, java.lang.Long](grams.length * 2)
      grams.foreach { case (g, c) =>
        val prev = m.put(g, java.lang.Long.valueOf(c))
        require(prev == null,
          s"NgramLm.Model: duplicate gram '$g' — counts would be ambiguous")
      }
      new graft.functions.LmTable(m)
    }
  }

  /** Train on a reference corpus: ONE distributed gram-count aggregate
    * over all orders 1..n (tokens derive once per row; the per-order
    * gram arrays flatten into a single explode), `minCount` prunes the
    * tail map-side-aggregated BEFORE the loudly-capped driver collect.
    *
    * The unpruned token total rides the SAME action (r18): each token
    * also emits one SENTINEL gram (the empty string — unreachable by any
    * real gram, since tokens are non-empty and n-grams space-join them),
    * so the sentinel's count row IS `sum(size(tokens))` and the single
    * CollectLimit action returns model and total together. The old shape
    * ran a second full tokenize pass over the corpus just for the total;
    * a union-of-two-aggregates fusion was tried first and measured
    * CPU-NEGATIVE (the in-branch limit plans a single-partition
    * GlobalLimit instead of fusing into CollectLimit).
    */
  def fit(docs: DataFrame, textCol: String, n: Int,
      tokenizer: Tokenizer = Tokenizer.Ascii,
      minCount: Long = 2L, maxEntries: Int = 1 << 22): Model = {
    require(n >= 1 && n <= 8, s"NgramLm.fit: order must be in [1, 8], got $n")
    require(minCount >= 1, s"NgramLm.fit: minCount must be >= 1, got $minCount")
    require(maxEntries > 0, s"NgramLm.fit: maxEntries must be > 0")
    val toks = tokenizer.column(col(textCol))
    val allGrams = concat(
      flatten(array((1 to n).map(o =>
        graft.queries.TextQueries.ngramsOfTokens(toks, o)): _*)),
      array_repeat(lit(""), size(toks))) // sentinel: one "" per token
    val rows = docs
      .select(explode(allGrams).as("__g"))
      .groupBy(col("__g")).agg(count(lit(1)).as("__c"))
      // the sentinel row must survive even when minCount would prune it
      .filter(col("__c") >= minCount || col("__g") === "")
      .limit(maxEntries + 2) // grams cap + the sentinel row
      .collect()
    val (totRows, gramRows) = rows.partition(_.getString(0).isEmpty)
    require(gramRows.length <= maxEntries,
      s"NgramLm.fit: pruned gram table exceeds maxEntries=$maxEntries — " +
        "raise minCount (prune harder), lower n, fit on a thinner " +
        "reference corpus, or raise maxEntries (driver memory permitting)")
    val total = totRows.headOption.map(_.getLong(1)).getOrElse(0L)
    require(total > 0,
      "NgramLm.fit: reference corpus has zero tokens — nothing to model")
    Model(tokenizer.tag, n, total,
      gramRows.map(r => (r.getString(0), r.getLong(1))))
  }

  /** Σ log-probability of `text` under `model`, integer micro-units,
    * always ≤ 0 (zero tokens → 0) — one codegen'd map-side projection.
    */
  def logprob(text: Column, model: Model): Column =
    NgramLmScore.ngramLmScore(text, model.tokenizerTag, model.n,
      model.table, model.totalTokens)

  /** [[logprob]] as a DataFrame stage with the fresh-column guard. */
  def score(df: DataFrame, textCol: String, model: Model,
      scoreCol: String = "lm_logprob_q"): DataFrame = {
    require(!df.columns.contains(scoreCol),
      s"NgramLm.score: input already has a '$scoreCol' column; rename it first")
    // NULL text scores 0, same as the empty doc (zero positions, empty
    // sum) — the kernel expression is null-preserving, so without the
    // coalesce a nullable corpus column would diverge from the DuckDB
    // mirror (whose final CTE coalesces missing sums to 0) and from the
    // documented "empty doc scores 0" contract (the Dsir.score rule)
    df.withColumn(scoreCol,
      coalesce(logprob(col(textCol), model), lit(0L)))
  }

  /** [[score]] plus the per-token negative-log-likelihood column the
    * CCNet buckets rank on: `nll_per_tok_q = (−Σ logprob) div tokens`
    * (integer division of non-negatives — both engines floor), NULL for
    * zero-token documents (they belong to no perplexity distribution —
    * the [[QualityFilters.percentileBuckets]] NULL contract). Perplexity
    * is exp(nll/10⁶) — monotone, so ranking on the integer is ranking
    * on perplexity with no float anywhere.
    */
  def scoreWithNll(df: DataFrame, textCol: String, model: Model,
      scoreCol: String = "lm_logprob_q",
      nllCol: String = "lm_nll_per_tok_q"): DataFrame = {
    require(!df.columns.contains(nllCol),
      s"NgramLm.scoreWithNll: input already has a '$nllCol' column; " +
        "rename it first")
    require(!df.columns.contains(scoreCol),
      s"NgramLm.scoreWithNll: input already has a '$scoreCol' column; " +
        "rename it first")
    require(!df.columns.contains("__lm"),
      "NgramLm.scoreWithNll: input already has a '__lm' column; rename it first")
    // ONE fused tokenize+score pass ([[NgramLmScoreCount]]) yields
    // [Σ logprob, n_tokens]; the unfused shape paid a SECOND full
    // tokenization just for size(tokens). NULL text → [0, 0], same as
    // the empty doc (the score() coalesce contract). The array MUST land
    // in its own aliased column: with the kernel inlined at each
    // element_at site, CollapseProject + the conditional nll branches
    // re-evaluate it per reference — the alias is non-cheap and
    // multiply-referenced, so the projections stay split and the kernel
    // runs once per row (measured: the inlined shape times identical to
    // the unfused double tokenize; this shape is the one that wins —
    // SCALE.md round 18).
    val fused = coalesce(
      NgramLmScore.ngramLmScoreCount(col(textCol),
        model.tokenizerTag, model.n, model.table, model.totalTokens),
      array(lit(0L), lit(0L)))
    df.withColumn("__lm", fused)
      .withColumn(scoreCol, element_at(col("__lm"), 1))
      .withColumn(nllCol,
        when(element_at(col("__lm"), 2) === 0L, lit(null).cast("long"))
          .otherwise(call_function("div", -element_at(col("__lm"), 1),
            element_at(col("__lm"), 2))))
      .drop("__lm")
  }

  // ---- model persistence (one tiny parquet + the shared meta file) ----

  private val MetaFileName = "_graft_lm_model_meta.json"

  /** Persist a fitted model: `(gram, c)` rows plus the meta artifact
    * carrying the feature rule and token total. Scoring after
    * [[readModel]] is bit-identical to the in-memory model.
    */
  def writeModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    model.grams.toSeq.toDF("gram", "c")
      .coalesce(1).write.mode("overwrite").parquet(path)
    IndexLifecycle.writeMeta(spark, path, MetaFileName,
      s"""{"tok": "${model.tokenizerTag}", "n": ${model.n}, """ +
        s""""total_tokens": ${model.totalTokens}, """ +
        s""""n_grams": ${model.grams.length}, "version": 1}""")
  }

  /** Load a persisted model; the feature rule comes from the meta
    * (never a caller parameter — the model decides how text splits).
    */
  def readModel(spark: SparkSession, path: String): Model = {
    val txt = IndexLifecycle.requireMeta(spark, path, MetaFileName,
      "NgramLm.readModel", "NgramLm.writeModel")
    val tok = IndexLifecycle.strField(txt, "tok")
      .map(Tokenizer.fromTag(_, "NgramLm.readModel"))
      .getOrElse(throw new IllegalArgumentException(
        s"NgramLm.readModel: model meta at $path lacks a tokenizer tag: $txt"))
    def lf(k: String): Long = IndexLifecycle.longField(txt, k)
      .getOrElse(throw new IllegalArgumentException(
        s"NgramLm.readModel: malformed model meta at $path (missing $k): $txt"))
    val rows = spark.read.parquet(path).select("gram", "c").collect()
    require(rows.length == lf("n_grams"),
      s"NgramLm.readModel: $path has ${rows.length} gram rows, meta says " +
        s"${lf("n_grams")} — partial or corrupt write")
    Model(tok.tag, lf("n").toInt, lf("total_tokens"),
      rows.map(r => (r.getString(0), r.getLong(1))))
  }
}

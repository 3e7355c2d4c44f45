package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{DsirScore, Md5Prefix32}

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS'23): select raw-corpus documents whose hashed-n-gram
  * distribution looks like a TARGET corpus, by importance weight under
  * two bucketed multinomials. The LLM-curation workhorse for "give me
  * 10M web documents that look like Wikipedia".
  *
  * Spark-first anatomy, sized for 100 TB:
  *  - [[fit]] is the ONLY pass that reads both corpora: hashed
  *    unigram+bigram bucket counts per side. The aggregate key space is
  *    `buckets` (≤ 2^20, default 2^13), so the shuffle after map-side
  *    partial aggregation is ≤ 32·buckets rows per side — two scans, a
  *    KB-scale shuffle, and one driver array. No vocabulary is ever
  *    collected (the hash trick bounds the model, exactly the paper's
  *    construction).
  *  - The fitted model is a `buckets`-long integer array riding the plan
  *    as a reference object; [[score]] is ONE codegen'd map-side
  *    projection per document ([[graft.functions.DsirScore]]) — no
  *    explode, no join, no shuffle. Weights are integer micro-units
  *    (`floor(1e6·Σ log-ratio)`) so sums commute and the DuckDB oracle
  *    matches hash-exact.
  *  - [[resample]] is Gumbel-top-k: weight + deterministic integer
  *    Gumbel noise (seeded md5 of the doc id — replayable, both engines
  *    agree), then ONE TakeOrdered — sampling without replacement from
  *    the softmax of weights with no global sort and no RNG state.
  *
  * Reference scope note: the reference engine (Streamiz) has no data-
  * selection surface; this family extends the library along the
  * training-data-pipeline axis (SURVEY §2's LLM-pipeline mandate), the
  * same first-class track as dedup/ANN/quality filters.
  */
object Dsir {

  /** A fitted DSIR model: per-bucket log-likelihood-ratio
    * `floor(1e6·(ln p_target(b) − ln p_raw(b)))` in integer micro-units,
    * plus the feature rule that produced it (tokenizer tag + bucket
    * count — scoring MUST hash grams exactly the way fitting did).
    */
  final case class Model(buckets: Int, tokenizerTag: String,
      alpha: Double, lrMicro: Array[Long]) {
    require(lrMicro.length == buckets,
      s"Dsir.Model: ${lrMicro.length} entries for $buckets buckets")
  }

  /** Unigram ∪ adjacent-bigram grams of `text` — the fit pass's explode
    * side of the feature rule ([[graft.functions.DsirScoreKernel]] is the
    * fused scoring twin; parity locked in DsirSpec).
    */
  private[operators] def gramsCol(text: Column, tokenizer: Tokenizer): Column = {
    val t = tokenizer.column(text)
    // bigrams from the SAME token expression via the shared gram
    // construction (one definition — TextQueries.ngramsOfTokens — so the
    // feature rule can't drift from the oracle mirror, and the shared
    // subtree keeps codegen CSE applicable in the fit pass, the only
    // full-corpus scans this operator runs)
    concat(t, graft.queries.TextQueries.ngramsOfTokens(t, 2))
  }

  /** Per-bucket gram-occurrence counts of one corpus, as a driver array
    * of length `buckets` (zeros included). The aggregate is B-bounded:
    * map-side partial aggregation means the Exchange carries at most
    * `partitions·buckets` rows regardless of corpus size.
    */
  private def bucketCounts(df: DataFrame, textCol: String, buckets: Int,
      tokenizer: Tokenizer): Array[Long] = {
    Md5Prefix32.register(df.sparkSession) // idempotent; bare sessions lack it
    val counts = df
      .select(explode(gramsCol(col(textCol), tokenizer)).as("__g"))
      .select(pmod(Md5Prefix32.md5Prefix32(col("__g")), lit(buckets.toLong))
        .as("__b"))
      .groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .collect()
    val out = Array.fill(buckets)(0L)
    counts.foreach(r => out(r.getLong(0).toInt) = r.getLong(1))
    out
  }

  /** Fit the bucketed importance model: `target` is the distribution you
    * WANT (e.g. curated/domain text), `raw` the proposal corpus you will
    * select from. Laplace-`alpha` smoothed per-bucket log probabilities;
    * the driver computes `lr(b) = ln((ct+α)/(Tt+α·B)) − ln((cr+α)/(Tr+α·B))`
    * with a pinned operation order (the DuckDB oracle mirrors it
    * term-for-term) and floors to micro-units once, here — every later
    * scoring sum is pure integer arithmetic.
    */
  def fit(target: DataFrame, raw: DataFrame, textCol: String,
      buckets: Int = 1 << 13, alpha: Double = 1.0,
      tokenizer: Tokenizer = Tokenizer.Ascii): Model = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"Dsir.fit: buckets must be in (0, 2^20], got $buckets — the model " +
        "is a driver/broadcast array; beyond 2^20 use a coarser hash")
    require(alpha > 0.0, s"Dsir.fit: alpha must be > 0, got $alpha")
    val ct = bucketCounts(target, textCol, buckets, tokenizer)
    val cr = bucketCounts(raw, textCol, buckets, tokenizer)
    modelFrom(ct, cr, buckets, alpha, tokenizer)
  }

  /** [[fit]] when target and raw live in ONE frame, distinguished by a
    * boolean column expression: both sides' bucket counts come out of a
    * SINGLE tagged aggregate pass (r18) — one corpus scan/tokenize and
    * one action instead of two, and any expensive shared upstream (e.g.
    * the dedup subtree the composed pipeline fits on) executes once
    * instead of once per side. Rows where `isTarget` is NULL belong to
    * neither side and are excluded — mirror of the two-frame form where
    * such rows simply appear in neither input. Model-identical to
    * `fit(df.where(isTarget), df.where(!isTarget), …)` (locked in
    * DsirSpec): the per-side gram multisets are the same, the driver
    * arithmetic is shared.
    */
  def fitSplit(df: DataFrame, isTarget: Column, textCol: String,
      buckets: Int = 1 << 13, alpha: Double = 1.0,
      tokenizer: Tokenizer = Tokenizer.Ascii): Model = {
    require(buckets > 0 && buckets <= (1 << 20),
      s"Dsir.fitSplit: buckets must be in (0, 2^20], got $buckets — the " +
        "model is a driver/broadcast array; beyond 2^20 use a coarser hash")
    require(alpha > 0.0, s"Dsir.fitSplit: alpha must be > 0, got $alpha")
    Md5Prefix32.register(df.sparkSession)
    val rows = df
      .select(isTarget.as("__t"),
        explode(gramsCol(col(textCol), tokenizer)).as("__g"))
      .where(col("__t").isNotNull)
      .select(col("__t"),
        pmod(Md5Prefix32.md5Prefix32(col("__g")), lit(buckets.toLong))
          .as("__b"))
      .groupBy(col("__t"), col("__b")).agg(count(lit(1)).as("__c"))
      .collect()
    val ct = Array.fill(buckets)(0L)
    val cr = Array.fill(buckets)(0L)
    rows.foreach { r =>
      val side = if (r.getBoolean(0)) ct else cr
      side(r.getLong(1).toInt) = r.getLong(2)
    }
    modelFrom(ct, cr, buckets, alpha, tokenizer)
  }

  /** The shared driver arithmetic of [[fit]]/[[fitSplit]] — pinned op
    * order, floored to micro-units exactly once.
    */
  private def modelFrom(ct: Array[Long], cr: Array[Long], buckets: Int,
      alpha: Double, tokenizer: Tokenizer): Model = {
    val tt = ct.sum.toDouble + alpha * buckets
    val tr = cr.sum.toDouble + alpha * buckets
    val lr = Array.tabulate(buckets) { b =>
      math.floor((math.log((ct(b) + alpha) / tt)
        - math.log((cr(b) + alpha) / tr)) * 1e6).toLong
    }
    Model(buckets, tokenizer.tag, alpha, lr)
  }

  /** [[fit]] on a deterministic hash-sample of the RAW corpus — the
    * documented escape hatch when even two streaming scans of raw are
    * too much, now enforced to be the REPLAYABLE kind: the sample is
    * [[Sampling.hashSample]] on `idCol` (md5-bucket < perMille), so a
    * refit over the same corpus sees the same rows — no RNG partition
    * state, no sampling drift between the fit and a later audit. The
    * target corpus is NEVER sampled (it is the small, wanted side by
    * construction; thinning it only adds estimator variance for free).
    * Bucket probabilities are ratios, so a uniform row sample leaves
    * their expectations unchanged — weight error shrinks as the sampled
    * gram count grows (measured at 100× in SCALE.md: rank-stable
    * weights at perMille = 100).
    */
  def fitSampled(target: DataFrame, raw: DataFrame, idCol: String,
      textCol: String, perMille: Int,
      buckets: Int = 1 << 13, alpha: Double = 1.0,
      tokenizer: Tokenizer = Tokenizer.Ascii): Model = {
    require(perMille > 0 && perMille <= 1000,
      s"Dsir.fitSampled: perMille must be in (0, 1000], got $perMille")
    Md5Prefix32.register(raw.sparkSession)
    fit(target, Sampling.hashSample(raw, col(idCol), perMille), textCol,
      buckets, alpha, tokenizer)
  }

  /** Importance weight per document, integer micro-units — one codegen'd
    * map-side projection (no shuffle; the model rides as a reference
    * object).
    */
  def score(df: DataFrame, textCol: String, model: Model,
      weightCol: String = "dsir_weight_q"): DataFrame = {
    require(!df.columns.contains(weightCol),
      s"Dsir.score: input already has a '$weightCol' column; rename it first")
    // NULL text scores 0, same as the empty doc (zero n-grams, zero sum)
    // — the kernel expression itself is null-preserving, so without the
    // coalesce a nullable corpus column would diverge from the DuckDB
    // mirror (whose final CTE coalesces missing scores to 0) and from
    // the documented "empty doc scores 0" contract
    df.withColumn(weightCol,
      coalesce(
        DsirScore.dsirScore(col(textCol), model.tokenizerTag, model.buckets,
          model.lrMicro),
        lit(0L)))
  }

  /** Deterministic integer Gumbel noise for `idCol` under `seed`:
    * `u = (md5prefix32(seed:":":id) + 0.5) / 2^32`,
    * `floor(1e6·(−ln(−ln u)))`. Exposed for the oracle mirror.
    */
  private[operators] def gumbelMicro(idCol: Column, seed: Long): Column = {
    val u = (Md5Prefix32.md5Prefix32(
      concat(lit(s"$seed:"), idCol.cast("string"))).cast("double") + 0.5) /
      4294967296.0
    floor(-log(-log(u)) * 1e6).cast("long")
  }

  /** Gumbel-top-k importance resampling: draw `k` documents WITHOUT
    * replacement with probability ∝ exp(weight) — equivalently, take the
    * top k of `weight + Gumbel` (Vieira'14). Noise is seeded md5 of the
    * doc id, quantized to the same micro-units as the weights, so the
    * draw is replayable and engine-exact; ONE TakeOrdered — no global
    * sort, no RNG partition state. Returns (id, weight_q, total_q, rank).
    */
  def resample(df: DataFrame, idCol: String, textCol: String, model: Model,
      k: Int, seed: Long = 42L): DataFrame = {
    require(k > 0, s"Dsir.resample: k must be > 0, got $k")
    Md5Prefix32.register(df.sparkSession) // idempotent; bare sessions lack it
    val scored = score(df, textCol, model)
      .withColumn("total_q",
        col("dsir_weight_q") + gumbelMicro(col(idCol), seed))
      .select(col(idCol), col("dsir_weight_q"), col("total_q"))
      .orderBy(col("total_q").desc, col(idCol))
      .limit(k)
    // rank over the k already-taken rows — bounded, not a corpus window
    scored.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("total_q").desc, col(idCol))).cast("int"))
  }

  // ---- model persistence (one tiny parquet + the shared meta file) ----

  private val MetaFileName = "_graft_dsir_model_meta.json"

  /** Persist a fitted model: `(bucket, lr_micro)` parquet + the shared
    * meta artifact carrying the feature rule. Scoring after [[readModel]]
    * is bit-identical to scoring with the in-memory model.
    */
  def writeModel(spark: SparkSession, model: Model, path: String): Unit = {
    import spark.implicits._
    model.lrMicro.zipWithIndex
      .map { case (lr, b) => (b, lr) }.toSeq
      .toDF("bucket", "lr_micro")
      .coalesce(1).write.mode("overwrite").parquet(path)
    IndexLifecycle.writeMeta(spark, path, MetaFileName,
      s"""{"buckets": ${model.buckets}, "tok": "${model.tokenizerTag}", """ +
        s""""alpha": "${model.alpha}", "version": 1}""")
  }

  /** Load a persisted model; the tokenizer tag is resolved from the meta
    * (never a caller parameter — the index-family rule: the model decides
    * how text is featurized, or weights silently drift).
    */
  def readModel(spark: SparkSession, path: String): Model = {
    val txt = IndexLifecycle.requireMeta(spark, path, MetaFileName,
      "Dsir.readModel", "Dsir.writeModel")
    val buckets = IndexLifecycle.longField(txt, "buckets").map(_.toInt)
      .getOrElse(throw new IllegalArgumentException(
        s"Dsir.readModel: malformed model meta at $path: $txt"))
    val tok = IndexLifecycle.strField(txt, "tok")
      .map(Tokenizer.fromTag(_, "Dsir.readModel"))
      .getOrElse(throw new IllegalArgumentException(
        s"Dsir.readModel: model meta at $path lacks a tokenizer tag: $txt"))
    val alpha = IndexLifecycle.strField(txt, "alpha").map(_.toDouble)
      .getOrElse(1.0)
    val rows = spark.read.parquet(path).select("bucket", "lr_micro").collect()
    require(rows.length == buckets,
      s"Dsir.readModel: $path has ${rows.length} bucket rows, meta says $buckets")
    val lr = Array.fill(buckets)(0L)
    val seen = new java.util.BitSet(buckets)
    rows.foreach { r =>
      val i = r.getInt(0)
      // a corrupt/hand-edited model would otherwise throw a raw
      // ArrayIndexOutOfBounds (out-of-range) or silently leave some
      // bucket at lr=0 while another was written twice (duplicate) —
      // wrong scores with no diagnostic
      require(i >= 0 && i < buckets,
        s"Dsir.readModel: malformed model at $path — bucket index $i " +
          s"outside [0, $buckets)")
      require(!seen.get(i),
        s"Dsir.readModel: malformed model at $path — duplicate bucket $i")
      seen.set(i)
      lr(i) = r.getLong(1)
    }
    Model(buckets, tok.tag, alpha, lr)
  }
}

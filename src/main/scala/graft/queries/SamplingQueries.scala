package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Sampling
import GraftQuery.q
import TextQueries.hash32Sql

/** Deterministic sampling / split-assignment queries ([[Sampling]]) — the
  * DuckDB oracle reproduces every md5-derived bucket bit-for-bit, so these
  * are row-exact, not statistical, checks.
  */
object SamplingQueries {

  private def bucketSql(e: String) = s"(${hash32Sql(e)} % 1000)"

  /** 5% deterministic sample of documents by doc_id. */
  val qSampleHash = q(
    "q_sample_hash",
    s"SELECT doc_id, lang, source FROM documents " +
      s"WHERE ${bucketSql("CAST(doc_id AS VARCHAR)")} < 50") { (s, d) =>
    Sampling.hashSample(Tables.documents(s, d), col("doc_id"), 50)
      .select("doc_id", "lang", "source")
  }

  /** Stratified event sample: clicks kept at 20%, views at 2%, rest 5%. */
  val qSampleStratified = q(
    "q_sample_stratified",
    "SELECT event_id, event_type FROM events " +
      s"WHERE ${bucketSql("CAST(event_id AS VARCHAR)")} < " +
      "(CASE event_type WHEN 'click' THEN 200 WHEN 'view' THEN 20 ELSE 50 END)") {
    (s, d) =>
      Sampling.stratified(Tables.events(s, d), col("event_type"),
          col("event_id"), Map("click" -> 200, "view" -> 20), 50)
        .select("event_id", "event_type")
  }

  /** Train/val/test assignment (90/5/5) with per-split, per-lang counts —
    * proves splits are disjoint, exhaustive, and deterministic.
    */
  val qSampleSplit = q(
    "q_sample_split",
    "SELECT split, lang, count(*) AS cnt FROM (SELECT lang, " +
      s"CASE WHEN ${bucketSql("CAST(doc_id AS VARCHAR)")} < 900 THEN 'train' " +
      s"WHEN ${bucketSql("CAST(doc_id AS VARCHAR)")} < 950 THEN 'val' " +
      "ELSE 'test' END AS split FROM documents) GROUP BY split, lang") { (s, d) =>
    Sampling.assignSplit(Tables.documents(s, d), col("doc_id"),
        Seq(("train", 900), ("val", 950), ("test", 1000)))
      .groupBy("split", "lang").agg(count(lit(1)).as("cnt"))
  }

  /** Per-source document cap (at most 20 docs per source, hash-ordered):
    * bounds any single domain's contribution regardless of skew.
    */
  val qSamplePerKeyCap = q(
    "q_sample_per_key_cap",
    "SELECT source, doc_id FROM (SELECT source, doc_id, row_number() OVER (" +
      s"PARTITION BY source ORDER BY ${bucketSql("CAST(doc_id AS VARCHAR)")}, doc_id) AS rn " +
      "FROM documents) WHERE rn <= 20") { (s, d) =>
    Sampling.perKeyCap(Tables.documents(s, d), col("source"), col("doc_id"), 20)
      .select("source", "doc_id")
  }

  /** Domain-mixture weights (ppm) and token budget — ONE definition drives
    * the Spark call and the generated oracle SQL, so the two sides cannot
    * drift. src0 is over-weighted past one epoch (copies >= 1 everywhere),
    * src4 is down-sampled to a fraction; src5..19 are unweighted and
    * dropped.
    */
  private[queries] val MixtureWeights: Seq[(String, Long)] = Seq(
    "src0" -> 400000L, "src1" -> 250000L, "src2" -> 150000L,
    "src3" -> 100000L, "src4" -> 50000L)
  private[queries] val MixtureBudget = 5000L

  /** Mixture oracle CTE chain over a caller-supplied `dt` definition
    * (doc_id, source, n_tokens), ending in `m` = the sampled rows
    * (doc_id, source, n_tokens, copies >= 1) — one rule definition for
    * every mixture query, including the composed curation pipeline.
    */
  private[queries] def mixtureCtesFrom(dtSql: String): String = {
    val values = MixtureWeights
      .map { case (s, p) => s"('$s', CAST($p AS BIGINT))" }.mkString(", ")
    mixtureCtesWith(dtSql, s"w(source, ppm) AS (VALUES $values)")
  }

  /** The mixture rule chain over a caller-supplied weights CTE named `w`
    * with columns (source, ppm) — shared by the static-weight and the
    * derived-temperature-weight entries.
    */
  private[queries] def mixtureCtesWith(dtSql: String, wCte: String): String =
    s"dt AS ($dtSql), " +
      "tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total FROM dt GROUP BY source), " +
      s"$wCte, " +
      s"tgt AS (SELECT tot.source, total, (CAST($MixtureBudget AS BIGINT) * ppm) // 1000000 AS target " +
      // total > 0 mirrors the Spark side's totals.filter(_ > 0): an
      // all-empty-token domain must be DROPPED, not divide by zero
      "FROM tot JOIN w USING (source) WHERE total > 0), " +
      "rules AS (SELECT source, target // total AS copies, " +
      "((target % total) * 1000000) // total AS rem_ppm FROM tgt), " +
      "sel AS (SELECT dt.doc_id, dt.source, dt.n_tokens, " +
      s"copies + CASE WHEN (${hash32Sql("CAST(doc_id AS VARCHAR)")} % 1000000) < rem_ppm " +
      "THEN 1 ELSE 0 END AS c FROM dt JOIN rules USING (source)), " +
      "m AS (SELECT doc_id, source, n_tokens, CAST(c AS BIGINT) AS copies " +
      "FROM sel WHERE c > 0)"

  /** α = 1/2 temperature weights as a `w(source, ppm)` CTE — the exact
    * integer mirror of [[Sampling.sqrtTemperatureWeightsPpm]]: clamped
    * isqrt of per-domain totals (float sqrt alone can be off by one at
    * perfect squares), then largest-remainder apportionment onto the ppm
    * grid with (remainder DESC, source) tie order.
    */
  private[queries] val sqrtTempWeightsCte: String =
    "s0 AS (SELECT source, total, CAST(floor(sqrt(CAST(total AS DOUBLE))) AS BIGINT) AS g " +
      "FROM tot WHERE total > 0), " +
      "s1 AS (SELECT source, total, g - (CASE WHEN g*g > total THEN 1 ELSE 0 END) AS g1 FROM s0), " +
      "isq AS (SELECT source, g1 + (CASE WHEN (g1+1)*(g1+1) <= total THEN 1 ELSE 0 END) AS wt FROM s1), " +
      "pb AS (SELECT source, wt, (wt*1000000) // (SELECT sum(wt) FROM isq) AS base, " +
      "(wt*1000000) % (SELECT sum(wt) FROM isq) AS remn FROM isq), " +
      "wppm AS (SELECT source, base + (CASE WHEN row_number() OVER (ORDER BY remn DESC, source) " +
      "<= 1000000 - (SELECT sum(base) FROM pb) THEN 1 ELSE 0 END) AS ppm FROM pb), " +
      "w AS (SELECT source, CAST(ppm AS BIGINT) AS ppm FROM wppm WHERE ppm > 0)"

  /** Epoch fan-out + per-source packing tail over the `m` CTE, ending in
    * the final SELECT (copy_id, source, n_tokens, seq_id).
    */
  private[queries] def packedTailSql(budget: Long): String =
    "e AS (SELECT doc_id, source, n_tokens, unnest(range(0, copies)) AS epoch FROM m), " +
      "k AS (SELECT epoch * 1000000000000 + doc_id AS copy_id, source, n_tokens FROM e), " +
      "c2 AS (SELECT copy_id, source, n_tokens, sum(n_tokens) OVER " +
      "(PARTITION BY source ORDER BY copy_id ROWS UNBOUNDED PRECEDING) AS cum FROM k) " +
      "SELECT CAST(copy_id AS BIGINT) AS copy_id, source, n_tokens, " +
      s"CAST(floor((cum - n_tokens) / $budget) AS BIGINT) AS seq_id FROM c2"

  /** Spark-side epoch fan-out + packing (mirrors [[packedTailSql]]). */
  private[queries] def packedTailDf(
      m: org.apache.spark.sql.DataFrame, budget: Long) = {
    import org.apache.spark.sql.functions._
    val e = Sampling.explodeCopies(m, col("copies"))
    val k = e.select(
      (col("epoch") * 1000000000000L + col("doc_id")).as("copy_id"),
      col("source"), col("n_tokens"))
    graft.operators.Packing.packCounts(k, "copy_id", "source", "n_tokens", budget)
  }

  private[queries] val docsDtSql: String =
    s"SELECT doc_id, source, CAST(len(${TextQueries.tokensSql}) AS BIGINT) AS n_tokens FROM documents"

  private lazy val mixtureCtes: String = mixtureCtesFrom(docsDtSql)

  /** Spark side of the mixture sample (shared by both mixture queries).
    * Totals/rules in-plan (one action, driver touches no data); the
    * repartition pins the tokenized frame behind ONE exchange so the
    * totals aggregate and the sampled rows share a single tokenize pass
    * (exchange reuse) instead of re-scanning the text.
    */
  private def mixtureDf(s: org.apache.spark.sql.SparkSession, d: String) = {
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
      size(TextQueries.tokensCol(col("text"))).cast("long").as("n_tokens"))
      .repartition(col("doc_id"))
    Sampling.mixtureByTokenBudgetInPlan(docs, col("source"), col("doc_id"),
        col("n_tokens"), MixtureWeights, MixtureBudget)
      .select("doc_id", "source", "n_tokens", "copies")
  }

  /** Mixture sampling to a token budget: per-domain copies (epochs) +
    * deterministic remainder sampling, integer-exact on both engines.
    */
  val qSampleMixture = q(
    "q_sample_mixture",
    s"WITH $mixtureCtes SELECT doc_id, source, n_tokens, copies FROM m") {
    (s, d) => mixtureDf(s, d)
  }

  /** The full documented fan-out: mixture `copies` explode to one row per
    * epoch (epoch-major copy ids — all of epoch 0 packs before epoch 1,
    * the layout a multi-epoch training run reads), then contiguous
    * sequence packing per source on the SURVIVING token counts. Proves the
    * mixture → explodeCopies → packCounts composition end-to-end,
    * integer-exact on both engines.
    */
  val qMixturePacked = q(
    "q_mixture_packed",
    s"WITH $mixtureCtes, ${packedTailSql(1024L)}") { (s, d) =>
    packedTailDf(mixtureDf(s, d), 1024L)
  }

  /** Deterministic global shuffle into 4 shards
    * ([[Sampling.shuffleShard]]): the pre-training permutation — md5 order
    * key over (doc_id, seed "e1"), shard = key mod 4, dense 1-based
    * position within the shard. Row-exact: the oracle reproduces key,
    * shard, and position bit-for-bit, so this checks the full permutation,
    * not summary stats.
    */
  val qShuffleShard = q(
    "q_shuffle_shard", {
      val k = hash32Sql("CAST(doc_id AS VARCHAR) || ':e1'")
      s"SELECT doc_id, shard, shard_pos FROM (SELECT doc_id, ($k % 4) AS shard, " +
        s"row_number() OVER (PARTITION BY ($k % 4) ORDER BY $k, doc_id) AS shard_pos " +
        "FROM documents)"
    }) { (s, d) =>
    Sampling.shuffleShard(Tables.documents(s, d), col("doc_id"),
        nShards = 4, seed = "e1")
      .select("doc_id", "shard", "shard_pos")
  }

  /** Training-shard composition — the OUTPUT end of the pipeline locked as
    * one plan: documents pack into 2048-token sequences per source
    * ([[graft.operators.Packing.packSequences]]), the distinct SEQUENCES
    * (not docs) then shuffle deterministically into 4 shards
    * ([[Sampling.shuffleShard]] on the composite `source:seq_id` key) —
    * what a writer does right before emitting shard files of packed
    * sequences. The oracle chains the identical running-sum packing and
    * md5 permutation; every (sequence → shard, position) pair is
    * value-checked.
    */
  val qTrainingShards = q(
    "q_training_shards", {
      val key = hash32Sql("source || ':' || CAST(seq_id AS VARCHAR) || ':e1'")
      "WITH toks AS (SELECT doc_id, source, " +
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents), " +
        "c AS (SELECT doc_id, source, n_tokens, sum(n_tokens) OVER " +
        "(PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM toks), " +
        "seqs AS (SELECT source, CAST(floor((cum - n_tokens) / 2048) AS BIGINT) AS seq_id, " +
        "count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens FROM c GROUP BY 1, 2) " +
        s"SELECT source, seq_id, n_docs, seq_tokens, ($key % 4) AS shard, " +
        s"row_number() OVER (PARTITION BY ($key % 4) ORDER BY $key, source || ':' || CAST(seq_id AS VARCHAR)) AS shard_pos " +
        "FROM seqs"
    }) { (s, d) =>
    val packed = graft.operators.Packing.packSequences(
      Tables.documents(s, d), "doc_id", "text", "source", tokenBudget = 2048L)
    val seqs = packed.groupBy(col("source"), col("seq_id"))
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"))
      .withColumn("__sid", concat_ws(":", col("source"), col("seq_id")))
    Sampling.shuffleShard(seqs, col("__sid"), nShards = 4, seed = "e1")
      .drop("__sid")
  }

  /** Temperature-sampled mixture (α = 1/2, the multilingual `p_d ∝ n_d^α`
    * up-weighting of low-resource domains): weights are DERIVED from the
    * corpus's own per-domain token totals via exact-integer isqrt +
    * largest-remainder ppm ([[Sampling.sqrtTemperatureWeightsPpm]]), then
    * fed through the same deterministic mixture rule as `q_sample_mixture`
    * — so the full derive-weights → sample chain is value-checked
    * bit-for-bit. Unlike the static-weight entry, every domain present
    * in the corpus gets a weight (extreme skew can still floor a
    * negligible domain to 0 ppm on both engines). The per-domain totals
    * are aggregated ONCE and shared by the weights derivation and the
    * mixture rule.
    */
  val qSampleTemperature = q(
    "q_sample_temperature",
    s"WITH ${mixtureCtesWith(docsDtSql, sqrtTempWeightsCte)} " +
      "SELECT doc_id, source, n_tokens, copies FROM m") { (s, d) =>
    import org.apache.spark.sql.functions._
    // derive-weights → sample fully in-plan (no driver collect), the
    // tokenized frame pinned behind one shared exchange — see mixtureDf
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
      size(TextQueries.tokensCol(col("text"))).cast("long").as("n_tokens"))
      .repartition(col("doc_id"))
    Sampling.sqrtTemperatureMixtureInPlan(docs, col("source"), col("doc_id"),
        col("n_tokens"), MixtureBudget)
      .select("doc_id", "source", "n_tokens", "copies")
  }

  // ---- DSIR importance resampling ([[graft.operators.Dsir]]) ----

  /** The DSIR feature rule in DuckDB: unigrams ∪ adjacent bigrams of the
    * ascii-tokenized `text` (the exact mirror of `Dsir.gramsCol` /
    * `DsirScoreKernel`).
    */
  private def dsirGramsSql(c: String): String =
    s"list_concat(${TextQueries.tokensSqlCol(c)}, ${TextQueries.ngramsSqlCol(c, 2)})"

  private[queries] val DsirBuckets = 8192

  /** The fit + score pipeline as CTEs over caller-supplied target/raw
    * corpus SQL (each `SELECT`ing at least (doc_id, text)); `w` ends up
    * as (doc_id, dsir_weight_q) for every raw doc — zero-gram docs
    * weight 0. Mirrors the driver's pinned IEEE op order:
    * `(c + 1.0) / (T_double + αB)`, ln, subtract, ×1e6, floor — per
    * bucket ONCE, then pure integer sums per doc.
    */
  /** `fitRawSql`, when set, fits the model's raw side on a DIFFERENT
    * corpus than the one scored (the [[graft.operators.Dsir.fitSampled]]
    * mirror: fit on the hash-sampled subset, score everything) — the
    * default fits and scores the same `raw`.
    */
  private[queries] def dsirCtesOver(tgtSql: String, rawSql: String,
      fitRawSql: Option[String] = None): String = {
    val b = DsirBuckets
    val h = hash32Sql("g")
    s"tgt AS ($tgtSql), " +
      s"raw AS ($rawSql), " +
      s"fitraw AS (${fitRawSql.getOrElse("SELECT text FROM raw")}), " +
      s"tg AS (SELECT unnest(${dsirGramsSql("text")}) AS g FROM tgt), " +
      s"rg AS (SELECT unnest(${dsirGramsSql("text")}) AS g FROM fitraw), " +
      s"tb AS (SELECT ($h % $b) AS b, CAST(count(*) AS BIGINT) AS c FROM tg GROUP BY 1), " +
      s"rb AS (SELECT ($h % $b) AS b, CAST(count(*) AS BIGINT) AS c FROM rg GROUP BY 1), " +
      "tt AS (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS t FROM tb), " +
      "rt AS (SELECT CAST(coalesce(sum(c), 0) AS DOUBLE) AS t FROM rb), " +
      s"dg AS (SELECT doc_id, ($h % $b) AS b FROM " +
      s"(SELECT doc_id, unnest(${dsirGramsSql("text")}) AS g FROM raw)), " +
      "db AS (SELECT DISTINCT b FROM dg), " +
      "lr AS (SELECT db.b, CAST(floor((ln((coalesce(tb.c, 0) + 1.0) / " +
      s"(tt.t + $b.0)) - ln((coalesce(rb.c, 0) + 1.0) / (rt.t + $b.0))) " +
      "* 1000000) AS BIGINT) AS lr FROM db " +
      "LEFT JOIN tb USING (b) LEFT JOIN rb USING (b) " +
      "CROSS JOIN tt CROSS JOIN rt), " +
      "w AS (SELECT r.doc_id, CAST(coalesce(s.wq, 0) AS BIGINT) AS dsir_weight_q " +
      "FROM raw r LEFT JOIN (SELECT dg.doc_id, sum(lr.lr) AS wq " +
      "FROM dg JOIN lr USING (b) GROUP BY 1) s USING (doc_id))"
  }

  /** The q_dsir_* corpora: target = German docs, raw = English docs. */
  private val dsirCtes: String = dsirCtesOver(
    "SELECT text FROM documents WHERE lang = 'de'",
    "SELECT doc_id, text FROM documents WHERE lang = 'en'")

  /** The Gumbel-top-k draw tail over the `w`/`raw` CTEs ([[dsirCtesOver]]):
    * seeded integer noise + rank ≤ k — the `Dsir.resample` mirror,
    * reusable after any corpus derivation.
    */
  private[queries] def dsirDrawSql(seed: Long, k: Int): String = {
    val gu = hash32Sql(s"'$seed:' || CAST(doc_id AS VARCHAR)")
    s"gn AS (SELECT doc_id, CAST(floor(-ln(-ln((CAST($gu AS DOUBLE) + 0.5) " +
      "/ 4294967296.0)) * 1000000) AS BIGINT) AS gq FROM raw), " +
      "tot AS (SELECT w.doc_id, dsir_weight_q, dsir_weight_q + gq AS total_q " +
      "FROM w JOIN gn USING (doc_id)) " +
      "SELECT doc_id, dsir_weight_q, total_q, CAST(rank AS INT) AS rank FROM (" +
      "SELECT *, row_number() OVER (ORDER BY total_q DESC, doc_id) AS rank " +
      s"FROM tot) WHERE rank <= $k"
  }

  /** DSIR importance weights (Xie et al. NeurIPS'23): hashed
    * unigram+bigram bucket log-ratio model fitted on German-vs-English
    * documents, every English doc scored. The Spark side is the fused
    * [[graft.functions.DsirScore]] kernel — ONE map-side projection, no
    * shuffle — against the oracle's full unnest+join recompute; integer
    * micro-units make the two sums identical.
    */
  val qDsirWeights = q(
    "q_dsir_weights",
    s"WITH $dsirCtes SELECT doc_id, dsir_weight_q FROM w") { (s, d) =>
    val docs = Tables.documents(s, d)
    // one tagged fit pass over both languages (r18): same model, half
    // the fit scans/actions
    val model = graft.operators.Dsir.fitSplit(docs,
      when(col("lang") === "de", lit(true))
        .when(col("lang") === "en", lit(false)),
      "text", buckets = DsirBuckets)
    graft.operators.Dsir.score(docs.filter(col("lang") === "en"), "text", model)
      .select(col("doc_id"), col("dsir_weight_q"))
  }

  /** DSIR Gumbel-top-k resample: 50 English docs drawn without
    * replacement with probability ∝ exp(importance weight), via
    * deterministic seeded integer Gumbel noise + ONE TakeOrdered — the
    * paper's resampling step with a replayable draw. The model is
    * persisted ([[graft.operators.Dsir.writeModel]]) and re-read before
    * scoring, so the entry also gates the model artifact roundtrip.
    */
  val qDsirSample = q(
    "q_dsir_sample",
    s"WITH $dsirCtes, ${dsirDrawSql(seed = 7L, k = 50)}") { (s, d) =>
    val docs = Tables.documents(s, d)
    val fitted = graft.operators.Dsir.fitSplit(docs,
      when(col("lang") === "de", lit(true))
        .when(col("lang") === "en", lit(false)),
      "text", buckets = DsirBuckets)
    val dir = TextQueries.scratchDir("graft_dsir_model", d)
    graft.operators.Dsir.writeModel(s, fitted, dir)
    val model = graft.operators.Dsir.readModel(s, dir)
    graft.operators.Dsir.resample(docs.filter(col("lang") === "en"),
      "doc_id", "text", model, k = 50, seed = 7L)
  }

  /** DSIR weights under the SAMPLED fit ([[graft.operators.Dsir
    * .fitSampled]]): the model's raw-side gram counts come from the
    * deterministic md5-bucket half of the English corpus (the
    * `Sampling.hashSample` rule — replayable, no RNG state), while
    * SCORING covers every English doc. The oracle recomputes the whole
    * pipeline with the fit CTE filtered by the same bucket rule, so the
    * entry gates both the sampling rule's engine parity and that the
    * sampled fit changes ONLY the model, never the scored population.
    */
  val qDsirWeightsSampled = q(
    "q_dsir_weights_sampled",
    s"WITH ${dsirCtesOver(
        "SELECT text FROM documents WHERE lang = 'de'",
        "SELECT doc_id, text FROM documents WHERE lang = 'en'",
        Some("SELECT text FROM documents WHERE lang = 'en' AND " +
          s"${bucketSql("CAST(doc_id AS VARCHAR)")} < 500"))} " +
      "SELECT doc_id, dsir_weight_q FROM w") { (s, d) =>
    val docs = Tables.documents(s, d)
    val model = graft.operators.Dsir.fitSampled(
      docs.filter(col("lang") === "de"), docs.filter(col("lang") === "en"),
      "doc_id", "text", perMille = 500, buckets = DsirBuckets)
    graft.operators.Dsir.score(docs.filter(col("lang") === "en"), "text", model)
      .select(col("doc_id"), col("dsir_weight_q"))
  }

  val all: Seq[GraftQuery] =
    Seq(qSampleHash, qSampleStratified, qSampleSplit, qSamplePerKeyCap,
      qSampleMixture, qSampleTemperature, qMixturePacked, qShuffleShard,
      qTrainingShards, qDsirWeights, qDsirSample, qDsirWeightsSampled)
}

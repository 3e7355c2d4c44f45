package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{NgramLm, QualityFilters, Tokenizer}
import graft.functions.NgramLmKernel
import GraftQuery.q

/** N-gram language-model queries ([[graft.operators.NgramLm]]) — the
  * CCNet perplexity-filter stage as published (Wenzek et al. 2020 §4.3):
  * fit a stupid-backoff LM on a clean reference corpus (here the English
  * documents — CCNet's Wikipedia role), score EVERY document's
  * log-probability map-side, bucket per language on per-token NLL.
  *
  * The DuckDB oracle refits the model inside the query (the
  * `q_dsir_weights` pattern): same gram counts, same `minCount` pruning,
  * same backoff CASE over the SAME pinned integer α penalty
  * ([[graft.functions.NgramLmKernel.AlphaPenaltyMicro]]), and the only
  * float work on either engine is `ln` of count doubles in a pinned op
  * order — so the per-position micro values and their integer sums
  * hash-match exactly. Fitting on English and scoring ALL languages
  * genuinely exercises every backoff path at sf0.01: full-order hits on
  * English text, partial backoffs on shared tokens, pruned-gram misses
  * (`minCount = 2` drops corpus hapaxes), and the OOV unigram floor on
  * the non-English docs.
  */
object LmQueries {

  private[queries] val N = 3
  private[queries] val MinCount = 2L
  private val Penalty = NgramLmKernel.AlphaPenaltyMicro // -916291

  /** Grams of order `o` over a token-list SQL expression `tk` (the
    * [[TextQueries.ngramsSqlCol]] window rule, lifted to operate on an
    * already-derived token list — DuckDB list slices are 1-based
    * inclusive, so `tk[i:i+o-1]` is exactly `o` tokens).
    */
  private def gramsOfTkSql(tk: String, o: Int): String =
    s"list_transform(range(1, greatest(len($tk) - ${o - 2}, 1)), " +
      s"i -> array_to_string(($tk)[i:i+${o - 1}], ' '))"

  /** Shared CTE block over caller-supplied fit/score corpus SQL (each
    * `SELECT`ing at least (doc_id, text) — fit needs only text): fit →
    * pruned count table `cnt` + unpruned token total `tot`; tokenize
    * the scored corpus (`sd` → `dt`); per-position backoff values
    * (`jv`); per-doc integer sums (`sc`). Parameterized like
    * [[SamplingQueries.dsirCtesOver]] so composed pipelines can run the
    * LM stage over derived text.
    */
  private[queries] def lmCtesOver(fitSql: String, scoreSql: String): String = {
    val tk = TextQueries.tokensSqlCol("text")
    s"fd AS ($fitSql), sd AS ($scoreSql), " +
      "ft AS (SELECT " + tk + " AS tk FROM fd), " +
      "tot AS (SELECT CAST(coalesce(sum(len(tk)), 0) AS BIGINT) AS n FROM ft), " +
      "gr AS (SELECT unnest(flatten([" +
      (1 to N).map(o => gramsOfTkSql("tk", o)).mkString(", ") +
      "])) AS g FROM ft), " +
      "cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM gr GROUP BY 1 " +
      s"HAVING count(*) >= $MinCount), " +
      s"dt AS (SELECT doc_id, $tk AS tk FROM sd), " +
      "pos AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1)) AS i FROM dt), " +
      "pg AS (SELECT doc_id, i, LEAST(i, 3) AS o0, tk[i] AS u, " +
      "CASE WHEN i >= 2 THEN tk[i-1] || ' ' || tk[i] END AS g2, " +
      "CASE WHEN i >= 2 THEN tk[i-1] END AS x2, " +
      "CASE WHEN i >= 3 THEN tk[i-2] || ' ' || tk[i-1] || ' ' || tk[i] END AS g3, " +
      "CASE WHEN i >= 3 THEN tk[i-2] || ' ' || tk[i-1] END AS x3 FROM pos), " +
      "jv AS (SELECT p.doc_id, CASE " +
      "WHEN cg3.c IS NOT NULL AND cx3.c IS NOT NULL THEN " +
      "CAST(floor((ln(cg3.c) - ln(cx3.c)) * 1000000) AS BIGINT) " +
      "WHEN cg2.c IS NOT NULL AND cx2.c IS NOT NULL THEN " +
      s"(p.o0 - 2) * ($Penalty) + " +
      "CAST(floor((ln(cg2.c) - ln(cx2.c)) * 1000000) AS BIGINT) " +
      s"ELSE (p.o0 - 1) * ($Penalty) + " +
      "CAST(floor((ln(coalesce(cu.c, 1)) - ln(tot.n)) * 1000000) AS BIGINT) " +
      "END AS v FROM pg p " +
      "LEFT JOIN cnt cg3 ON p.g3 = cg3.g " +
      "LEFT JOIN cnt cx3 ON p.x3 = cx3.g " +
      "LEFT JOIN cnt cg2 ON p.g2 = cg2.g " +
      "LEFT JOIN cnt cx2 ON p.x2 = cx2.g " +
      "LEFT JOIN cnt cu ON p.u = cu.g " +
      "CROSS JOIN tot), " +
      "sc AS (SELECT d.doc_id, CAST(coalesce(sv.s, 0) AS BIGINT) AS lm_logprob_q " +
      "FROM sd d LEFT JOIN " +
      "(SELECT doc_id, sum(v) AS s FROM jv GROUP BY 1) sv USING (doc_id))"
  }

  /** The ONE per-token-NLL rule as SQL (over a row holding
    * `lm_logprob_q` and the token list `tk`): integer floor division of
    * the negated sum, NULL for zero-token docs — shared by
    * `q_lm_ppl_buckets` and `q_curation_pipeline7` so the zero-token
    * contract and rounding can never fork between them.
    */
  private[queries] val nllExprSql: String =
    "CASE WHEN len(dt.tk) = 0 THEN NULL ELSE (-lm_logprob_q) // len(dt.tk) END"

  /** The q_lm_* corpora: fit = English documents (CCNet's clean
    * reference role), score = every document.
    */
  private[queries] val lmCtes: String = lmCtesOver(
    "SELECT text FROM documents WHERE lang = 'en'",
    "SELECT doc_id, text FROM documents")

  private[queries] def fitModel(s: org.apache.spark.sql.SparkSession,
      d: String): NgramLm.Model =
    NgramLm.fit(Tables.documents(s, d).filter(col("lang") === "en"), "text",
      n = N, tokenizer = Tokenizer.Ascii, minCount = MinCount)

  /** Σ log-probability per document under the English-fitted trigram
    * stupid-backoff LM — the raw LM surface, every backoff path live.
    */
  val qLmScore = q(
    "q_lm_score",
    s"WITH $lmCtes SELECT doc_id, lm_logprob_q FROM sc") { (s, d) =>
    NgramLm.score(Tables.documents(s, d), "text", fitModel(s, d))
      .select(col("doc_id"), col("lm_logprob_q"))
  }

  /** The composed CCNet stage: per-token NLL (integer micro-units; NULL
    * for zero-token docs) bucketed head/middle/tail per language by
    * exact integer percent-rank. The model is persisted and re-read
    * before scoring, so the entry also gates the artifact roundtrip.
    */
  val qLmPplBuckets = q(
    "q_lm_ppl_buckets",
    s"WITH $lmCtes, " +
      s"nl AS (SELECT sc.doc_id, d.lang, $nllExprSql AS nll " +
      "FROM sc JOIN documents d USING (doc_id) JOIN dt USING (doc_id)), " +
      // Spark ranks NULLs first and subtracts the null count; DuckDB
      // orders NULLS LAST here, so non-null ranks need no correction.
      "rk AS (SELECT doc_id, lang, nll, " +
      "rank() OVER (PARTITION BY lang ORDER BY nll ASC NULLS LAST) AS r, " +
      "count(nll) OVER (PARTITION BY lang) AS nn FROM nl) " +
      "SELECT doc_id, lang, nll AS lm_nll_per_tok_q, " +
      "CASE WHEN nll IS NOT NULL THEN ((r - 1) * 1000000) // nn END AS pr_ppm, " +
      "CASE WHEN nll IS NOT NULL THEN (" +
      "CASE WHEN ((r - 1) * 1000000) // nn < 333333 THEN 'head' " +
      "WHEN ((r - 1) * 1000000) // nn < 666667 THEN 'middle' " +
      "ELSE 'tail' END) END AS bucket FROM rk") { (s, d) =>
    val dir = TextQueries.scratchDir("graft_lm_model", d)
    NgramLm.writeModel(s, fitModel(s, d), dir)
    val model = NgramLm.readModel(s, dir)
    QualityFilters.percentileBuckets(
      NgramLm.scoreWithNll(Tables.documents(s, d), "text", model)
        .select("doc_id", "lang", "lm_nll_per_tok_q"),
      Seq("lang"), "lm_nll_per_tok_q")
      .select("doc_id", "lang", "lm_nll_per_tok_q", "pr_ppm", "bucket")
  }

  val all: Seq[GraftQuery] = Seq(qLmScore, qLmPplBuckets)
}

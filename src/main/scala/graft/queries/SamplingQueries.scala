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
  private val MixtureWeights: Seq[(String, Long)] = Seq(
    "src0" -> 400000L, "src1" -> 250000L, "src2" -> 150000L,
    "src3" -> 100000L, "src4" -> 50000L)
  private val MixtureBudget = 5000L

  /** Mixture sampling to a token budget: per-domain copies (epochs) +
    * deterministic remainder sampling, integer-exact on both engines.
    */
  val qSampleMixture = q(
    "q_sample_mixture", {
      val toks = TextQueries.tokensSql
      val values = MixtureWeights
        .map { case (s, p) => s"('$s', CAST($p AS BIGINT))" }.mkString(", ")
      s"WITH dt AS (SELECT doc_id, source, CAST(len($toks) AS BIGINT) AS n_tokens FROM documents), " +
        "tot AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS total FROM dt GROUP BY source), " +
        s"w(source, ppm) AS (VALUES $values), " +
        s"tgt AS (SELECT tot.source, total, (CAST($MixtureBudget AS BIGINT) * ppm) // 1000000 AS target " +
        "FROM tot JOIN w USING (source)), " +
        "rules AS (SELECT source, target // total AS copies, " +
        "((target % total) * 1000000) // total AS rem_ppm FROM tgt), " +
        "sel AS (SELECT dt.doc_id, dt.source, dt.n_tokens, " +
        s"copies + CASE WHEN (${hash32Sql("CAST(doc_id AS VARCHAR)")} % 1000000) < rem_ppm " +
        "THEN 1 ELSE 0 END AS c FROM dt JOIN rules USING (source)) " +
        "SELECT doc_id, source, n_tokens, CAST(c AS BIGINT) AS copies FROM sel WHERE c > 0"
    }) { (s, d) =>
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(s, d).select(col("doc_id"), col("source"),
      size(TextQueries.tokensCol(col("text"))).cast("long").as("n_tokens"))
    Sampling.mixtureByTokenBudget(docs, col("source"), col("doc_id"),
        col("n_tokens"), MixtureWeights, MixtureBudget)
      .select("doc_id", "source", "n_tokens", "copies")
  }

  val all: Seq[GraftQuery] =
    Seq(qSampleHash, qSampleStratified, qSampleSplit, qSamplePerKeyCap,
      qSampleMixture)
}

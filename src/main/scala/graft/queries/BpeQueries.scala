package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Bpe, Packing, Sampling, Tokenizer}
import GraftQuery.q

/** BPE subword tokenization queries ([[graft.operators.Bpe]]) — the
  * model-true token surface, value-checked end to end: the DuckDB oracle
  * replays the IDENTICAL greedy merge loop (lowest (rank, position)
  * occurrence, one merge at a time) as a recursive CTE over token lists,
  * so tokens, ids, AND counts hash-match per document. ONE model
  * definition ([[FixedModel]]) drives the Spark kernel's reference
  * object and the generated SQL merge/vocab maps — the two sides cannot
  * drift.
  *
  * The oracle runs the merge loop per DISTINCT word (the corpus
  * dictionary), then joins tokens back to word occurrences — the same
  * word-histogram shape the Spark kernel's memo cache exploits.
  */
object BpeQueries {

  /** The pinned encode-parity model: hand-ordered merges over the
    * corpus's own vocabulary, chosen to exercise every algorithmic
    * property — multi-step chains (`t a`→…→`table`), merges whose RIGHT
    * side is itself a merge product (`qu er`, `fa st`, `b at`), and
    * rank-beats-position cases (`query`: `e r` rank 13 fires before
    * `q u` rank 22 despite sitting later in the word).
    */
  val FixedModel: Bpe.Model = {
    val merges = Seq(
      "t" -> "a", "ta" -> "b", "tab" -> "l", "tabl" -> "e",
      "v" -> "a", "va" -> "l", "val" -> "u", "valu" -> "e",
      "s" -> "c", "sc" -> "a", "sca" -> "n",
      "r" -> "o", "ro" -> "w",
      "e" -> "r", "i" -> "n", "o" -> "r", "a" -> "n",
      "s" -> "t", "a" -> "t",
      "h" -> "a", "ha" -> "s", "has" -> "h",
      "q" -> "u", "qu" -> "er", "quer" -> "y",
      "w" -> "in", "win" -> "d", "wind" -> "o", "windo" -> "w",
      "f" -> "a", "fa" -> "st",
      "b" -> "at", "bat" -> "c", "batc" -> "h")
    val base = (('a' to 'z') ++ ('0' to '9')).map(_.toString)
    val products = merges.map { case (l, r) => l + r }
      .filterNot(base.toSet).distinct
    Bpe.Model(Tokenizer.Ascii.tag, merges, Bpe.UnkToken +: (base ++ products))
  }

  /** `'l r' -> rank` DuckDB MAP literal from the model (word tokens are
    * `[a-z0-9]+` under the ascii rule, so a space separator can never
    * collide with token bytes).
    */
  private def mergeMapSql(m: Bpe.Model): String =
    "MAP {" + m.merges.zipWithIndex
      .map { case ((l, r), i) => s"'$l $r': $i" }.mkString(", ") + "}"

  private def vocabMapSql(m: Bpe.Model): String =
    "MAP {" + m.vocab.zipWithIndex
      .map { case (t, i) => s"'$t': $i" }.mkString(", ") + "}"

  /** The shared oracle chain over a caller-supplied `(doc_id, text)`
    * relation, ending in `agg(doc_id, ts = list of subword tokens)`:
    * distinct words → recursive merge loop → join back to occurrences →
    * per-doc flatten in word order. Prefix with `WITH RECURSIVE `.
    * Shared with `q_curation_pipeline6` (which runs it over the masked,
    * classifier-gated survivor text).
    */
  private[queries] def bpeCtesOver(m: Bpe.Model, docsSql: String): String = {
    val toks = Tokenizer.Ascii.duckSql("text")
    s"bpesrc AS ($docsSql), " +
      s"wd AS (SELECT doc_id, w, wi FROM (SELECT doc_id, unnest($toks) AS w, " +
      s"generate_subscripts($toks, 1) AS wi FROM bpesrc)), " +
      "uw AS (SELECT DISTINCT w FROM wd), " +
      "init AS (SELECT w, list_transform(range(1, len(w)+1), i -> w[i]) " +
      "AS toks, 0 AS step FROM uw), " +
      "steps(w, toks, step) AS (" +
      "SELECT w, toks, step FROM init " +
      "UNION ALL " +
      "SELECT w, (toks[1:pos-1] || [toks[pos] || toks[pos+1]]) || toks[pos+2:], " +
      "step + 1 FROM (" +
      "SELECT w, toks, step, list_position(rks, list_min(rks)) AS pos, " +
      "list_min(rks) AS br FROM (" +
      "SELECT w, toks, step, list_transform(range(1, len(toks)), i -> " +
      s"coalesce(map_extract(${mergeMapSql(m)}, toks[i] || ' ' || toks[i+1])[1], " +
      "1000000)) AS rks FROM steps WHERE len(toks) > 1)" +
      ") WHERE br < 1000000), " +
      "finw AS (SELECT w, max_by(toks, step) AS toks FROM steps GROUP BY w), " +
      "agg AS (SELECT wd.doc_id, flatten(list(finw.toks ORDER BY wd.wi)) " +
      "AS ts FROM wd JOIN finw USING (w) GROUP BY wd.doc_id)"
  }

  private def bpeCtes(m: Bpe.Model): String =
    bpeCtesOver(m, "SELECT doc_id, text FROM documents")

  /** BPE token-count CTE over the chain: every document, zero for
    * token-less ones (the kernel's empty-array contract).
    */
  private def cntCte: String =
    "cnt AS (SELECT d.doc_id, d.source, CAST(coalesce(len(ts), 0) AS BIGINT) " +
      "AS n_tokens FROM documents d LEFT JOIN agg USING (doc_id))"

  /** Subword tokens, ids, and counts per document — full encode parity
    * (the [[Bpe.tokens]]/[[Bpe.ids]] kernels vs the recursive-CTE
    * replay; token and id streams compared as joined strings).
    */
  val qBpeTokens = q(
    "q_bpe_tokens",
    s"WITH RECURSIVE ${bpeCtes(FixedModel)} " +
      "SELECT d.doc_id, CAST(coalesce(len(ts), 0) AS BIGINT) AS n_bpe, " +
      "coalesce(array_to_string(ts, ' '), '') AS toks_str, " +
      "coalesce(array_to_string(list_transform(ts, t -> " +
      s"CAST(coalesce(map_extract(${vocabMapSql(FixedModel)}, t)[1], 0) " +
      "AS VARCHAR)), ' '), '') AS ids_str " +
      "FROM documents d LEFT JOIN agg USING (doc_id)") { (s, d) =>
    Tables.documents(s, d).select(
      col("doc_id"),
      size(Bpe.tokens(col("text"), FixedModel)).cast("long").as("n_bpe"),
      array_join(Bpe.tokens(col("text"), FixedModel), " ").as("toks_str"),
      array_join(transform(Bpe.ids(col("text"), FixedModel),
        _.cast("string")), " ").as("ids_str"))
  }

  /** Training-sequence packing by MODEL-TRUE counts: [[Bpe.tokenCount]]
    * feeding [[Packing.packCounts]] unchanged — the documented "swap in
    * a real tokenizer" seam, value-checked (the oracle recomputes BPE
    * counts via the CTE chain and replays the identical running-sum
    * packing rule).
    */
  val qBpePack = q(
    "q_bpe_pack",
    s"WITH RECURSIVE ${bpeCtes(FixedModel)}, $cntCte, " +
      "c2 AS (SELECT doc_id, source, n_tokens, sum(n_tokens) OVER " +
      "(PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) " +
      "AS cum FROM cnt) " +
      "SELECT doc_id, source, n_tokens, " +
      "CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS seq_id FROM c2") {
    (s, d) =>
      Packing.packCounts(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          Bpe.tokenCount(col("text"), FixedModel).as("n_tokens")),
        "doc_id", "source", "n_tokens", 512L)
  }

  /** Token-budget mixture sampling by MODEL-TRUE counts:
    * [[Bpe.tokenCount]] feeding [[Sampling.mixtureByTokenBudget]] with
    * the shared mixture rule ([[SamplingQueries.mixtureCtesFrom]]) —
    * budget arithmetic now counts the tokens a model would actually
    * consume.
    */
  val qBpeMixture = q(
    "q_bpe_mixture",
    s"WITH RECURSIVE ${bpeCtes(FixedModel)}, $cntCte, " +
      SamplingQueries.mixtureCtesFrom(
        "SELECT doc_id, source, n_tokens FROM cnt") +
      " SELECT doc_id, source, n_tokens, copies FROM m") { (s, d) =>
    Sampling.mixtureByTokenBudget(
      Tables.documents(s, d).select(col("doc_id"), col("source"),
        Bpe.tokenCount(col("text"), FixedModel).as("n_tokens")),
      col("source"), col("doc_id"), col("n_tokens"),
      SamplingQueries.MixtureWeights, SamplingQueries.MixtureBudget)
      .select("doc_id", "source", "n_tokens", "copies")
  }

  /** Distributed BPE TRAINING end to end: fit on the corpus (one
    * word-histogram shuffle + driver merge loop), persist, re-read, and
    * emit the learned merge table — rows-only (merge training is an
    * iterative global argmax; no SQL mirror exists), with the learned
    * rules' CORRECTNESS locked by `BpeSpec`'s hand-derived fixtures and
    * the encode path locked by the three oracle entries above.
    */
  val qBpeFit = GraftQuery.rowsOnly("q_bpe_fit") { (s, d) =>
    val model = Bpe.fit(Tables.documents(s, d), "text", numMerges = 24)
    val dir = TextQueries.scratchDir("graft_bpe_model", d)
    Bpe.writeModel(s, model, dir)
    val back = Bpe.readModel(s, dir)
    require(back == model,
      "q_bpe_fit: model roundtrip mismatch — persistence is lossy")
    import s.implicits._
    model.merges.zipWithIndex
      .map { case ((l, r), i) => (i.toLong, l, r, l + r) }
      .toDF("rank", "left", "right", "product")
  }

  val all: Seq[GraftQuery] = Seq(qBpeTokens, qBpePack, qBpeMixture, qBpeFit)
}

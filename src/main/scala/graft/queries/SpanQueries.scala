package graft.queries

import graft.Tables
import graft.operators.SpanDedup
import GraftQuery.q
import TextQueries.tokensSql

/** Substring-level (duplicated token span) deduplication queries —
  * [[SpanDedup]], the Lee et al. ACL'22 ExactSubstr recipe. All queries are
  * fully oracle-checked: window positions, island merging, the keep-first
  * exemption, and the rebuilt clean text are integer/string-exact on both
  * engines (md5 gram hashes, 0-based token indices, end-exclusive spans).
  * The oracle computes the NAIVE doc-level semantics; the Spark side runs
  * the exact-content-collapsed plan — their equality is exactly the
  * collapse-is-semantics-preserving claim, re-proven per round on real
  * data.
  */
object SpanQueries {

  private val N = 5       // tokens per window
  private val MinDocs = 2 // distinct docs for a window to count as duplicated

  /** Shared oracle CTE chain: tokens → positioned n-gram hashes → cross-doc
    * duplicated hashes (with each hash's first-occurrence KEEPER doc).
    * DuckDB list slicing `t[i:i+k]` is 1-based inclusive; `s = i - 1`
    * converts to the 0-based token positions the Spark side emits.
    */
  private val baseCtes: String =
    s"d2 AS (SELECT doc_id, $tokensSql AS t FROM documents), " +
      s"g AS (SELECT doc_id, unnest(range(1, len(t) - ${N - 2})) AS i, t " +
      s"FROM d2 WHERE len(t) >= $N), " +
      "g2 AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS s, " +
      s"md5(array_to_string(t[i:i+${N - 1}], ' ')) AS h FROM g), " +
      "dup AS (SELECT h, min(doc_id) AS keep FROM (SELECT DISTINCT doc_id, h FROM g2) " +
      s"GROUP BY h HAVING count(*) >= $MinDocs)"

  /** Gaps-and-islands merge of a positioned-hits CTE named `hits`
    * (doc_id, s, e) into merged `spans` (doc_id, span_start, span_end).
    */
  private val islandCtes: String =
    "isl AS (SELECT doc_id, s, e, CASE WHEN s > coalesce(max(e) OVER (" +
      "PARTITION BY doc_id ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND " +
      "1 PRECEDING), -1) THEN 1 ELSE 0 END AS ng FROM hits), " +
      "grps AS (SELECT doc_id, s, e, sum(ng) OVER (PARTITION BY doc_id " +
      "ORDER BY s ROWS UNBOUNDED PRECEDING) AS grp FROM isl), " +
      "spans AS (SELECT doc_id, min(s) AS span_start, max(e) AS span_end " +
      "FROM grps GROUP BY doc_id, grp)"

  /** Token-level rebuild as a CTE chain ending in `cleaned` (doc_id,
    * clean_text, n_removed): cut every position covered by a `spans`
    * interval, rejoin survivors, count removals; one row per document.
    */
  private val cutCtes: String =
    "tokpos AS (SELECT doc_id, unnest(range(1, len(t)+1)) AS i, t FROM d2), " +
      "tk AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS p, t[i] AS tok FROM tokpos), " +
      "cov AS (SELECT tk.doc_id, p, tok, EXISTS (SELECT 1 FROM spans sp " +
      "WHERE sp.doc_id = tk.doc_id AND p >= sp.span_start AND p < sp.span_end) AS c " +
      "FROM tk), " +
      "agg AS (SELECT doc_id, " +
      "coalesce(string_agg(tok, ' ' ORDER BY p) FILTER (WHERE NOT c), '') AS clean_text, " +
      "CAST(count(*) FILTER (WHERE c) AS BIGINT) AS n_removed FROM cov GROUP BY doc_id), " +
      "cleaned AS (SELECT d.doc_id, coalesce(a.clean_text, '') AS clean_text, " +
      "CAST(coalesce(a.n_removed, 0) AS BIGINT) AS n_removed " +
      "FROM (SELECT doc_id FROM documents) d LEFT JOIN agg a USING (doc_id))"

  private val cutSelect: String =
    "SELECT doc_id, clean_text, n_removed FROM cleaned"

  /** Full keep-first cleaning pipeline as a reusable CTE chain ending in
    * `cleaned` — the oracle building block for composed curation queries
    * (see `q_curation_pipeline2`).
    */
  private[queries] val keep1CleanedCtes: String =
    s"$baseCtes, " +
      "hits AS (SELECT doc_id, s, s + " + N + " AS e FROM g2 JOIN dup USING (h) " +
      "WHERE doc_id <> keep), " +
      s"$islandCtes, $cutCtes"

  /** Spark side of the keep-first cleaning (shared with the composed
    * pipeline).
    */
  private[queries] def keep1CleanedDf(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    SpanDedup.removeDuplicateSpansKeepFirst(
      Tables.documentsBalanced(s, d), "doc_id", "text", N, MinDocs)

  /** Maximal duplicated 5-token spans per document (0-based, end-exclusive
    * token indices) — the detection half of substring dedup.
    */
  val qDedupSpans = q(
    "q_dedup_spans",
    s"WITH $baseCtes, " +
      "hits AS (SELECT doc_id, s, s + " + N + " AS e FROM g2 JOIN dup USING (h)), " +
      s"$islandCtes " +
      "SELECT doc_id, CAST(span_start AS BIGINT) AS span_start, " +
      "CAST(span_end AS BIGINT) AS span_end FROM spans") { (s, d) =>
    SpanDedup.duplicateTokenSpans(
      Tables.documentsBalanced(s, d), "doc_id", "text", N, MinDocs)
  }

  /** Duplicated spans cut out of every document: surviving normalized
    * tokens rejoined, plus the removed-token count — the rewrite half.
    */
  val qDedupSpanClean = q(
    "q_dedup_span_clean",
    s"WITH $baseCtes, " +
      "hits AS (SELECT doc_id, s, s + " + N + " AS e FROM g2 JOIN dup USING (h)), " +
      s"$islandCtes, $cutCtes $cutSelect") { (s, d) =>
    SpanDedup.removeDuplicateSpans(
      Tables.documentsBalanced(s, d), "doc_id", "text", N, MinDocs)
  }

  /** The published keep-one policy: every duplicated window survives in its
    * first-occurrence (lowest-id) document and is cut everywhere else. The
    * oracle's one-line difference vs `q_dedup_span_clean` — hits exclude
    * the keeper doc — meets the Spark side's two-cut-set collapsed plan.
    */
  val qDedupSpanKeep1 = q(
    "q_dedup_span_keep1",
    s"WITH $keep1CleanedCtes $cutSelect") { (s, d) => keep1CleanedDf(s, d) }

  val all: Seq[GraftQuery] = Seq(qDedupSpans, qDedupSpanClean, qDedupSpanKeep1)
}

package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import GraftQuery.{q, rowsOnly}

/** Text-analysis + deduplication operators for the training-data pipeline:
  * exact dedup, fingerprint dedup, MinHash signatures (LSH dedup in
  * [[graft.operators.Dedup]]), SimHash, language-ID heuristic, quality
  * scoring, token counting. All integer/hash arithmetic is chosen so DuckDB
  * can reproduce results bit-for-bit (md5-derived hashes, integer-ratio
  * comparisons instead of float thresholds).
  */
object TextQueries {

  /** Shared English stopword list for the language-ID heuristic and the
    * curation pipeline — ONE definition drives both the Spark plans and the
    * DuckDB oracle SQL, so the two sides cannot drift.
    */
  val CurationStops: Seq[String] =
    Seq("the", "a", "of", "and", "to", "in", "is", "for", "on", "with")

  /** Mersenne prime 2^31−1: (a·h+b) mod P stays below 2^62 — no int64 overflow
    * in either engine.
    */
  val P: Long = 2147483647L
  val NumPerm = 32

  /** Deterministic permutation constants shared by the Spark plan and the
    * DuckDB oracle (both sides are generated from this seq).
    */
  val perms: Seq[(Long, Long)] = (0 until NumPerm).map { j =>
    val a = ((j * 2654435761L + 1013904223L) % (P - 1)) + 1
    val b = (j * 97531L * 65537L + 12345L) % P
    (a, b)
  }

  // ---- shared normalization (identical on both engines) ----

  /** lowercase, strip non-alnum to space, split, drop empties. */
  def tokensCol(text: Column): Column =
    filter(split(regexp_replace(lower(text), "[^a-z0-9]+", " "), " "), _ =!= "")

  def tokensSqlCol(c: String): String =
    s"list_filter(string_split(regexp_replace(lower($c), '[^a-z0-9]+', ' ', 'g'), ' '), x -> x <> '')"

  val tokensSql = tokensSqlCol("text")

  /** first 8 hex chars of md5 as int64 (0 .. 2^32) — the native codegen'd
    * [[graft.functions.Md5Prefix32]] expression (registered by Tables.load /
    * the Dedup operators; semantically identical to
    * `conv(substring(md5(c), 1, 8), 16, 10)`).
    */
  def hash32(c: Column): Column = graft.functions.Md5Prefix32.md5Prefix32(c)

  def hash32Sql(e: String): String = s"CAST(('0x' || substr(md5($e), 1, 8)) AS BIGINT)"

  // ---- exact + fingerprint dedup ----

  /** Exact dedup: hash-groupBy on content hash; survivor = min doc_id.
    * At 100 TB this is one shuffle on a 128-bit hash — the canonical pattern.
    */
  val qDedupExact = q(
    "q_dedup_exact",
    "SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*) AS dups " +
      "FROM documents GROUP BY 1") { (s, d) =>
    Tables.documents(s, d)
      .groupBy(md5(col("text")).as("h"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dups"))
  }

  /** Fingerprint dedup: md5 over sorted distinct normalized tokens — catches
    * word-order/punctuation variants that exact hashing misses.
    */
  val qDedupFingerprint = q(
    "q_dedup_fingerprint",
    "SELECT fp, min(doc_id) AS keep_id, count(*) AS dups FROM (" +
      s"SELECT doc_id, md5(array_to_string(list_sort(list_distinct($tokensSql)), ' ')) AS fp " +
      "FROM documents) GROUP BY fp") { (s, d) =>
    Tables.documentsBalanced(s, d)
      .select(col("doc_id"),
        md5(concat_ws(" ", array_sort(array_distinct(tokensCol(col("text")))))).as("fp"))
      .groupBy("fp")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("dups"))
  }

  // ---- MinHash ----

  /** 3-word shingles of the normalized tokens (docs with <3 tokens dropped:
    * [[ngramsCol]] yields an empty array there and `explode` drops it).
    */
  def shinglesDf(s: SparkSession, d: String): DataFrame =
    Tables.documentsBalanced(s, d)
      .select(col("doc_id"), explode(ngramsCol(col("text"), 3)).as("s"))

  val shinglesSql: String =
    s"SELECT doc_id, unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)]) AS s " +
      s"FROM (SELECT doc_id, $tokensSql AS t FROM documents) WHERE len(t) >= 3"

  /** MinHash signature digest: per doc, sum of the 32 per-permutation minima
    * min_j((a_j·h + b_j) mod P). The digest oracle-verifies the full
    * signature computation; the LSH banding/dedup built on it is
    * `q_dedup_minhash` below.
    */
  val qMinhashSig = q(
    "q_minhash_sig", {
      val mins = perms.zipWithIndex.map { case ((a, b), j) =>
        s"min(($a * h + $b) % $P) AS m$j"
      }.mkString(", ")
      val sumExpr = (0 until NumPerm).map(j => s"m$j").mkString(" + ")
      s"SELECT doc_id, $sumExpr AS sig_sum FROM (" +
        s"SELECT doc_id, $mins FROM (" +
        s"SELECT doc_id, ${hash32Sql("s")} % $P AS h FROM ($shinglesSql)) " +
        "GROUP BY doc_id)"
    }) { (s, d) =>
    graft.operators.Dedup.minhashSignatures(
      Tables.documentsBalanced(s, d), "doc_id", "text")
      .select(col("doc_id"),
        (0 until NumPerm).map(j => col(s"m$j")).reduce(_ + _).as("sig_sum"))
  }

  /** MinHash-LSH near-dup candidate pairs: 8 bands × 4 rows; a pair is a
    * candidate if any band agrees; verified with the estimated Jaccard
    * (fraction of agreeing permutations ≥ 0.5). Distributed shape: shuffle on
    * band-hash (bounded buckets), never an all-pairs join.
    */
  /** Shared CTE list for the MinHash-LSH pair pipeline (sigs → bands → cand)
    * plus the agreeing-permutation count — one definition drives both
    * `q_dedup_minhash` and the cluster query's recursive oracle.
    */
  private lazy val minhashAgreeSql: String =
    (0 until NumPerm).map(j => s"CASE WHEN a.m$j = b.m$j THEN 1 ELSE 0 END")
      .mkString(" + ")
  /** The sigs/bands/cand CTE chain over an arbitrary shingle SELECT —
    * the ascii default and the unicode-tokenized variant share one
    * definition so the banding/perm arithmetic cannot drift.
    */
  private def minhashCtesSqlOver(shingles: String): String = {
    val mins = perms.zipWithIndex.map { case ((a, b), j) =>
      s"min(($a * h + $b) % $P) AS m$j"
    }.mkString(", ")
    val sigs = s"SELECT doc_id, $mins FROM (SELECT doc_id, ${hash32Sql("s")} % $P AS h " +
      s"FROM ($shingles)) GROUP BY doc_id"
    val bands = (0 until 8).map { bnd =>
      val cols = (0 until 4).map(r => s"m${bnd * 4 + r}").mkString(", ")
      s"SELECT doc_id, $bnd AS band, md5(concat_ws(',', $cols)) AS bh FROM sigs"
    }.mkString(" UNION ALL ")
    s"sigs AS ($sigs), bands AS ($bands), " +
      "cand AS (SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb FROM bands x " +
      "JOIN bands y ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id)"
  }
  private lazy val minhashCtesSql: String = minhashCtesSqlOver(shinglesSql)

  val qDedupMinhash = q(
    "q_dedup_minhash",
    s"WITH $minhashCtesSql " +
      s"SELECT ida, idb, ($minhashAgreeSql) AS agreeing FROM cand " +
      "JOIN sigs a ON a.doc_id = ida JOIN sigs b ON b.doc_id = idb " +
      s"WHERE ($minhashAgreeSql) * 2 >= $NumPerm") { (s, d) =>
    graft.operators.Dedup.nearDuplicates(
      Tables.documentsBalanced(s, d), "doc_id", "text", minAgreeFraction = 0.5)
  }

  /** Near-dup PAIRS → dedup CLUSTERS: every doc labelled with the minimum
    * doc_id of its connected component over the MinHash-LSH near-dup graph
    * (pair-free docs are their own rep). Spark side: iterative min-label
    * propagation ([[graft.operators.Dedup.connectedComponents]]); oracle:
    * DuckDB recursive CTE transitive closure over the identical pair SQL.
    */
  val qDedupClusters = q(
    "q_dedup_clusters",
    s"WITH RECURSIVE $minhashCtesSql, " +
      s"pairs AS (SELECT ida, idb FROM cand " +
      "JOIN sigs a ON a.doc_id = ida JOIN sigs b ON b.doc_id = idb " +
      s"WHERE ($minhashAgreeSql) * 2 >= $NumPerm), " +
      "e(na, nb) AS (SELECT ida, idb FROM pairs UNION SELECT idb, ida FROM pairs), " +
      "reach(na, nb) AS (SELECT na, nb FROM e " +
      "UNION SELECT r.na, e2.nb FROM reach r JOIN e e2 ON r.nb = e2.na) " +
      "SELECT d.doc_id, CAST(least(d.doc_id, coalesce(min(r.nb), d.doc_id)) AS BIGINT) AS rep " +
      "FROM documents d LEFT JOIN reach r ON r.na = d.doc_id GROUP BY d.doc_id") { (s, d) =>
    val docs = Tables.documentsBalanced(s, d)
    val pairs = graft.operators.Dedup.nearDuplicates(
      docs, "doc_id", "text", minAgreeFraction = 0.5)
    graft.operators.Dedup.connectedComponents(pairs, docs, "doc_id")
  }

  /** One-call near-dup DEDUPLICATION end to end
    * ([[graft.operators.Dedup.dedupNear]]): MinHash-LSH pairs → connected
    * components → keep each component's minimum id. The oracle composes the
    * same recursive closure as [[qDedupClusters]] and keeps self-rep docs —
    * so the full pipeline (not just its stages) is hash-checked.
    */
  val qDedupNear = q(
    "q_dedup_near",
    s"WITH RECURSIVE $minhashCtesSql, " +
      s"pairs AS (SELECT ida, idb FROM cand " +
      "JOIN sigs a ON a.doc_id = ida JOIN sigs b ON b.doc_id = idb " +
      s"WHERE ($minhashAgreeSql) * 2 >= $NumPerm), " +
      "e(na, nb) AS (SELECT ida, idb FROM pairs UNION SELECT idb, ida FROM pairs), " +
      "reach(na, nb) AS (SELECT na, nb FROM e " +
      "UNION SELECT r.na, e2.nb FROM reach r JOIN e e2 ON r.nb = e2.na), " +
      "reps AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.nb), d.doc_id)) AS rep " +
      "FROM documents d LEFT JOIN reach r ON r.na = d.doc_id GROUP BY d.doc_id) " +
      "SELECT doc_id, n_chars FROM documents " +
      "WHERE doc_id IN (SELECT doc_id FROM reps WHERE rep = doc_id)") { (s, d) =>
    graft.operators.Dedup
      .dedupNear(Tables.documentsBalanced(s, d), "doc_id", "text",
        minAgreeFraction = 0.5)
      .select("doc_id", "n_chars")
  }

  /** Leakage-free split ([[graft.operators.Dedup.assignSplitLeakFree]]):
    * 90/5/5 train/val/test assigned by the near-dup CLUSTER rep's hash
    * range, so no near-duplicate pair ever straddles train and eval. The
    * oracle composes the same recursive transitive closure as
    * `q_dedup_clusters` with the same md5 bucket rule as `q_sample_split`
    * — checking per doc that the rep AND the inherited split both match.
    */
  val qSplitLeakfree = q(
    "q_split_leakfree",
    s"WITH RECURSIVE $minhashCtesSql, " +
      s"pairs AS (SELECT ida, idb FROM cand " +
      "JOIN sigs a ON a.doc_id = ida JOIN sigs b ON b.doc_id = idb " +
      s"WHERE ($minhashAgreeSql) * 2 >= $NumPerm), " +
      "e(na, nb) AS (SELECT ida, idb FROM pairs UNION SELECT idb, ida FROM pairs), " +
      "reach(na, nb) AS (SELECT na, nb FROM e " +
      "UNION SELECT r.na, e2.nb FROM reach r JOIN e e2 ON r.nb = e2.na), " +
      "reps AS (SELECT d.doc_id, CAST(least(d.doc_id, coalesce(min(r.nb), d.doc_id)) AS BIGINT) AS rep " +
      "FROM documents d LEFT JOIN reach r ON r.na = d.doc_id GROUP BY d.doc_id) " +
      s"SELECT doc_id, rep, CASE WHEN (${hash32Sql("CAST(rep AS VARCHAR)")} % 1000) < 900 THEN 'train' " +
      s"WHEN (${hash32Sql("CAST(rep AS VARCHAR)")} % 1000) < 950 THEN 'val' " +
      "ELSE 'test' END AS split FROM reps") { (s, d) =>
    graft.operators.Dedup
      .assignSplitLeakFree(Tables.documentsBalanced(s, d), "doc_id", "text",
        Seq(("train", 900), ("val", 950), ("test", 1000)),
        minAgreeFraction = 0.5)
      .select("doc_id", "rep", "split")
  }

  /** Winnowing fingerprints ([[graft.operators.Dedup.winnowFingerprints]],
    * Schleimer et al. SIGMOD'03): char-8-gram rolling hashes, minimum per
    * 4-window, distinct. The oracle recomputes the identical hash
    * (md5-prefix over the same character substrings) and window minima
    * with list comprehensions; the digest is (count, sum) of the
    * fingerprint set — integer-exact.
    */
  /** Shared winnowing CTE chain (`g` → `wins` → `fp(doc_id, fps)`) — one
    * definition drives both winnow oracles.
    */
  private def winnowCtesSql(k: Int, w: Int): String =
    s"g AS (SELECT doc_id, [${hash32Sql(s"substr(text, i, $k)")} " +
      s"for i in range(1, length(text) - $k + 2)] AS gs " +
      s"FROM documents WHERE length(text) >= $k), " +
      s"wins AS (SELECT doc_id, CASE WHEN len(gs) >= $w THEN " +
      s"[list_min(gs[j:j+${w - 1}]) for j in range(1, len(gs) - $w + 2)] " +
      "ELSE [list_min(gs)] END AS ws FROM g), " +
      "fp AS (SELECT doc_id, list_sort(list_distinct(ws)) AS fps FROM wins)"

  val qWinnowFingerprint = q(
    "q_winnow_fingerprint",
    s"WITH ${winnowCtesSql(8, 4)} " +
      "SELECT doc_id, len(fps) AS n_fp, CAST(list_sum(fps) AS BIGINT) AS fp_sum FROM fp") { (s, d) =>
    graft.operators.Dedup
      .winnowFingerprints(Tables.documentsBalanced(s, d), "doc_id", "text")
      .select(col("doc_id"), size(col("fingerprints")).as("n_fp"),
        aggregate(col("fingerprints"), lit(0L), _ + _).as("fp_sum"))
  }

  /** MOSS-style winnow-overlap pairs
    * ([[graft.operators.Dedup.winnowOverlapPairs]]): docs sharing ≥ 2
    * df-capped SPARSE winnowing fingerprints (k = w = 16, cap 16), with
    * shared/union counts. The
    * oracle recomputes the identical fingerprints, applies the same df
    * cap, and self-joins — the operator's one-shuffle run scan must match
    * it exactly.
    */
  val qWinnowPairs = q(
    "q_winnow_pairs", {
      val maxDf = 16
      s"WITH ${winnowCtesSql(16, 16)}, " +
        "fpx AS (SELECT doc_id, unnest(fps) AS fp FROM fp), " +
        s"keep AS (SELECT fp FROM fpx GROUP BY fp HAVING count(*) <= $maxDf), " +
        "fx AS (SELECT doc_id, fp FROM fpx JOIN keep USING (fp)), " +
        "inter AS (SELECT x.doc_id AS ida, y.doc_id AS idb, count(*) AS shared " +
        "FROM fx x JOIN fx y ON x.fp = y.fp AND x.doc_id < y.doc_id GROUP BY 1, 2), " +
        "sz AS (SELECT doc_id, count(*) AS n FROM fx GROUP BY doc_id) " +
        "SELECT ida, idb, shared, na.n + nb.n - shared AS u FROM inter " +
        "JOIN sz na ON na.doc_id = ida JOIN sz nb ON nb.doc_id = idb " +
        "WHERE shared >= 2"
    }) { (s, d) =>
    graft.operators.Dedup.winnowOverlapPairs(
      Tables.documentsBalanced(s, d), "doc_id", "text")
  }

  /** [[graft.operators.Dedup.dedupNearBy]]: same pipeline as
    * [[qDedupNear]] but the survivor is each cluster's LONGEST doc
    * (max n_chars, tie → lowest id) instead of its minimum id — the
    * survivor-policy form. Oracle: identical recursive closure, arg-max
    * via QUALIFY row_number per component.
    */
  val qDedupNearBest = q(
    "q_dedup_near_best",
    s"WITH RECURSIVE $minhashCtesSql, " +
      s"pairs AS (SELECT ida, idb FROM cand " +
      "JOIN sigs a ON a.doc_id = ida JOIN sigs b ON b.doc_id = idb " +
      s"WHERE ($minhashAgreeSql) * 2 >= $NumPerm), " +
      "e(na, nb) AS (SELECT ida, idb FROM pairs UNION SELECT idb, ida FROM pairs), " +
      "reach(na, nb) AS (SELECT na, nb FROM e " +
      "UNION SELECT r.na, e2.nb FROM reach r JOIN e e2 ON r.nb = e2.na), " +
      "reps AS (SELECT d.doc_id, least(d.doc_id, coalesce(min(r.nb), d.doc_id)) AS rep " +
      "FROM documents d LEFT JOIN reach r ON r.na = d.doc_id GROUP BY d.doc_id) " +
      "SELECT doc_id, n_chars FROM (SELECT d.doc_id, d.n_chars FROM documents d " +
      "JOIN reps USING (doc_id) QUALIFY row_number() OVER " +
      "(PARTITION BY reps.rep ORDER BY d.n_chars DESC, d.doc_id) = 1)") { (s, d) =>
    graft.operators.Dedup
      .dedupNearBy(Tables.documentsBalanced(s, d), "doc_id", "text",
        keepBy = col("n_chars"), minAgreeFraction = 0.5)
      .select("doc_id", "n_chars")
  }

  /** INCREMENTAL dedup against a persisted signature index
    * ([[graft.operators.Dedup.writeSignatureIndex]] /
    * [[graft.operators.Dedup.dedupAgainstIndex]]): the corpus (doc_id % 7
    * ≠ 0) is indexed once; the ingest batch (doc_id % 7 = 0) is flagged
    * against it with an index scan pruned to the batch's (band, bucket)
    * keys — the corpus side never shuffles. The Spark leg includes the
    * index WRITE (honest end-to-end cost); the oracle recomputes both
    * sides' signatures and joins them directly.
    */
  val qDedupIncremental = q(
    "q_dedup_incremental",
    s"WITH $minhashCtesSql, " +
      "m AS (SELECT DISTINCT n.doc_id AS doc_id, c.doc_id AS corpus_id " +
      "FROM bands n JOIN bands c ON n.band = c.band AND n.bh = c.bh " +
      "WHERE n.doc_id % 7 = 0 AND c.doc_id % 7 <> 0) " +
      s"SELECT m.doc_id, m.corpus_id, ($minhashAgreeSql) AS agreeing " +
      "FROM m JOIN sigs a ON a.doc_id = m.doc_id " +
      "JOIN sigs b ON b.doc_id = m.corpus_id " +
      s"WHERE ($minhashAgreeSql) * 2 >= $NumPerm") { (s, d) =>
    val docs = Tables.documentsBalanced(s, d)
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val batch = docs.filter(col("doc_id") % 7 === 0)
    // deterministic per-(dataset, JVM) path + overwrite mode: bench reps
    // and repeated verify runs within one process rewrite ONE directory
    // instead of accreting a fresh index copy per invocation — while the
    // pid suffix keeps concurrent processes (bench vs verify, multi-user
    // /tmp) from overwriting an index the other is mid-scan
    val idx = scratchDir("graft_sigidx", d)
    graft.operators.Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx)
    graft.operators.Dedup.dedupAgainstIndex(batch, "doc_id", "text", idx)
  }

  /** INCREMENTAL MinHash dedup under the UNICODE tokenizer
    * ([[graft.operators.Tokenizer.Unicode]] threaded through
    * [[graft.operators.Dedup.writeSignatureIndex]], the tag persisted in
    * the index meta and resolved — not passed — by the probe, the
    * `q_bm25_unicode` pattern for the dedup family). The corpus text gets
    * every 'a' accented to 'á' so the rule is LOAD-BEARING: the ascii
    * default treats 'á' as a separator (splitting words, different
    * shingles, different signatures), so an implementation that dropped
    * the tokenizer anywhere — signature, banding, probe side — would
    * hash-mismatch. The oracle recomputes the whole unicode pipeline:
    * same shingles, same perm minima, same banding, same agreement rule.
    */
  val qDedupMinhashUnicode = q(
    "q_dedup_minhash_unicode", {
      val toksU = graft.operators.Tokenizer.Unicode(casefold = true)
        .duckSql("regexp_replace(text, 'a', 'á', 'g')")
      val shingles =
        "SELECT doc_id, unnest([array_to_string(t[i:i+2], ' ') for i in range(1, len(t)-1)]) AS s " +
          s"FROM (SELECT doc_id, $toksU AS t FROM documents) WHERE len(t) >= 3"
      s"WITH ${minhashCtesSqlOver(shingles)}, " +
        "m AS (SELECT DISTINCT n.doc_id AS doc_id, c.doc_id AS corpus_id " +
        "FROM bands n JOIN bands c ON n.band = c.band AND n.bh = c.bh " +
        "WHERE n.doc_id % 7 = 0 AND c.doc_id % 7 <> 0) " +
        s"SELECT m.doc_id, m.corpus_id, ($minhashAgreeSql) AS agreeing " +
        "FROM m JOIN sigs a ON a.doc_id = m.doc_id " +
        "JOIN sigs b ON b.doc_id = m.corpus_id " +
        s"WHERE ($minhashAgreeSql) * 2 >= $NumPerm"
    }) { (s, d) =>
    import graft.operators.{Dedup, Tokenizer}
    val docs = Tables.documentsBalanced(s, d)
      .withColumn("text", regexp_replace(col("text"), "a", "á"))
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val batch = docs.filter(col("doc_id") % 7 === 0)
    val idx = scratchDir("graft_sigidx_u", d)
    Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx,
      tokenizer = Tokenizer.Unicode(casefold = true))
    // the probe resolves the tokenizer from the index's own meta
    Dedup.dedupAgainstIndex(batch, "doc_id", "text", idx)
  }

  /** pid-suffixed scratch dirs (signature indexes) registered here are
    * recursively deleted when the JVM exits, so a bench+verify cycle
    * leaves no orphan `/tmp/graft_sigidx_*` dirs behind. Deterministic
    * per-(tag, dataset, pid) naming keeps in-process reuse (overwrite
    * mode) while isolating concurrent processes.
    */
  private object ScratchDirs {
    private val paths = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    java.lang.Runtime.getRuntime.addShutdownHook(new Thread(() =>
      paths.forEach { p =>
        def rm(f: java.io.File): Unit = {
          val kids = f.listFiles()
          if (kids != null) kids.foreach(rm)
          f.delete(): Unit
        }
        rm(new java.io.File(p))
      }))
    def register(path: String): String = { paths.add(path); path }
    def snapshot(): Map[String, (Long, Long)] = {
      val out = Map.newBuilder[String, (Long, Long)]
      paths.forEach { p =>
        val root = new java.io.File(p)
        if (root.exists()) {
          var dirs = 0L; var files = 0L
          def walk(f: java.io.File): Unit =
            if (f.isDirectory) {
              dirs += 1
              val kids = f.listFiles()
              if (kids != null) kids.foreach(walk)
            } else files += 1
          walk(root)
          out += p -> (dirs, files)
        }
      }
      out.result()
    }
  }

  /** Live (dir count, file count) per registered scratch path — the
    * bench harness's accretion guard: an incremental-index entry that
    * leaves MORE subtrees or files after rep i than after rep 1 is
    * accreting state across reps (its per-rep timings would then
    * measure a growing index, not the operator), and the guard turns
    * that from a rep-pattern ambiguity (load spike? leak?) into a
    * structural failure naming the path.
    */
  private[graft] def scratchSnapshot(): Map[String, (Long, Long)] =
    ScratchDirs.snapshot()

  /** Paths whose (dirs, files) counts CHANGED between two snapshots —
    * empty means state held still. Symmetric over the key union: a
    * registered root deleted wholesale between reps (absent from
    * `after`) is reported too — a delete-then-recreate rep sequence
    * must not slip past the guard just because the final listing looks
    * similar. A path absent from `before` (first materialization
    * happens inside rep 1) is compared against its FIRST appearance,
    * which callers provide by re-baselining after rep 1.
    */
  private[graft] def scratchDelta(before: Map[String, (Long, Long)],
      after: Map[String, (Long, Long)]): Seq[String] =
    (before.keySet ++ after.keySet).toSeq.sorted.flatMap { p =>
      (before.get(p), after.get(p)) match {
        case (Some((d0, f0)), Some((d1, f1))) if d0 != d1 || f0 != f1 =>
          Some(s"$p: dirs $d0 -> $d1, files $f0 -> $f1")
        case (Some((d0, f0)), None) =>
          Some(s"$p: dirs $d0 -> GONE, files $f0 -> GONE (root deleted)")
        case _ => None // equal, or first appearance (caller re-baselines)
      }
    }

  private[queries] def scratchDir(tag: String, d: String): String =
    ScratchDirs.register(
      s"${System.getProperty("java.io.tmpdir")}/${tag}_" +
        java.lang.Integer.toHexString(d.hashCode) + "_" +
        ProcessHandle.current().pid())

  /** TWO-BATCH sequential ingest against the signature index
    * ([[graft.operators.Dedup.appendToSignatureIndex]]): the corpus
    * (doc_id % 7 ≥ 2) is indexed; batch 1 (doc_id % 7 = 1) is cleaned
    * against it and its CLEAN docs' signatures are APPENDED; batch 2
    * (doc_id % 7 = 0) then probes the grown index — so a batch-2 doc whose
    * only near-dup arrived in batch 1 is caught without any corpus
    * rewrite. The oracle recomputes both probe legs directly: flagged
    * batch-1 docs, the surviving index membership, then batch 2's matches
    * against it.
    */
  val qDedupIncremental2 = q(
    "q_dedup_incremental2",
    s"WITH $minhashCtesSql, " +
      "c1 AS (SELECT DISTINCT n.doc_id AS nid, c.doc_id AS cid " +
      "FROM bands n JOIN bands c ON n.band = c.band AND n.bh = c.bh " +
      "WHERE n.doc_id % 7 = 1 AND c.doc_id % 7 NOT IN (0, 1)), " +
      "flag1 AS (SELECT DISTINCT c1.nid AS doc_id FROM c1 " +
      "JOIN sigs a ON a.doc_id = c1.nid JOIN sigs b ON b.doc_id = c1.cid " +
      s"WHERE ($minhashAgreeSql) * 2 >= $NumPerm), " +
      "idx AS (SELECT doc_id FROM documents WHERE doc_id % 7 NOT IN (0, 1) " +
      "UNION ALL SELECT doc_id FROM documents WHERE doc_id % 7 = 1 " +
      "AND doc_id NOT IN (SELECT doc_id FROM flag1)), " +
      "c2 AS (SELECT DISTINCT n.doc_id AS nid, c.doc_id AS cid " +
      "FROM bands n JOIN bands c ON n.band = c.band AND n.bh = c.bh " +
      "JOIN idx ON idx.doc_id = c.doc_id WHERE n.doc_id % 7 = 0) " +
      s"SELECT c2.nid AS doc_id, c2.cid AS corpus_id, " +
      s"($minhashAgreeSql) AS agreeing " +
      "FROM c2 JOIN sigs a ON a.doc_id = c2.nid " +
      "JOIN sigs b ON b.doc_id = c2.cid " +
      s"WHERE ($minhashAgreeSql) * 2 >= $NumPerm") { (s, d) =>
    val docs = Tables.documentsBalanced(s, d)
    val corpus = docs.filter(col("doc_id") % 7 >= 2)
    val batch1 = docs.filter(col("doc_id") % 7 === 1)
    val batch2 = docs.filter(col("doc_id") % 7 === 0)
    val idx = scratchDir("graft_sigidx2", d)
    graft.operators.Dedup.writeSignatureIndex(corpus, "doc_id", "text", idx)
    // fused probe+clean+append (r19): batch 1's signatures compute ONCE
    // and feed the probe and the appended rows — bit-identical to the
    // separate cleanAgainstIndex → appendToSignatureIndex calls
    // (OperatorsSpec locks the equivalence; the oracle gates end-to-end)
    graft.operators.Dedup.cleanAndAppendToIndex(batch1, "doc_id", "text", idx)
    graft.operators.Dedup.dedupAgainstIndex(batch2, "doc_id", "text", idx)
  }

  /** SimHash (16-bit, md5-derived token hashes): bit b of the signature is 1
    * iff the ±1 vote sum over token occurrences is positive. Pure integer
    * arithmetic → oracle-exact.
    */
  val qSimhash = q(
    "q_simhash", {
      val sums = (0 until 16).map(b =>
        s"sum(CASE WHEN (th >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b").mkString(", ")
      val sig = (0 until 16).map(b => s"(CASE WHEN s$b > 0 THEN ${1 << b} ELSE 0 END)")
        .mkString(" + ")
      s"SELECT doc_id, $sig AS simhash FROM (SELECT doc_id, $sums FROM (" +
        s"SELECT doc_id, ${hash32Sql("tok")} AS th FROM (" +
        s"SELECT doc_id, unnest($tokensSql) AS tok FROM documents)) GROUP BY doc_id)"
    }) { (s, d) =>
    graft.operators.Dedup.simhash(Tables.documentsBalanced(s, d), "doc_id", "text")
  }

  /** Full 64-bit SimHash near-dup CLUSTERING
    * ([[graft.operators.Dedup.simhash64]] → the shared Hamming stack:
    * 8 one-byte bands, exact Hamming ≤ 3 verify — Manku WWW'07's
    * production radius — connected components via
    * [[graft.operators.ImageDedup.imageClusters]]). The oracle
    * recomputes the 64 vote sums from the same two md5-prefix halves,
    * packs the identical byte layout, and mirrors banding + verify +
    * recursive-closure clustering end-to-end. Docs with no tokens carry
    * no signature on either engine. Threshold pinned above any test-SF
    * bucket so Spark's star guard and the SQL all-pairs banding agree.
    */
  val qSimhash64Cluster = q(
    "q_simhash64_cluster", {
      val sums = (0 until 64).map { b =>
        val (h, sh) = if (b < 32) ("lo", b) else ("hi", b - 32)
        s"sum(CASE WHEN ($h >> $sh) & 1 = 1 THEN 1 ELSE -1 END) AS s$b"
      }.mkString(", ")
      val bytes = (0 until 8).map { r =>
        (0 until 8).map(c =>
          s"(CASE WHEN s${r * 8 + c} > 0 THEN ${1 << c} ELSE 0 END)").mkString(" + ")
      }
      val hamming = (1 to 8).map(i => s"bit_count(xor(x.bs[$i], y.bs[$i]))")
        .mkString(" + ")
      "WITH RECURSIVE " +
        s"th AS (SELECT doc_id, ${hash32Sql("tok")} AS hi, " +
        "CAST(('0x' || substr(md5(tok), 9, 8)) AS BIGINT) AS lo FROM (" +
        s"SELECT doc_id, unnest($tokensSql) AS tok FROM documents)), " +
        s"ss AS (SELECT doc_id, $sums FROM th GROUP BY doc_id), " +
        s"sb AS (SELECT doc_id, [${bytes.mkString(", ")}] AS bs FROM ss), " +
        "h AS (SELECT doc_id, printf('%02x%02x%02x%02x%02x%02x%02x%02x', " +
        "bs[1], bs[2], bs[3], bs[4], bs[5], bs[6], bs[7], bs[8]) AS simhash64, bs FROM sb), " +
        "bands AS (SELECT doc_id, r, bs[CAST(r + 1 AS INT)] AS bv FROM h " +
        "CROSS JOIN (SELECT unnest(range(8)) AS r) t), " +
        "cand AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb FROM bands a " +
        "JOIN bands b ON a.r = b.r AND a.bv = b.bv AND a.doc_id < b.doc_id), " +
        "pairs AS (SELECT ida, idb FROM cand JOIN h x ON x.doc_id = ida " +
        s"JOIN h y ON y.doc_id = idb WHERE $hamming <= 3), " +
        "e(na, nb) AS (SELECT ida, idb FROM pairs UNION SELECT idb, ida FROM pairs), " +
        "reach(na, nb) AS (SELECT na, nb FROM e " +
        "UNION SELECT r.na, e2.nb FROM reach r JOIN e e2 ON r.nb = e2.na) " +
        "SELECT d.doc_id, h.simhash64, " +
        "CAST(least(d.doc_id, coalesce(min(r2.nb), d.doc_id)) AS BIGINT) AS rep " +
        "FROM documents d JOIN h USING (doc_id) " +
        "LEFT JOIN reach r2 ON r2.na = d.doc_id GROUP BY d.doc_id, h.simhash64"
    }) { (s, d) =>
    val hashed = graft.operators.Dedup
      .simhash64(Tables.documentsBalanced(s, d), "doc_id", "text")
    graft.operators.ImageDedup
      .imageClusters(hashed, "doc_id", "simhash64", maxHamming = 3,
        hotBucketThreshold = 1 << 20)
      .select("doc_id", "simhash64", "rep")
  }

  /** Hot-shingle cap for [[qNgramJaccard]]: shingles held by more than this
    * many docs of one source are dropped before pairing. A boilerplate
    * shingle shared by k docs contributes C(k,2) join rows — unbounded
    * without the cap (the LSH paths star-link; set intersection has no
    * representative to link through, so dropping the uninformative shingle is
    * the standard fix: a shingle in >K docs carries ~no Jaccard signal
    * anyway). Far above the organic max document frequency at test SFs
    * (6 at sf0.1), so test results are unchanged — and the cap is mirrored
    * in the oracle SQL regardless.
    */
  val MaxShingleDf = 64

  /** N-gram (3-shingle) Jaccard similarity between same-source doc pairs —
    * exact set intersection/union counts (integer → oracle-exact) over the
    * df-capped shingle universe. Scoped to same-source pairs: the
    * blocked-join shape that survives scale (never all-pairs), with
    * [[MaxShingleDf]] bounding each (source, shingle) bucket's C(k,2) blowup.
    *
    * APPROXIMATION: shingles are reduced to 4-byte md5-prefix hashes before
    * the set machinery, so a hash collision can merge two distinct shingles
    * and nudge i/u. The oracle mirrors the hash (it checks engine
    * equivalence, not hash fidelity); `OperatorsSpec`'s exact-vs-hashed test
    * bounds the drift (identical pair sets at test scale; collision
    * probability ~n²/2³³ for n distinct shingles per (source) block).
    */
  val qNgramJaccard = q(
    "q_ngram_jaccard",
    // shingles enter the pair machinery as 4-byte hashes (same mirrored
    // md5-prefix both engines use for minhash): the distinct, the df-cap
    // window, and the self-join all shuffle ints instead of shingle strings
    s"WITH sh0 AS (SELECT DISTINCT d.doc_id, d.source, ${hash32Sql("t.s")} AS s " +
      s"FROM documents d JOIN ($shinglesSql) t ON t.doc_id = d.doc_id), " +
      "sh AS (SELECT doc_id, source, s FROM (SELECT doc_id, source, s, " +
      "count(*) OVER (PARTITION BY source, s) AS df FROM sh0) " +
      s"WHERE df <= $MaxShingleDf), " +
      "sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id), " +
      "inter AS (SELECT x.doc_id AS ida, y.doc_id AS idb, count(*) AS i FROM sh x " +
      "JOIN sh y ON x.source = y.source AND x.s = y.s AND x.doc_id < y.doc_id " +
      "GROUP BY 1, 2) " +
      "SELECT ida, idb, i, na.n + nb.n - i AS u FROM inter " +
      "JOIN sz na ON na.doc_id = ida JOIN sz nb ON nb.doc_id = idb " +
      "WHERE i * 10 >= (na.n + nb.n - i)") { (s, d) =>
    ngramJaccardPairs(s, d, MaxShingleDf)
  }

  /** [[qNgramJaccard]] body with the df cap as a parameter (specs plant a
    * boilerplate shingle and assert the pair count stays bounded).
    *
    * source is carried into the shingle rows so the self-join shuffles on
    * (source, shingle) — the blocking key — instead of exploding on shingle
    * alone and filtering afterwards. The df-cap window partitions by that
    * same key, so the guard rides the shuffle the join already pays.
    *
    * Shingles are hashed AND deduped inside the document row
    * (`array_distinct` before `explode`): intra-doc repeats — the only
    * duplicates the downstream scan would otherwise strip — never become
    * rows, so they never ride the Exchange. `source` comes straight off the
    * documents scan, so the prep stage is pure map-side: scan → explode →
    * one shuffle, no join.
    */
  def ngramJaccardPairs(s: SparkSession, d: String, maxDf: Int): DataFrame =
    ngramJaccardPairsOf(
      Tables.documentsBalanced(s, d)
        .select(col("doc_id"), col("source"),
          explode(array_distinct(
            transform(ngramsCol(col("text"), 3), g => hash32(g)))).as("s")),
      maxDf)

  /** Pair stage over prepared (doc_id, source, s) shingle rows (duplicate
    * rows allowed — the sorted run scan dedupes them).
    *
    * One shuffle on the (source, shingle) blocking key does all the heavy
    * lifting: [[graft.operators.Lsh.scanRuns]] sorts runs by (source, s,
    * doc_id) and streams each kept block's C(n ≤ maxDf, 2) pairs plus one
    * member row per distinct (doc, shingle) — over-shared shingles are
    * DROPPED mid-stream with O(maxDf) memory, never buffered whole (a
    * collect_set would hold a boilerplate shingle's entire doc list in one
    * aggregation buffer before any size filter ran). Intersections and
    * per-doc set sizes then aggregate the scan's two row kinds; both
    * branches hang off the same Exchange, so the wide shingle rows shuffle
    * exactly once.
    */
  def ngramJaccardPairsOf(sh0: DataFrame, maxDf: Int): DataFrame = {
    val scan = graft.operators.Lsh.scanRuns(sh0, "doc_id",
      Seq("source", "s"), maxDf, hotStar = false, emitMembers = true)
    val inter = scan.filter(col("tag") === 0)
      .groupBy(col("a").as("ida"), col("b").as("idb"))
      .agg(count(lit(1)).as("i"))
    val sz = scan.filter(col("tag") === 1)
      .groupBy(col("a").as("doc_id")).agg(count(lit(1)).as("n"))
    inter.join(sz.as("na"), col("na.doc_id") === col("ida"))
      .join(sz.as("nb"), col("nb.doc_id") === col("idb"))
      .select(col("ida"), col("idb"), col("i"),
        (col("na.n") + col("nb.n") - col("i")).as("u"))
      .filter(col("i") * 10 >= col("u"))
  }

  // ---- text analysis ----

  /** Per-language corpus stats (quality-scoring building block). */
  val qTextStats = q(
    "q_text_stats",
    s"SELECT lang, count(*) AS docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars, " +
      s"CAST(sum(len($tokensSql)) AS BIGINT) AS sum_tokens FROM documents GROUP BY lang") { (s, d) =>
    Tables.documentsBalanced(s, d)
      .groupBy("lang")
      .agg(count(lit(1)).as("docs"),
        sum("n_chars").as("sum_chars"),
        sum(size(tokensCol(col("text"))).cast("long")).as("sum_tokens"))
  }

  /** Language-ID heuristic: english-stopword hit ratio, compared with integer
    * arithmetic (hits·20 > total ⇔ ratio > 5%) to avoid float thresholds.
    * Output = (labelled lang × predicted) confusion counts.
    */
  val qLangId = q(
    "q_lang_id", {
      val inList = CurationStops.map(w => s"'$w'").mkString(", ")
      s"SELECT lang, CASE WHEN hits * 20 > total THEN 'en' ELSE 'other' END AS predicted, " +
        "count(*) AS cnt FROM (SELECT lang, " +
        s"len(list_filter($tokensSql, x -> x IN ($inList))) AS hits, " +
        s"len($tokensSql) AS total FROM documents) GROUP BY 1, 2"
    }) { (s, d) =>
    val stops = CurationStops
    val t = tokensCol(col("text"))
    Tables.documentsBalanced(s, d)
      .select(col("lang"),
        size(filter(t, x => x.isInCollection(stops))).as("hits"),
        size(t).as("total"))
      .select(col("lang"),
        when(col("hits") * 20 > col("total"), "en").otherwise("other").as("predicted"))
      .groupBy("lang", "predicted")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Quality scoring: integer-bucketed length/character-class signals. */
  val qQualityScore = q(
    "q_quality_score",
    "SELECT source, count(*) AS docs, CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS BIGINT) AS long_docs, " +
      s"CAST(sum(CASE WHEN len($tokensSql) * 8 > n_chars THEN 1 ELSE 0 END) AS BIGINT) AS dense_docs, " +
      "CAST(sum(len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))) AS BIGINT) AS punct_chars " +
      "FROM documents GROUP BY source") { (s, d) =>
    Tables.documentsBalanced(s, d)
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(when(col("n_chars") >= 200, 1).otherwise(0)).as("long_docs"),
        sum(when(size(tokensCol(col("text"))) * 8 > col("n_chars"), 1).otherwise(0)).as("dense_docs"),
        sum(size(regexp_extract_all(col("text"), lit("[^a-zA-Z0-9 ]"), lit(0)))).as("punct_chars"))
  }

  /** Token counting: whitespace tokens + BPE-ish regex tokens per source. */
  val qTokenCount = q(
    "q_token_count",
    s"SELECT source, CAST(sum(len($tokensSql)) AS BIGINT) AS ws_tokens, " +
      "CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS bpe_tokens " +
      "FROM documents GROUP BY source") { (s, d) =>
    Tables.documentsBalanced(s, d)
      .groupBy("source")
      .agg(sum(size(tokensCol(col("text")))).as("ws_tokens"),
        sum(size(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+|[^a-z0-9\\s]"), lit(0))))
          .as("bpe_tokens"))
  }

  /** Word n-grams of the normalized tokens as a per-row array (1-based
    * slice windows — identical indexing on both engines); empty when the doc
    * has fewer than n tokens.
    */
  def ngramsCol(text: Column, n: Int,
      tokenizer: graft.operators.Tokenizer = graft.operators.Tokenizer.Ascii): Column =
    ngramsOfTokens(tokenizer.column(text), n)

  /** [[ngramsCol]] over an ALREADY-derived token array — the ONE gram
    * construction (callers holding the token column, e.g. `Dsir.gramsCol`,
    * reuse their subtree for codegen CSE instead of re-tokenizing).
    * n equal-length shifted slices zipped, one concat per gram — NOT a
    * per-gram slice(t, i, n)+array_join lambda: that shape re-slices the
    * token array once per gram (O(len·n) array copies) and measured 5.9×
    * slower on the sf0.1 corpus (3.4 s vs 0.6 s for 3-grams); output is
    * byte-identical (proven corpus-wide for n=3 and n=5).
    */
  def ngramsOfTokens(t: Column, n: Int): Column = {
    val parts = (0 until n).map(j =>
      slice(t, lit(j + 1), greatest(size(t) - (n - 1), lit(0))).as(s"g$j"))
    when(size(t) >= n,
      transform(arrays_zip(parts: _*),
        s => concat_ws(" ", (0 until n).map(j => s.getField(s"g$j")): _*)))
      .otherwise(array().cast("array<string>"))
  }

  def ngramsSql(n: Int): String = ngramsSqlCol("text", n)

  /** [[ngramsSql]] over an arbitrary column/expression (the composed
    * pipelines n-gram derived text, not the raw `text` column).
    */
  def ngramsSqlCol(c: String, n: Int): String = {
    val toks = tokensSqlCol(c)
    s"list_transform(range(1, greatest(len($toks) - ${n - 2}, 1)), " +
      s"i -> array_to_string(($toks)[i:i+${n - 1}], ' '))"
  }

  /** Repetition-ratio quality signal (the Gopher-style "fraction of
    * duplicate n-grams" filter): dup = total − distinct 3-grams, computed
    * per row with array functions — NO explode, NO shuffle except the final
    * per-source rollup, so at 100 TB this is a pure map-side scan. A doc is
    * "repetitive" when > 20% of its 3-grams are duplicates (integer-exact
    * threshold).
    */
  val qRepetition = q(
    "q_repetition", {
      val g = ngramsSql(3)
      s"WITH gr AS (SELECT source, len($g) AS total, " +
        s"len($g) - len(list_distinct($g)) AS dup FROM documents) " +
        "SELECT source, count(*) AS docs, " +
        "CAST(sum(dup) AS BIGINT) AS dup_grams, " +
        "CAST(sum(total) AS BIGINT) AS grams, " +
        "CAST(sum(CASE WHEN dup * 5 > total THEN 1 ELSE 0 END) AS BIGINT) AS repetitive_docs " +
        "FROM gr GROUP BY source"
    }) { (s, d) =>
    val g = ngramsCol(col("text"), 3)
    Tables.documentsBalanced(s, d)
      .select(col("source"), size(g).as("total"),
        (size(g) - size(array_distinct(g))).as("dup"))
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(col("dup")).as("dup_grams"),
        sum(col("total")).as("grams"),
        sum(when(col("dup") * 5 > col("total"), 1).otherwise(0)).as("repetitive_docs"))
  }

  /** [[qDecontaminate]] on the Bloom-filter scale path. The Bloom flag SET
    * depends on Spark's filter hashes, which DuckDB cannot mirror — so the
    * entry is oracle-checked on what IS mirrorable (the approx-entry
    * pattern): per source, the EXACT contamination count (DuckDB
    * recomputes it value-exact) plus `no_false_negative`, true iff every
    * exactly-contaminated doc was also Bloom-flagged — the filter's one
    * hard guarantee, re-proven on real data every round; the DuckDB side
    * locks it to 1. Bench cost includes both the Bloom and the exact leg
    * (documented; the pure Bloom path a 100 TB run ships is the
    * `contaminatedIdsBloom` call alone).
    */
  val qDecontaminateBloom = q(
    "q_decontaminate_bloom", {
      val g = ngramsSql(5)
      s"WITH bg AS (SELECT DISTINCT unnest($g) AS gr FROM documents WHERE doc_id % 100 = 0), " +
        s"hit AS (SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest($g) AS gr " +
        "FROM documents WHERE doc_id % 100 <> 0) t JOIN bg USING (gr)) " +
        "SELECT source, count(*) AS docs, " +
        "CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM hit) THEN 1 ELSE 0 END) AS BIGINT) AS contaminated_exact, " +
        "CAST(1 AS BIGINT) AS no_false_negative " +
        "FROM documents WHERE doc_id % 100 <> 0 GROUP BY source"
    }) { (s, d) =>
    val docs = Tables.documentsBalanced(s, d)
    val bench = docs.filter(col("doc_id") % 100 === 0)
    val corpus = docs.filter(col("doc_id") % 100 =!= 0)
    val exact = graft.operators.Decontaminate
      .contaminatedIds(corpus, bench, "doc_id", "text", n = 5)
      .withColumn("__ex", lit(1))
    val bloom = graft.operators.Decontaminate
      .contaminatedIdsBloom(corpus, bench, "doc_id", "text", n = 5)
      .withColumn("__bl", lit(1))
    corpus.join(exact, Seq("doc_id"), "left")
      .join(bloom, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(when(col("__ex").isNotNull, 1).otherwise(0)).as("contaminated_exact"),
        min(when(col("__ex").isNotNull && col("__bl").isNull, 0L).otherwise(1L))
          .as("no_false_negative"))
  }

  /** Benchmark decontamination via [[graft.operators.Decontaminate]]: the
    * "benchmark" is the deterministic doc_id % 100 == 0 slice standing in
    * for an eval set; corpus docs sharing any 5-gram with it are flagged.
    * Per-source totals keep the check integer-exact.
    */
  val qDecontaminate = q(
    "q_decontaminate", {
      val g = ngramsSql(5)
      s"WITH bg AS (SELECT DISTINCT unnest($g) AS gr FROM documents WHERE doc_id % 100 = 0), " +
        s"hit AS (SELECT DISTINCT doc_id FROM (SELECT doc_id, unnest($g) AS gr " +
        "FROM documents WHERE doc_id % 100 <> 0) t JOIN bg USING (gr)) " +
        "SELECT source, count(*) AS docs, " +
        "CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM hit) THEN 1 ELSE 0 END) AS BIGINT) AS contaminated " +
        "FROM documents WHERE doc_id % 100 <> 0 GROUP BY source"
    }) { (s, d) =>
    val docs = Tables.documentsBalanced(s, d)
    val bench = docs.filter(col("doc_id") % 100 === 0)
    val corpus = docs.filter(col("doc_id") % 100 =!= 0)
    val hits = graft.operators.Decontaminate
      .contaminatedIds(corpus, bench, "doc_id", "text", n = 5)
      .withColumn("__hit", lit(1))
    corpus.join(hits, Seq("doc_id"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("docs"),
        sum(when(col("__hit").isNotNull, 1).otherwise(0)).as("contaminated"))
  }

  /** Overlap-FRACTION decontamination
    * ([[graft.operators.Decontaminate.overlapStats]]): per corpus doc, the
    * (distinct-5-gram total, benchmark-matched) pair plus the 20%
    * threshold verdict (`matched·5 > total`) — the GPT-3/PaLM "dirty
    * document" accounting, value-exact per document.
    */
  val qDecontaminateFrac = q(
    "q_decontaminate_frac", {
      val g = ngramsSql(5)
      s"WITH bg AS (SELECT DISTINCT unnest($g) AS gr FROM documents WHERE doc_id % 100 = 0), " +
        s"dg AS (SELECT doc_id, unnest(list_distinct($g)) AS gr " +
        "FROM documents WHERE doc_id % 100 <> 0), " +
        "st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS grams_total, " +
        "CAST(sum(CASE WHEN gr IN (SELECT gr FROM bg) THEN 1 ELSE 0 END) AS BIGINT) AS grams_matched " +
        "FROM dg GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(grams_total, 0) AS grams_total, " +
        "coalesce(grams_matched, 0) AS grams_matched, " +
        "CAST(CASE WHEN coalesce(grams_matched, 0) * 5 > coalesce(grams_total, 0) " +
        "THEN 1 ELSE 0 END AS BIGINT) AS dirty " +
        "FROM (SELECT doc_id FROM documents WHERE doc_id % 100 <> 0) d " +
        "LEFT JOIN st USING (doc_id)"
    }) { (s, d) =>
    val docs = Tables.documentsBalanced(s, d)
    val bench = docs.filter(col("doc_id") % 100 === 0)
    val corpus = docs.filter(col("doc_id") % 100 =!= 0)
    graft.operators.Decontaminate
      .overlapStats(corpus, bench, "doc_id", "text", n = 5)
      .select(col("doc_id"), col("grams_total"), col("grams_matched"),
        (col("grams_matched") * 5 > col("grams_total")).cast("long").as("dirty"))
  }

  /** Boilerplate-prefix strip ([[graft.operators.Boilerplate]]): leading
    * 2-token runs shared by ≥ 2 docs of a source are flagged and removed
    * from the normalized text — per-doc flag and cleaned text value-exact
    * on both engines.
    */
  val qBoilerplate = q(
    "q_boilerplate", {
      s"WITH t AS (SELECT doc_id, source, $tokensSql AS toks FROM documents), " +
        "p AS (SELECT doc_id, source, toks, CASE WHEN len(toks) >= 2 " +
        "THEN array_to_string(toks[1:2], ' ') END AS pre FROM t), " +
        "f AS (SELECT source, pre, CAST(1 AS INT) AS bp FROM p WHERE pre IS NOT NULL " +
        "GROUP BY source, pre HAVING count(*) >= 2) " +
        "SELECT doc_id, CAST(CASE WHEN bp IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS is_boilerplate, " +
        "coalesce(CASE WHEN bp IS NOT NULL THEN array_to_string(toks[3:], ' ') " +
        "ELSE array_to_string(toks, ' ') END, '') AS text_clean " +
        "FROM p LEFT JOIN f USING (source, pre)"
    }) { (s, d) =>
    graft.operators.Boilerplate.stripFrequentPrefixes(
        Tables.documents(s, d), "doc_id", "text", "source", k = 2, minDf = 2L)
      .select(col("doc_id"), col("is_boilerplate").cast("long"),
        col("text_clean"))
  }

  /** Cross-document frequent-line removal
    * ([[graft.operators.Boilerplate.stripFrequentLines]]): raw lines in
    * ≥ 2 distinct docs of a source are boilerplate and removed; survivors
    * keep order and bytes. The synthetic corpus is single-line with no
    * exact within-source duplicates, so here the entry value-locks the
    * IDENTITY path (explode → df table → join → byte-exact reassembly of
    * every document); the removal branch is spec-locked on planted
    * multi-line fixtures in `OperatorsSpec`.
    */
  val qStripLines = q(
    "q_strip_lines",
    "WITH t AS (SELECT doc_id, source, string_split(text, chr(10)) AS ls FROM documents), " +
      "ex AS (SELECT doc_id, source, unnest(ls) AS l, " +
      "unnest(range(1, len(ls) + 1)) AS pos FROM t), " +
      "lf AS (SELECT source, l FROM (SELECT source, l, " +
      "count(DISTINCT doc_id) AS df FROM ex WHERE NOT regexp_matches(l, '^\\s*$') " +
      "GROUP BY source, l) WHERE df >= 2), " +
      "re AS (SELECT ex.doc_id, " +
      "array_to_string(list(ex.l ORDER BY ex.pos) FILTER (WHERE lf.l IS NULL), chr(10)) AS text_kept, " +
      "CAST(sum(CASE WHEN lf.l IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS lines_removed " +
      "FROM ex LEFT JOIN lf ON ex.source = lf.source AND ex.l = lf.l " +
      "GROUP BY ex.doc_id) " +
      "SELECT d.doc_id, coalesce(text_kept, '') AS text_kept, " +
      "coalesce(lines_removed, 0) AS lines_removed " +
      "FROM documents d LEFT JOIN re USING (doc_id)") { (s, d) =>
    graft.operators.Boilerplate.stripFrequentLines(
        Tables.documents(s, d), "doc_id", "text", "source", minDf = 2L)
      .select(col("doc_id"), col("text_kept"), col("lines_removed"))
  }

  /** TWO-BATCH incremental line-frequency flow
    * ([[graft.operators.Boilerplate.writeLineFreqIndex]] /
    * `appendToLineFreqIndex` / `stripAgainstLineIndex`): the corpus
    * (doc_id % 7 ≥ 2) builds the persisted per-(source, line) count
    * index; batch 1 (doc_id % 7 = 1) appends its counts; batch 2
    * (doc_id % 7 = 0) is then stripped against the ACCUMULATED counts —
    * so a batch-2 line whose second occurrence arrived in batch 1 is
    * caught without any corpus recount. The oracle recomputes the df over
    * corpus ∪ batch 1 directly and strips batch 2 the same way.
    */
  val qStripLinesIncremental = q(
    "q_strip_lines_incremental",
    "WITH t AS (SELECT doc_id, source, string_split(text, chr(10)) AS ls FROM documents), " +
      "ex0 AS (SELECT doc_id, source, unnest(ls) AS l, " +
      "unnest(range(1, len(ls) + 1)) AS pos FROM t), " +
      "lf AS (SELECT source, l FROM (SELECT source, l, " +
      "count(DISTINCT doc_id) AS df FROM ex0 WHERE doc_id % 7 <> 0 " +
      "AND NOT regexp_matches(l, '^\\s*$') GROUP BY source, l) WHERE df >= 2), " +
      "re AS (SELECT ex0.doc_id, " +
      "array_to_string(list(ex0.l ORDER BY ex0.pos) FILTER (WHERE lf.l IS NULL), chr(10)) AS text_kept, " +
      "CAST(sum(CASE WHEN lf.l IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS lines_removed " +
      "FROM ex0 LEFT JOIN lf ON ex0.source = lf.source AND ex0.l = lf.l " +
      "WHERE ex0.doc_id % 7 = 0 GROUP BY ex0.doc_id) " +
      "SELECT d.doc_id, coalesce(text_kept, '') AS text_kept, " +
      "coalesce(lines_removed, 0) AS lines_removed " +
      "FROM (SELECT doc_id FROM documents WHERE doc_id % 7 = 0) d " +
      "LEFT JOIN re USING (doc_id)") { (s, d) =>
    val docs = Tables.documents(s, d)
    val corpus = docs.filter(col("doc_id") % 7 >= 2)
    val batch1 = docs.filter(col("doc_id") % 7 === 1)
    val batch2 = docs.filter(col("doc_id") % 7 === 0)
    val idx = scratchDir("graft_lineidx", d)
    graft.operators.Boilerplate.writeLineFreqIndex(
      corpus, "doc_id", "text", "source", idx)
    graft.operators.Boilerplate.appendToLineFreqIndex(
      batch1, "doc_id", "text", "source", idx)
    graft.operators.Boilerplate.stripAgainstLineIndex(
        batch2, "doc_id", "text", "source", idx, minDf = 2L)
      .select(col("doc_id"), col("text_kept"), col("lines_removed"))
  }

  /** Corpus-trained bigram-rarity fluency score
    * ([[graft.operators.QualityFilters.bigramRarity]]): per doc, total
    * and rare (corpus-hapax) bigram occurrences plus the 20% low-quality
    * verdict — all integer, value-exact. The synthetic vocabulary is ~40
    * words, so its bigram counts have essentially no hapax tail (the
    * entry locks the per-doc totals and near-zero rare counts); the
    * flagging branch is spec-locked on a planted incoherent doc in
    * `OperatorsSpec`.
    */
  val qBigramRarity = q(
    "q_bigram_rarity", {
      val g = ngramsSql(2)
      s"WITH bgx AS (SELECT doc_id, unnest($g) AS g FROM documents), " +
        "cnt AS (SELECT g, CAST(count(*) AS BIGINT) AS c FROM bgx GROUP BY g), " +
        "st AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS bigrams_total, " +
        "CAST(sum(CASE WHEN c <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS bigrams_rare " +
        "FROM bgx JOIN cnt USING (g) GROUP BY doc_id) " +
        "SELECT d.doc_id, coalesce(bigrams_total, 0) AS bigrams_total, " +
        "coalesce(bigrams_rare, 0) AS bigrams_rare, " +
        "CAST(CASE WHEN coalesce(bigrams_rare, 0) * 5 > coalesce(bigrams_total, 0) " +
        "THEN 1 ELSE 0 END AS BIGINT) AS lowq " +
        "FROM documents d LEFT JOIN st USING (doc_id)"
    }) { (s, d) =>
    graft.operators.QualityFilters
      .bigramRarity(Tables.documentsBalanced(s, d), "doc_id", "text", rareMax = 1L)
      .select(col("doc_id"), col("bigrams_total"), col("bigrams_rare"),
        col("lowq").cast("long"))
  }

  /** Multimodal plumbing: opaque binary column + typed metadata. Image
    * decode is real (JDK `javax.imageio` — see
    * [[graft.operators.Multimodal.ImageIoDecoder]]); audio/video fall back
    * to the deterministic stub. This query oracle-checks the metadata leg
    * (byte length + content hash) the decoders ride on.
    */
  val qMultimodalMeta = q(
    "q_multimodal_meta",
    "SELECT doc_id, strlen(text) AS n_bytes, md5(text) AS content_hash FROM documents") { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .select(col("doc_id"), octet_length(col("payload")).as("n_bytes"),
        md5(col("payload")).as("content_hash"))
  }

  /** Perceptual-hash image dedup ([[graft.operators.ImageDedup]]): 64-bit
    * dHash per payload, 8 one-byte Hamming bands → candidate pairs →
    * exact Hamming ≤ 6 verify → connected components. The decode seam
    * uses the deterministic code-point surrogate ([[ImageDedup.dHashTextCol]])
    * so DuckDB can recompute the ENTIRE pipeline — hash values, banding,
    * Hamming verify, and the recursive-closure cluster assignment — while
    * the real `javax.imageio` grid path is locked by `ImageDedupSpec` on
    * generated PNGs (an image codec is the one step SQL cannot host).
    * The hot-bucket threshold is pinned far above any test-SF bucket so
    * Spark's star guard and the oracle's all-pairs banding agree exactly;
    * production calls keep the guarded default.
    */
  /** Shared dHash oracle CTE chain (`px` code-point samples → `hb`
    * row-bytes → `h(doc_id, dhash, bs)` → `bands(doc_id, r, bv)`) — one
    * definition drives the cluster and the incremental-index oracles,
    * mirroring [[graft.operators.ImageDedup.dHashTextCol]] exactly.
    */
  /** The 8 dHash row-byte expressions over a 72-sample list aliased `p`
    * — shared by every dHash-mirroring oracle.
    */
  private val dhashByteExprsSql: Seq[String] = (0 until 8).map { r =>
    (0 until 8).map { c =>
      s"(CASE WHEN p[${r * 9 + c + 2}] > p[${r * 9 + c + 1}] THEN ${1 << c} ELSE 0 END)"
    }.mkString(" + ")
  }

  private val dhashPrintfSql: String =
    "printf('%02x%02x%02x%02x%02x%02x%02x%02x', " +
      "bs[1], bs[2], bs[3], bs[4], bs[5], bs[6], bs[7], bs[8])"

  private val imageHashCtesSql: String =
    "px AS (SELECT doc_id, CASE WHEN coalesce(length(text), 0) >= 1 THEN " +
      "[ord(substr(text, 1 + CAST((i * length(text)) // 72 AS INT), 1)) " +
      "for i in range(72)] END AS p FROM documents), " +
      s"hb AS (SELECT doc_id, CASE WHEN p IS NULL THEN [0, 0, 0, 0, 0, 0, 0, 0] " +
      s"ELSE [${dhashByteExprsSql.mkString(", ")}] END AS bs FROM px), " +
      s"h AS (SELECT doc_id, $dhashPrintfSql AS dhash, bs FROM hb), " +
      "bands AS (SELECT doc_id, r, bs[CAST(r + 1 AS INT)] AS bv FROM h " +
      "CROSS JOIN (SELECT unnest(range(8)) AS r) t)"

  /** Exact Hamming between two `h` rows aliased `x` and `y`. */
  private val imageHammingSql: String =
    (1 to 8).map(i => s"bit_count(xor(x.bs[$i], y.bs[$i]))").mkString(" + ")

  val qImageDedup = q(
    "q_image_dedup", {
      "WITH RECURSIVE " + imageHashCtesSql + ", " +
        "cand AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb FROM bands a " +
        "JOIN bands b ON a.r = b.r AND a.bv = b.bv AND a.doc_id < b.doc_id), " +
        "pairs AS (SELECT ida, idb FROM cand JOIN h x ON x.doc_id = ida " +
        s"JOIN h y ON y.doc_id = idb WHERE $imageHammingSql <= 6), " +
        "e(na, nb) AS (SELECT ida, idb FROM pairs UNION SELECT idb, ida FROM pairs), " +
        "reach(na, nb) AS (SELECT na, nb FROM e " +
        "UNION SELECT r.na, e2.nb FROM reach r JOIN e e2 ON r.nb = e2.na) " +
        "SELECT d.doc_id, h.dhash, " +
        "CAST(least(d.doc_id, coalesce(min(r2.nb), d.doc_id)) AS BIGINT) AS rep " +
        "FROM documents d JOIN h USING (doc_id) " +
        "LEFT JOIN reach r2 ON r2.na = d.doc_id GROUP BY d.doc_id, h.dhash"
    }) { (s, d) =>
    val hashed = Tables.documentsBalanced(s, d).select(col("doc_id"),
      graft.operators.ImageDedup.dHashTextCol(col("text")).as("dhash"))
    graft.operators.ImageDedup
      .imageClusters(hashed, "doc_id", "dhash", maxHamming = 6,
        hotBucketThreshold = 1 << 20)
      .select("doc_id", "dhash", "rep")
  }

  /** INCREMENTAL image dedup through the persisted hash index
    * ([[graft.operators.ImageDedup.writeImageHashIndex]] /
    * `dedupAgainstImageIndex`): the corpus (doc_id % 7 ≠ 0) is indexed
    * once; the ingest batch (doc_id % 7 = 0) is flagged against it with
    * an index scan pruned to the batch's (band, bv) keys — the corpus
    * side never shuffles. The Spark leg includes the index WRITE (honest
    * end-to-end cost); the oracle recomputes both sides' hashes and
    * joins them directly.
    */
  val qImageDedupIncremental = q(
    "q_image_dedup_incremental",
    s"WITH $imageHashCtesSql, " +
      "m AS (SELECT DISTINCT n.doc_id AS doc_id, c.doc_id AS corpus_id " +
      "FROM bands n JOIN bands c ON n.r = c.r AND n.bv = c.bv " +
      "WHERE n.doc_id % 7 = 0 AND c.doc_id % 7 <> 0) " +
      s"SELECT m.doc_id, m.corpus_id, CAST($imageHammingSql AS BIGINT) AS hamming " +
      "FROM m JOIN h x ON x.doc_id = m.doc_id " +
      "JOIN h y ON y.doc_id = m.corpus_id " +
      s"WHERE $imageHammingSql <= 6") { (s, d) =>
    import graft.operators.ImageDedup
    val hashed = Tables.documentsBalanced(s, d).select(col("doc_id"),
      ImageDedup.dHashTextCol(col("text")).as("dhash"))
    val corpus = hashed.filter(col("doc_id") % 7 =!= 0)
    val batch = hashed.filter(col("doc_id") % 7 === 0)
    val idx = scratchDir("graft_imgidx", d)
    ImageDedup.writeImageHashIndex(corpus, "doc_id", "dhash", idx)
    ImageDedup.dedupAgainstImageIndex(batch, "doc_id", "dhash", idx)
      .select(col("doc_id"), col("corpus_id"), col("hamming").cast("long"))
  }

  /** The big-corpus index layout (`bandBits = 16`: 4 two-byte bands,
    * Hamming ≤ 3 pigeonhole guarantee) through the same incremental
    * probe — the oracle mirrors the WIDER banding (a pair is a candidate
    * iff some aligned byte PAIR matches) and the tighter radius, locking
    * the layout cross-engine like its 8-bit sibling.
    */
  val qImageDedupIncremental16 = q(
    "q_image_dedup_incremental16",
    s"WITH $imageHashCtesSql, " +
      "bands16 AS (SELECT doc_id, r, bs[CAST(2 * r + 1 AS INT)] * 256 + " +
      "bs[CAST(2 * r + 2 AS INT)] AS bv FROM h " +
      "CROSS JOIN (SELECT unnest(range(4)) AS r) t), " +
      "m AS (SELECT DISTINCT n.doc_id AS doc_id, c.doc_id AS corpus_id " +
      "FROM bands16 n JOIN bands16 c ON n.r = c.r AND n.bv = c.bv " +
      "WHERE n.doc_id % 7 = 0 AND c.doc_id % 7 <> 0) " +
      s"SELECT m.doc_id, m.corpus_id, CAST($imageHammingSql AS BIGINT) AS hamming " +
      "FROM m JOIN h x ON x.doc_id = m.doc_id " +
      "JOIN h y ON y.doc_id = m.corpus_id " +
      s"WHERE $imageHammingSql <= 3") { (s, d) =>
    import graft.operators.ImageDedup
    val hashed = Tables.documentsBalanced(s, d).select(col("doc_id"),
      ImageDedup.dHashTextCol(col("text")).as("dhash"))
    val corpus = hashed.filter(col("doc_id") % 7 =!= 0)
    val batch = hashed.filter(col("doc_id") % 7 === 0)
    val idx = scratchDir("graft_imgidx16", d)
    ImageDedup.writeImageHashIndex(corpus, "doc_id", "dhash", idx, bandBits = 16)
    ImageDedup.dedupAgainstImageIndex(batch, "doc_id", "dhash", idx, maxHamming = 3)
      .select(col("doc_id"), col("corpus_id"), col("hamming").cast("long"))
  }

  /** Video near-dup pairs through the REAL operator
    * ([[graft.operators.ImageDedup.videoOverlapPairs]]): each document's
    * UTF-8 payload is a "video", its 96-byte blocks the frames, per-frame
    * dHash surrogates the fingerprints; videos sharing ≥ 2 distinct
    * frame hashes pair with exact shared/capped-union counts, boilerplate
    * frames (df > 16) dropped from both sides. The corpus is pure ASCII
    * at every SF (asserted when the entry was written), so the oracle's
    * code-point framing and sampling equal the operator's byte framing
    * exactly — the same bridge `q_image_dedup` stands on.
    */
  val qVideoOverlap = q(
    "q_video_overlap", {
      val fb = 96
      "WITH fr AS (SELECT doc_id, unnest(range(1, " +
        s"CAST(ceil(length(text) / $fb.0) AS INT) + 1)) AS f, text FROM documents), " +
        s"fx AS (SELECT doc_id, substr(text, (f - 1) * $fb + 1, $fb) AS blk FROM fr), " +
        "fpx AS (SELECT doc_id, CASE WHEN length(blk) >= 1 THEN " +
        "[ord(substr(blk, 1 + CAST((i * length(blk)) // 72 AS INT), 1)) " +
        "for i in range(72)] END AS p FROM fx), " +
        s"fhb AS (SELECT doc_id, CASE WHEN p IS NULL THEN [0, 0, 0, 0, 0, 0, 0, 0] " +
        s"ELSE [${dhashByteExprsSql.mkString(", ")}] END AS bs FROM fpx), " +
        s"fh AS (SELECT DISTINCT doc_id, $dhashPrintfSql AS fhash FROM fhb), " +
        "kept AS (SELECT doc_id, fhash FROM fh WHERE fhash IN (" +
        "SELECT fhash FROM (SELECT fhash, count(DISTINCT doc_id) AS df " +
        "FROM fh GROUP BY fhash) WHERE df <= 16)), " +
        "sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM kept GROUP BY doc_id), " +
        "pr AS (SELECT a.doc_id AS ida, b.doc_id AS idb, " +
        "CAST(count(*) AS BIGINT) AS shared FROM kept a " +
        "JOIN kept b ON a.fhash = b.fhash AND a.doc_id < b.doc_id " +
        "GROUP BY a.doc_id, b.doc_id) " +
        "SELECT ida, idb, shared, na.n + nb.n - shared AS u FROM pr " +
        "JOIN sz na ON na.doc_id = ida JOIN sz nb ON nb.doc_id = idb " +
        "WHERE shared >= 2"
    }) { (s, d) =>
    import s.implicits._
    val media = Tables.documents(s, d)
      .select(col("doc_id").as("id"), lit("video/raw").as("mediaType"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[graft.operators.Multimodal.MediaRow]
    graft.operators.ImageDedup
      .videoOverlapPairs(media, frameBytes = 96, stride = 1,
        maxDf = 16, minShared = 2)
      .select(col("ida"), col("idb"), col("shared"), col("u"))
  }

  /** AUDIO near-dup clustering ([[graft.operators.Audio]]): the
    * 72-window energy-envelope hash — window j POOLS 4 code-point
    * samples (the [[graft.operators.Audio.energyHashTextCol]] oracle
    * surrogate; the REAL `javax.sound.sampled` PCM path is spec-locked
    * in `AudioSpec` on generated WAV/AIFF clips, an audio codec being
    * the one step SQL cannot host) — then the SAME gradient pack,
    * banding, Hamming ≤ 6 verify, and recursive-closure clustering the
    * image family runs: one Hamming stack, three modalities. Only the
    * `px` sampling CTE differs from `q_image_dedup`'s; every downstream
    * SQL fragment is reused verbatim.
    */
  val qAudioDedup = q(
    "q_audio_dedup", {
      val poolExpr = (0 until 4).map(m =>
        s"ord(substr(text, 1 + CAST(((j * 4 + $m) * length(text)) // 288 AS INT), 1))")
        .mkString(" + ")
      "WITH RECURSIVE " +
        "px AS (SELECT doc_id, CASE WHEN coalesce(length(text), 0) >= 1 THEN " +
        s"[$poolExpr for j in range(72)] END AS p FROM documents), " +
        s"hb AS (SELECT doc_id, CASE WHEN p IS NULL THEN [0, 0, 0, 0, 0, 0, 0, 0] " +
        s"ELSE [${dhashByteExprsSql.mkString(", ")}] END AS bs FROM px), " +
        s"h AS (SELECT doc_id, $dhashPrintfSql AS ahash, bs FROM hb), " +
        "bands AS (SELECT doc_id, r, bs[CAST(r + 1 AS INT)] AS bv FROM h " +
        "CROSS JOIN (SELECT unnest(range(8)) AS r) t), " +
        "cand AS (SELECT DISTINCT a.doc_id AS ida, b.doc_id AS idb FROM bands a " +
        "JOIN bands b ON a.r = b.r AND a.bv = b.bv AND a.doc_id < b.doc_id), " +
        "pairs AS (SELECT ida, idb FROM cand JOIN h x ON x.doc_id = ida " +
        s"JOIN h y ON y.doc_id = idb WHERE $imageHammingSql <= 6), " +
        "e(na, nb) AS (SELECT ida, idb FROM pairs UNION SELECT idb, ida FROM pairs), " +
        "reach(na, nb) AS (SELECT na, nb FROM e " +
        "UNION SELECT r.na, e2.nb FROM reach r JOIN e e2 ON r.nb = e2.na) " +
        "SELECT d.doc_id, h.ahash, " +
        "CAST(least(d.doc_id, coalesce(min(r2.nb), d.doc_id)) AS BIGINT) AS rep " +
        "FROM documents d JOIN h USING (doc_id) " +
        "LEFT JOIN reach r2 ON r2.na = d.doc_id GROUP BY d.doc_id, h.ahash"
    }) { (s, d) =>
    val hashed = Tables.documentsBalanced(s, d).select(col("doc_id"),
      graft.operators.Audio.energyHashTextCol(col("text")).as("ahash"))
    graft.operators.ImageDedup
      .imageClusters(hashed, "doc_id", "ahash", maxHamming = 6,
        hotBucketThreshold = 1 << 20)
      .select("doc_id", "ahash", "rep")
  }

  /** Survivor set of exact dedup through `operators.Dedup.exact`: the rows a
    * deduped corpus would keep.
    */
  val qDedupSurvivors = q(
    "q_dedup_survivors",
    "SELECT doc_id, n_chars FROM documents WHERE doc_id IN (" +
      "SELECT min(doc_id) FROM documents GROUP BY md5(text))") { (s, d) =>
    graft.operators.Dedup.exact(Tables.documents(s, d), "doc_id", "text")
      .select("doc_id", "n_chars")
  }

  /** Survivor set of fingerprint dedup through `operators.Dedup.byFingerprint`.
    *
    * Deliberately NOT `documentsBalanced`: byFingerprint is one groupBy —
    * its own exchange already redistributes, and the map-side fingerprint
    * compute is too cheap at this scale to pay a full-corpus pre-shuffle
    * for (measured r9: the balance cost 628→1448 ms). On a real cluster
    * the scan has many splits and the question never arises.
    */
  val qDedupFpSurvivors = q(
    "q_dedup_fp_survivors",
    "SELECT doc_id FROM (SELECT doc_id, row_number() OVER (PARTITION BY " +
      s"md5(array_to_string(list_sort(list_distinct($tokensSql)), ' ')) " +
      "ORDER BY doc_id) AS rn FROM documents) WHERE rn = 1") { (s, d) =>
    graft.operators.Dedup.byFingerprint(Tables.documents(s, d), "doc_id", "text")
      .select("doc_id")
  }

  /** N-gram (token) frequency profile: top-5 tokens per language by count —
    * the language-model vocabulary profile pattern (two-phase agg + rank).
    */
  val qNgramProfile = q(
    "q_ngram_profile",
    "SELECT lang, tok, cnt FROM (SELECT lang, tok, cnt, row_number() OVER (" +
      "PARTITION BY lang ORDER BY cnt DESC, tok) AS rn FROM (" +
      "SELECT lang, tok, count(*) AS cnt FROM (" +
      s"SELECT lang, unnest($tokensSql) AS tok FROM documents) GROUP BY 1, 2" +
      ")) WHERE rn <= 5") { (s, d) =>
    val counts = Tables.documentsBalanced(s, d)
      .select(col("lang"), explode(tokensCol(col("text"))).as("tok"))
      .groupBy("lang", "tok")
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("lang").orderBy(col("cnt").desc, col("tok"))
    counts.withColumn("rn", row_number().over(w)).where(col("rn") <= 5)
      .select("lang", "tok", "cnt")
  }

  /** End-to-end curation pipeline — the flagship training-data flow as ONE
    * query: exact-dedup survivors → length + token-count + language filters →
    * kept-docs/token totals per (source, lang). Every stage is a pattern
    * proven above; this proves they COMPOSE (dedup feeds filters feeds
    * aggregation) with a single shuffle per stage.
    */
  val qCurationPipeline = q(
    "q_curation_pipeline", {
      val inList = CurationStops.map(w => s"'$w'").mkString(", ")
      "WITH surv AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)), " +
        "feat AS (SELECT d.source, d.lang, d.n_chars, " +
        s"len($tokensSql) AS toks, " +
        s"len(list_filter($tokensSql, x -> x IN ($inList))) AS hits " +
        "FROM documents d JOIN surv ON d.doc_id = surv.doc_id) " +
        "SELECT source, lang, count(*) AS kept, CAST(sum(toks) AS BIGINT) AS tokens FROM feat " +
        "WHERE n_chars >= 100 AND toks BETWEEN 10 AND 5000 AND hits * 20 > toks " +
        "GROUP BY source, lang"
    }) { (s, d) =>
    val stops = CurationStops
    val surv = graft.operators.Dedup.exact(
      Tables.documentsBalanced(s, d), "doc_id", "text")
    val t = tokensCol(col("text"))
    surv
      .select(col("source"), col("lang"), col("n_chars"),
        size(t).as("toks"),
        size(filter(t, x => x.isInCollection(stops))).as("hits"))
      .where(col("n_chars") >= 100 && col("toks").between(10, 5000) &&
        col("hits") * 20 > col("toks"))
      .groupBy("source", "lang")
      .agg(count(lit(1)).as("kept"), sum(col("toks")).as("tokens"))
  }

  /** Token-window chunking for embedding/RAG prep — 64-token chunks at
    * stride 32 (50 % overlap) over raw whitespace tokens. Pure map-side
    * (Scan → Generate → Project, no shuffle); see
    * [[graft.operators.Packing.chunkTokens]].
    */
  val qChunkTokens = q(
    "q_chunk_tokens",
    "WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents) " +
      "SELECT doc_id, CAST((u.i - 1) // 32 AS BIGINT) AS chunk_id, " +
      "array_to_string(t[u.i : u.i + 63], ' ') AS chunk, " +
      "CAST(least(64, len(t) - u.i + 1) AS BIGINT) AS n_tokens " +
      "FROM toks, UNNEST(range(1, greatest(len(t), 1) + 1, 32)) AS u(i)") { (s, d) =>
    graft.operators.Packing.chunkTokens(
      Tables.documents(s, d), "doc_id", "text", chunkSize = 64, stride = 32)
  }

  /** Training-sequence packing: docs fill 2048-token sequences per source in
    * doc_id order — seq_id = running-token-total-before-doc div budget.
    * One window shuffle on source; see
    * [[graft.operators.Packing.packSequences]].
    */
  val qPackSequences = q(
    "q_pack_sequences",
    "WITH toks AS (SELECT doc_id, source, " +
      "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents), " +
      "c AS (SELECT doc_id, source, n_tokens, sum(n_tokens) OVER " +
      "(PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM toks) " +
      "SELECT doc_id, source, n_tokens, " +
      "CAST(floor((cum - n_tokens) / 2048) AS BIGINT) AS seq_id FROM c") { (s, d) =>
    graft.operators.Packing.packSequences(
      Tables.documents(s, d), "doc_id", "text", "source", tokenBudget = 2048L)
  }

  /** Packed-sequence BOUNDARY metadata
    * ([[graft.operators.Packing.packedBoundaries]]): per (source, seq_id),
    * the offset-ordered document boundaries a training reader uses to mask
    * cross-document attention. The query explodes the per-sequence array
    * back to one flat row per document (offset, length, docs-in-sequence)
    * so the oracle checks every boundary value exactly.
    */
  val qPackBoundaries = q(
    "q_pack_boundaries",
    "WITH toks AS (SELECT doc_id, source, " +
      "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens FROM documents), " +
      "c AS (SELECT doc_id, source, n_tokens, sum(n_tokens) OVER " +
      "(PARTITION BY source ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM toks), " +
      "b AS (SELECT doc_id, source, n_tokens, " +
      "CAST(floor((cum - n_tokens) / 2048) AS BIGINT) AS seq_id, " +
      "CAST(cum - n_tokens - CAST(floor((cum - n_tokens) / 2048) AS BIGINT) * 2048 AS BIGINT) AS off FROM c) " +
      "SELECT source, seq_id, count(*) OVER (PARTITION BY source, seq_id) AS n_docs, " +
      "doc_id, off, n_tokens FROM b") { (s, d) =>
    graft.operators.Packing.packedBoundaries(
        Tables.documents(s, d).select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("n_tokens")),
        "doc_id", "source", "n_tokens", tokenBudget = 2048L)
      .select(col("source"), col("seq_id"), col("n_docs"),
        explode(col("docs")).as("d"))
      .select(col("source"), col("seq_id"), col("n_docs"),
        col("d.id").as("doc_id"), col("d.off").as("off"),
        col("d.n_tokens").as("n_tokens"))
  }

  /** TF-IDF top terms per document — the classic two-aggregate + join-back
    * shape (term frequency per doc; document frequency per term; score =
    * tf·N/df). The score is computed as exact integer division
    * (tf·10⁶ div df — N is constant within a ranking so it cancels), so the
    * ranking needs no float log and both engines agree bit-for-bit. Scale:
    * the df side aggregates to vocabulary size (≪ corpus), the join-back
    * shuffles on term, and the final top-3 is a bounded per-doc window.
    */
  /** Reusable operator form: top-k terms per document by exact-integer
    * TF-IDF score (`tf·10⁶ div df`; constant N cancels inside a per-doc
    * ranking). Output: (idCol, term, score_q).
    */
  def tfidfTopTerms(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, k: Int,
      tokenizer: graft.operators.Tokenizer = graft.operators.Tokenizer.House)
      : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wc = docs
      .select(col(idCol), explode(tokenizer.column(col(textCol))).as("term"))
      .groupBy(idCol, "term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = wc.groupBy("term").agg(count(lit(1)).as("df"))
    wc.join(dfreq, "term")
      .withColumn("score_q", expr("(tf * 1000000) DIV df"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(idCol).orderBy(col("score_q").desc, col("term"))))
      .filter(col("__rn") <= k)
      .select(col(idCol), col("term"), col("score_q"))
  }

  /** Okapi BM25 retrieval — the one-shot corpus path; moved to
    * [[graft.operators.Retrieval.bm25Rank]] (which also owns the
    * persisted inverted index this delegates to for the full lifecycle).
    */
  def bm25Rank(docs: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, queryTerms: Seq[String], n: Int,
      k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame =
    graft.operators.Retrieval.bm25Rank(docs, idCol, textCol, queryTerms, n, k1, b)

  /** PII-style scrubbing: replace every match of `pattern` with `token`,
    * recording the per-row match count. Pure map-side (codegen regex) —
    * the redaction pass a training corpus takes before packing. Patterns
    * must stay in the RE2 ∩ Java regex dialect (no backrefs/lookahead) so
    * the oracle mirrors exactly.
    */
  def redact(df: org.apache.spark.sql.DataFrame, textCol: String,
      pattern: String, token: String = "<PII>"): org.apache.spark.sql.DataFrame = {
    require(!df.columns.contains("n_redacted") &&
        !df.columns.contains(s"${textCol}_redacted"),
      "input already has an n_redacted/_redacted column; rename it first")
    df.withColumn("n_redacted",
        size(regexp_extract_all(col(textCol), lit(pattern), lit(0))))
      .withColumn(s"${textCol}_redacted", regexp_replace(col(textCol), pattern, token))
  }

  /** PII masking ([[graft.operators.Pii.maskPii]] — the Dolma/FineWeb
    * anonymization stage): emails, IPv4 literals, and separator-bearing
    * phone numbers masked in a FIXED sequence with per-class counts
    * taken on the text each class actually saw (an IP-shaped string
    * inside an email's local part counts as ONE email, ZERO IPs). The
    * synthetic corpus carries no organic PII, so the entry plants a
    * deterministic per-doc payload IN-QUERY on both engines — including
    * the overlap case — and the oracle mirrors the count/mask CTE
    * pipeline verbatim (the patterns live in the Java-regex ∩ RE2
    * common subset), hash-matching all three counts AND the masked
    * text's md5.
    */
  /** The q_pii_* planted payload (the synthetic corpus carries no
    * organic PII): per-doc emails/IPs/phones appended to the text,
    * including the email-contains-IP overlap case — expressed
    * identically in Spark and SQL. Shared with `q_curation_pipeline6`.
    */
  private[queries] val piiPlantSql: String =
    "(text || ' reach 1.2.3.' || CAST(doc_id % 256 AS VARCHAR) " +
      "|| '@mail.example.org or user' || CAST(doc_id AS VARCHAR) " +
      "|| '@ex.io from 10.' || CAST(doc_id % 256 AS VARCHAR) " +
      "|| '.0.7 call 555-123-4567 or (555) 987-6543.')"

  private[queries] def piiPlantCol: Column =
    concat(col("text"),
      lit(" reach 1.2.3."), col("doc_id") % 256,
      lit("@mail.example.org or user"), col("doc_id"),
      lit("@ex.io from 10."), col("doc_id") % 256,
      lit(".0.7 call 555-123-4567 or (555) 987-6543."))

  /** The [[graft.operators.Pii.maskPii]] pipeline as oracle CTEs over a
    * caller-supplied `p` relation carrying a `t` text column: counts
    * taken on the text each class actually saw, ending in `msk` = p's
    * other columns + n_emails/n_ipv4/n_phones + masked `t`. Shared with
    * `q_curation_pipeline6`.
    */
  private[queries] def piiMaskCtes(pSql: String): String = {
    val email = graft.operators.Pii.EmailPattern
    val ip = graft.operators.Pii.Ipv4Pattern
    val phone = graft.operators.Pii.PhonePattern
    s"p AS ($pSql), " +
      s"e AS (SELECT * EXCLUDE (t), CAST(len(regexp_extract_all(t, '$email')) AS BIGINT) AS n_emails, " +
      s"regexp_replace(t, '$email', '<EMAIL>', 'g') AS t FROM p), " +
      s"i AS (SELECT * EXCLUDE (t), CAST(len(regexp_extract_all(t, '$ip')) AS BIGINT) AS n_ipv4, " +
      s"regexp_replace(t, '$ip', '<IP>', 'g') AS t FROM e), " +
      s"msk AS (SELECT * EXCLUDE (t), " +
      s"CAST(len(regexp_extract_all(t, '$phone')) AS BIGINT) AS n_phones, " +
      s"regexp_replace(t, '$phone', '<PHONE>', 'g') AS t FROM i)"
  }

  val qPiiMask = q(
    "q_pii_mask",
    s"WITH ${piiMaskCtes(s"SELECT doc_id, $piiPlantSql AS t FROM documents")} " +
      "SELECT doc_id, n_emails, n_ipv4, n_phones, md5(t) AS masked_md5 " +
      "FROM msk") { (s, d) =>
    val planted = Tables.documents(s, d)
      .select(col("doc_id"), piiPlantCol.as("t"))
    graft.operators.Pii.maskPii(planted, "t")
      .select(col("doc_id"), col("n_emails"), col("n_ipv4"), col("n_phones"),
        md5(col("t_masked")).as("masked_md5"))
  }

  /** The q_url_* planted corpus: one messy URL per doc exercising every
    * canonicalization rule — uppercase scheme+host, default port,
    * trailing-slash variants (odd/even doc), tracking params, unsorted
    * params, a fragment — expressed identically in Spark and SQL so both
    * engines canonicalize the same bytes.
    */
  private[queries] val urlPlantSql: String =
    "(CASE WHEN doc_id % 97 = 0 THEN NULL ELSE " +
      "(CASE WHEN doc_id % 3 = 0 THEN 'HTTP://News.Example.COM:80' " +
      "ELSE 'HTTPS://News.Example.COM:443' END) || '/' || source || '/item' " +
      "|| (CASE WHEN doc_id % 2 = 0 THEN '///' ELSE '' END) " +
      "|| '?z=9&utm_source=feed&a=' || CAST(doc_id % 5 AS VARCHAR) " +
      "|| '&gclid=abc#frag' || CAST(doc_id AS VARCHAR) END)"

  private[queries] def urlPlantCol: Column =
    when(col("doc_id") % 97 === 0, lit(null).cast("string")).otherwise(concat(
      when(col("doc_id") % 3 === 0, lit("HTTP://News.Example.COM:80"))
        .otherwise(lit("HTTPS://News.Example.COM:443")),
      lit("/"), col("source"), lit("/item"),
      when(col("doc_id") % 2 === 0, lit("///")).otherwise(lit("")),
      lit("?z=9&utm_source=feed&a="), col("doc_id") % 5,
      lit("&gclid=abc#frag"), col("doc_id")))

  /** The DuckDB mirror of [[graft.operators.Urls.canonicalUrl]], step
    * for step over a column expression `u`.
    */
  private[queries] def urlCanonSql(u: String): String = {
    val scheme = s"lower(regexp_extract($u, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val hostRaw = s"lower(regexp_extract($u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
    val host = s"(CASE WHEN $scheme = 'http' THEN regexp_replace($hostRaw, ':80$$', '') " +
      s"WHEN $scheme = 'https' THEN regexp_replace($hostRaw, ':443$$', '') ELSE $hostRaw END)"
    val pathTrim = s"regexp_replace(regexp_extract($u, " +
      s"'^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$$', '')"
    val path = s"(CASE WHEN $pathTrim = '' THEN '/' ELSE $pathTrim END)"
    val params = "array_to_string(list_sort(list_filter(string_split(" +
      s"regexp_extract($u, '^[^#]*\\?([^#]*)', 1), '&'), " +
      s"x -> x <> '' AND NOT regexp_matches(x, " +
      s"'${graft.operators.Urls.TrackingParamRe}'))), '&')"
    s"(CASE WHEN $u IS NULL THEN NULL WHEN $scheme = '' THEN $u " +
      s"ELSE $scheme || '://' || $host || $path || " +
      s"(CASE WHEN $params = '' THEN '' ELSE '?' || $params END) END)"
  }

  /** URL canonicalization ([[graft.operators.Urls.canonicalUrl]] — the
    * crawl pipelines' pre-content dedup key): scheme/host casefold,
    * default-port strip, trailing-slash and empty-path rules, tracking
    * params dropped, surviving params SORTED, fragment dropped. The
    * oracle applies the identical rule sequence in DuckDB over the same
    * planted corpus, so the full canonical string hash-matches per doc.
    */
  val qUrlCanon = q(
    "q_url_canon",
    s"SELECT doc_id, ${urlCanonSql(s"($urlPlantSql)")} AS curl FROM documents") { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        graft.operators.Urls.canonicalUrl(urlPlantCol).as("curl"))
  }

  /** URL dedup ([[graft.operators.Urls.dedupByUrl]]): keep the min doc_id
    * per canonical URL — the planted corpus collapses to
    * (source × a-param × scheme-group) classes because slashes, ports,
    * casing, tracking params, and fragments all canonicalize away.
    * Docs whose planted url is NULL (`doc_id % 97 = 0`) are EXEMPT from
    * dedup and all survive — the null-url passthrough contract.
    */
  val qUrlDedup = q(
    "q_url_dedup",
    s"WITH c AS (SELECT doc_id, ${urlCanonSql(s"($urlPlantSql)")} AS curl " +
      "FROM documents) " +
      "SELECT doc_id, n_chars FROM documents WHERE doc_id IN " +
      "(SELECT min(doc_id) FROM c WHERE curl IS NOT NULL GROUP BY curl) " +
      "OR doc_id % 97 = 0") { (s, d) =>
    graft.operators.Urls.dedupByUrl(
      Tables.documents(s, d).withColumn("url", urlPlantCol),
      "doc_id", "url")
      .select("doc_id", "n_chars")
  }

  /** Redaction over the events payload: digit runs → `<NUM>`; the redacted
    * text is pinned through md5 (identical hex on both engines).
    */
  /** The q_html_* planted markup: each doc's text wrapped in a full
    * page exercising every extraction rule — script/style/comment
    * bodies (including a bare `<` inside the script), block tags,
    * attribute-bearing and unquoted tags, all six entities INCLUDING
    * the `&amp;lt;` double-decode trap, and two links (absolute with a
    * tracking param + `&amp;`, and relative). One definition on each
    * engine, same bytes.
    */
  private[queries] val htmlPlantSql: String =
    "('<HTML><head><title lang=\"en\">Doc ' || CAST(doc_id AS VARCHAR) || " +
      "' &amp; Friends</title>' || " +
      "'<style type=\"text/css\">p { color: red; }</style>' || " +
      "'<script>if (doc_id < 3) { alert(\"x&y\"); }</script></head>' || " +
      "'<body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1>' || " +
      "'<p class=\"lead\">' || text || '</p>' || " +
      "'<ul><li>item &lt;' || CAST(doc_id % 7 AS VARCHAR) || '&gt;</li>' || " +
      "'<li>&#39;quoted&#39;&nbsp;and &amp;lt;kept&amp;gt;</li></ul>' || " +
      "'<a href=\"https://News.Example.COM:443/read/item' || " +
      "CAST(doc_id % 13 AS VARCHAR) || '?z=9&amp;utm_source=feed&amp;a=' || " +
      "CAST(doc_id % 5 AS VARCHAR) || '#s\">go</a> ' || " +
      "'<a href=/rel/p' || CAST(doc_id % 3 AS VARCHAR) || '>rel</a>' || " +
      "'<!-- hidden ' || CAST(doc_id AS VARCHAR) || ' --></body></HTML>')"

  private[queries] def htmlPlantCol: Column =
    concat(
      lit("<HTML><head><title lang=\"en\">Doc "), col("doc_id"),
      lit(" &amp; Friends</title>"),
      lit("<style type=\"text/css\">p { color: red; }</style>"),
      lit("<script>if (doc_id < 3) { alert(\"x&y\"); }</script></head>"),
      lit("<body><h1>Doc "), col("doc_id"), lit("</h1>"),
      lit("<p class=\"lead\">"), col("text"), lit("</p>"),
      lit("<ul><li>item &lt;"), col("doc_id") % 7, lit("&gt;</li>"),
      lit("<li>&#39;quoted&#39;&nbsp;and &amp;lt;kept&amp;gt;</li></ul>"),
      lit("<a href=\"https://News.Example.COM:443/read/item"),
      col("doc_id") % 13, lit("?z=9&amp;utm_source=feed&amp;a="),
      col("doc_id") % 5, lit("#s\">go</a> "),
      lit("<a href=/rel/p"), col("doc_id") % 3, lit(">rel</a>"),
      lit("<!-- hidden "), col("doc_id"), lit(" --></body></HTML>"))

  /** HTML → text extraction ([[graft.operators.Html.extractText]] — the
    * crawl stage upstream of every text filter): script/style/comment
    * removal, block tags → newlines, tag strip, ordered entity decode
    * (with the `&amp;lt;` double-decode trap), whitespace
    * normalization, plus `<title>` and the href list. The oracle runs
    * the IDENTICAL pattern bytes (one shared constant per rule), so the
    * full extracted text, the title, and the link list hash-match.
    */
  val qHtmlExtract = q(
    "q_html_extract", {
      val t = graft.operators.Html.extractTextSql(s"($htmlPlantSql)")
      s"SELECT doc_id, md5($t) AS text_md5, " +
        s"CAST(len(string_split($t, chr(10))) AS BIGINT) AS n_lines, " +
        s"${graft.operators.Html.extractTitleSql(s"($htmlPlantSql)")} AS title, " +
        s"array_to_string(${graft.operators.Html.extractLinksSql(s"($htmlPlantSql)")}, ' ') AS links_str " +
        "FROM documents"
    }) { (s, d) =>
    val h = htmlPlantCol
    Tables.documents(s, d).select(
      col("doc_id"),
      md5(graft.operators.Html.extractText(h)).as("text_md5"),
      size(split(graft.operators.Html.extractText(h), "\n")).cast("long")
        .as("n_lines"),
      graft.operators.Html.extractTitle(h).as("title"),
      array_join(graft.operators.Html.extractLinks(h), " ").as("links_str"))
  }

  /** Link-graph composition: hrefs extracted from the planted markup
    * feed [[graft.operators.Urls.canonicalUrl]] — casefold/port/
    * tracking-param/fragment rules apply to every ABSOLUTE link, while
    * the relative link passes through the no-scheme contract unchanged.
    * The href-extraction + canonicalization chain is the exact
    * pre-dedup path a crawl frontier runs.
    */
  val qHtmlLinks = q(
    "q_html_links", {
      val links = graft.operators.Html.extractLinksSql(s"($htmlPlantSql)")
      s"SELECT doc_id, ${urlCanonSql("u")} AS curl FROM " +
        s"(SELECT doc_id, unnest($links) AS u FROM documents)"
    }) { (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
        explode(graft.operators.Html.extractLinks(htmlPlantCol)).as("u"))
      .select(col("doc_id"),
        graft.operators.Urls.canonicalUrl(col("u")).as("curl"))
  }

  val qRedact = q(
    "q_redact",
    "SELECT event_id, CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_redacted, " +
      "md5(regexp_replace(props, '[0-9]+', '<NUM>', 'g')) AS redacted_md5 FROM events") { (s, d) =>
    redact(Tables.events(s, d), "props", "[0-9]+", "<NUM>")
      .select(col("event_id"), col("n_redacted"),
        md5(col("props_redacted")).as("redacted_md5"))
  }

  /** BM25 retrieval: top-20 documents for the query
    * {hash, join, spark, window} (k1 = 1.2, b = 0.75, Lucene idf). The
    * oracle recomputes the FULL scoring pipeline in DuckDB with the same
    * IEEE operation order, the same micro-unit floor quantization before
    * the per-doc sum (integer sums commute; float sums don't), and the
    * same (score desc, doc_id) tie rule — so ranks AND quantized scores
    * hash-match.
    */
  val qBm25 = q(
    "q_bm25",
    "WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), " +
      "x -> x <> '') AS w FROM documents), " +
      "dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w), " +
      "st AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl), " +
      "tf AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf " +
      "FROM (SELECT doc_id, unnest(w) AS t FROM w) " +
      "WHERE t IN ('hash', 'join', 'spark', 'window') GROUP BY 1, 2), " +
      "dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1), " +
      "sc AS (SELECT tf.doc_id, CAST(floor(" +
      "ln(1.0 + (n - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1)) / " +
      "(tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) * 1000000" +
      ") AS BIGINT) AS sq " +
      "FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st), " +
      "tot AS (SELECT doc_id, CAST(sum(sq) AS BIGINT) AS bm25_q " +
      "FROM sc GROUP BY 1) " +
      "SELECT doc_id, bm25_q, CAST(row_number() OVER " +
      "(ORDER BY bm25_q DESC, doc_id) AS INT) AS rank " +
      "FROM tot ORDER BY rank LIMIT 20") { (s, d) =>
    bm25Rank(Tables.documentsBalanced(s, d), "doc_id", "text",
      Seq("hash", "join", "spark", "window"), 20)
  }

  /** BM25 against the PERSISTED inverted index: half the corpus is
    * indexed with `writeTextIndex`, the other half arrives via
    * `appendToTextIndex` (per-batch stats rows summing at probe time),
    * and the probe reads ONLY the query terms' bucket partitions + stats.
    * The oracle is the SAME full-corpus recompute as `q_bm25` — proving
    * the index lifecycle is semantics-preserving end-to-end, including
    * the split-batch corpus statistics.
    */
  val qBm25Indexed = q(
    "q_bm25_indexed",
    qBm25.oracle.get) { (s, d) =>
    import graft.operators.Retrieval
    val docs = Tables.documentsBalanced(s, d)
    val idx = scratchDir("graft_textidx", d)
    Retrieval.writeTextIndex(
      docs.where(col("doc_id") % 2 === 0), "doc_id", "text", idx, nBuckets = 16)
    Retrieval.appendToTextIndex(
      docs.where(col("doc_id") % 2 === 1), "doc_id", "text", idx)
    Retrieval.bm25AgainstIndex(s, idx,
      Seq("hash", "join", "spark", "window"), 20)
  }

  /** Batch BM25 against the persisted index: two queries scored in ONE
    * plan (the retrieval twin of `q_ann_topk_batch`), top-10 each. The
    * oracle recomputes both rankings from the corpus with the same
    * quantization and per-query tie rule.
    */
  /** Block-max WAND probe ([[graft.operators.Retrieval.bm25WandAgainstIndex]]):
    * same index lifecycle as `q_bm25_indexed` (split build + append) but
    * the probe prunes doc-id blocks whose stats-derived score upper bound
    * cannot reach the top-20 — then exact-scores only the survivors. The
    * oracle is the SAME full-corpus recompute as `q_bm25`: the pruning is
    * provably result-invariant (a pruned block's every doc scores
    * strictly below the seeded n-th-best lower bound θ), so ranks AND
    * quantized scores hash-match the unpruned probe and the one-shot.
    * blockSize 64 at gate scale so pruning actually engages (5k docs →
    * ~80 blocks).
    */
  val qBm25Wand = q(
    "q_bm25_wand",
    qBm25.oracle.get) { (s, d) =>
    import graft.operators.Retrieval
    val docs = Tables.documentsBalanced(s, d)
    val idx = scratchDir("graft_textidx_w", d)
    Retrieval.writeTextIndex(
      docs.where(col("doc_id") % 2 === 0), "doc_id", "text", idx,
      nBuckets = 16, blockSize = 64)
    Retrieval.appendToTextIndex(
      docs.where(col("doc_id") % 2 === 1), "doc_id", "text", idx)
    Retrieval.bm25WandAgainstIndex(s, idx,
      Seq("hash", "join", "spark", "window"), 20)
  }

  /** Doc-id reordering for block-max index builds
    * ([[graft.operators.Retrieval.reorderDocs]]): dense 0-based ids in
    * (source, n_chars, doc_id) order — similar docs land in the same
    * doc-id blocks, which is what makes WAND bounds discriminate (crawl
    * ids are interleaved; production engines reorder before building).
    * The oracle is the direct dense-rank recompute; determinism comes
    * from the old-id tiebreak making the order total. NULLS FIRST in the
    * oracle mirrors reorderDocs' documented null rule (Spark asc default;
    * DuckDB's ASC default is NULLS LAST, which would silently diverge on
    * any NULL order key).
    */
  val qDocReorder = q(
    "q_doc_reorder",
    "SELECT doc_id, CAST(row_number() OVER " +
      "(ORDER BY source NULLS FIRST, n_chars NULLS FIRST, doc_id) - 1 " +
      "AS BIGINT) AS doc_id_new FROM documents") { (s, d) =>
    graft.operators.Retrieval.reorderDocs(Tables.documents(s, d), "doc_id",
        Seq(col("source"), col("n_chars")))
      .select(col("doc_id"), col("doc_id_new"))
  }

  /** BM25 under the pluggable UNICODE tokenizer
    * ([[graft.operators.Tokenizer.Unicode]]): the corpus is roughened
    * in-query (every space becomes ", " and a final "." lands) so the
    * house single-space rule would produce garbage tokens ("hash," never
    * matches the query) — only Unicode-category segmentation + casefold
    * recovers the clean words. The full index lifecycle runs under the
    * new rule: the build persists the tokenizer tag in the index meta and
    * the APPEND half resolves it from there (nothing re-passes it), so
    * the oracle — the complete scoring pipeline over
    * `regexp_split_to_array` tokens — also gates the meta roundtrip.
    */
  val qBm25Unicode = q(
    "q_bm25_unicode", {
      val toks = graft.operators.Tokenizer.Unicode(casefold = true)
        .duckSql("regexp_replace(text, ' ', ', ', 'g') || '.'")
      s"WITH w AS (SELECT doc_id, $toks AS w FROM documents), " +
        "dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w), " +
        "st AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl), " +
        "tf AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf " +
        "FROM (SELECT doc_id, unnest(w) AS t FROM w) " +
        "WHERE t IN ('hash', 'join', 'spark', 'window') GROUP BY 1, 2), " +
        "dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1), " +
        "sc AS (SELECT tf.doc_id, CAST(floor(" +
        "ln(1.0 + (n - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1)) / " +
        "(tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) * 1000000" +
        ") AS BIGINT) AS sq " +
        "FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st), " +
        "tot AS (SELECT doc_id, CAST(sum(sq) AS BIGINT) AS bm25_q " +
        "FROM sc GROUP BY 1) " +
        "SELECT doc_id, bm25_q, CAST(row_number() OVER " +
        "(ORDER BY bm25_q DESC, doc_id) AS INT) AS rank " +
        "FROM tot ORDER BY rank LIMIT 20"
    }) { (s, d) =>
    import graft.operators.{Retrieval, Tokenizer}
    val rough = Tables.documentsBalanced(s, d).withColumn("text",
      concat(regexp_replace(col("text"), " ", ", "), lit(".")))
    val idx = scratchDir("graft_textidx_u", d)
    Retrieval.writeTextIndex(rough.where(col("doc_id") % 2 === 0),
      "doc_id", "text", idx, nBuckets = 16,
      tokenizer = Tokenizer.Unicode(casefold = true))
    Retrieval.appendToTextIndex( // tokenizer resolved from the index meta
      rough.where(col("doc_id") % 2 === 1), "doc_id", "text", idx)
    Retrieval.bm25AgainstIndex(s, idx,
      Seq("hash", "join", "spark", "window"), 20)
  }

  val qBm25Batch = q(
    "q_bm25_batch",
    "WITH w AS (SELECT doc_id, list_filter(string_split(text, ' '), " +
      "x -> x <> '') AS w FROM documents), " +
      "dl AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl FROM w), " +
      "st AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
      "CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl), " +
      "qt(query_id, term) AS (VALUES (CAST(1 AS BIGINT), 'hash'), " +
      "(CAST(1 AS BIGINT), 'join'), (CAST(2 AS BIGINT), 'spark'), " +
      "(CAST(2 AS BIGINT), 'window'), (CAST(2 AS BIGINT), 'scan')), " +
      "tf AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf " +
      "FROM (SELECT doc_id, unnest(w) AS t FROM w) " +
      "WHERE t IN (SELECT term FROM qt) GROUP BY 1, 2), " +
      "dfq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1), " +
      "sc AS (SELECT qt.query_id, tf.doc_id, CAST(floor(" +
      "ln(1.0 + (n - df + 0.5) / (df + 0.5)) * (tf * (1.2 + 1)) / " +
      "(tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) * 1000000" +
      ") AS BIGINT) AS sq " +
      "FROM tf JOIN dfq USING (term) JOIN qt USING (term) " +
      "JOIN dl USING (doc_id) CROSS JOIN st), " +
      "tot AS (SELECT query_id, doc_id, CAST(sum(sq) AS BIGINT) AS bm25_q " +
      "FROM sc GROUP BY 1, 2) " +
      "SELECT query_id, doc_id, bm25_q, CAST(row_number() OVER " +
      "(PARTITION BY query_id ORDER BY bm25_q DESC, doc_id) AS INT) AS rank " +
      "FROM tot QUALIFY rank <= 10") { (s, d) =>
    import graft.operators.Retrieval
    val idx = scratchDir("graft_textidx_b", d)
    Retrieval.writeTextIndex(Tables.documentsBalanced(s, d), "doc_id", "text",
      idx, nBuckets = 16)
    import s.implicits._
    val batch = Seq((1L, "hash"), (1L, "join"), (2L, "spark"),
      (2L, "window"), (2L, "scan")).toDF("query_id", "term")
    Retrieval.bm25BatchAgainstIndex(s, idx, batch, "query_id", "term", 10)
  }

  /** The BATCH probe under block-max WAND pruning
    * ([[graft.operators.Retrieval.bm25WandBatchAgainstIndex]]): per-query
    * bounds, seeds, θ, and survivors — exact output by the same
    * result-invariance argument as `q_bm25_wand`, so the oracle IS
    * `q_bm25_batch`'s full-corpus recompute.
    */
  val qBm25WandBatch = q(
    "q_bm25_wand_batch",
    qBm25Batch.oracle.get) { (s, d) =>
    import graft.operators.Retrieval
    val idx = scratchDir("graft_textidx_wb", d)
    Retrieval.writeTextIndex(Tables.documentsBalanced(s, d), "doc_id", "text",
      idx, nBuckets = 16, blockSize = 64)
    import s.implicits._
    val batch = Seq((1L, "hash"), (1L, "join"), (2L, "spark"),
      (2L, "window"), (2L, "scan")).toDF("query_id", "term")
    Retrieval.bm25WandBatchAgainstIndex(s, idx, batch, "query_id", "term", 10)
  }


  val qTfidf = q(
    "q_tfidf",
    "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents), " +
      "wc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM w " +
      "WHERE term <> '' GROUP BY doc_id, term), " +
      "dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM wc GROUP BY term), " +
      "scored AS (SELECT doc_id, wc.term AS term, (tf * 1000000) // df AS score_q, " +
      "row_number() OVER (PARTITION BY doc_id ORDER BY (tf * 1000000) // df DESC, wc.term) AS rn " +
      "FROM wc JOIN dfreq ON wc.term = dfreq.term) " +
      "SELECT doc_id, term, score_q FROM scored WHERE rn <= 3") { (s, d) =>
    tfidfTopTerms(Tables.documentsBalanced(s, d), "doc_id", "text", 3)
  }

  /** Gopher quality rules (Rae et al. 2021, Appendix A1.1) through
    * [[graft.operators.QualityFilters.gopherFlags]]: every flag is exact
    * integer cross-multiplication, so each rule verdict hash-matches the
    * DuckDB mirror per document.
    */
  /** Hampel/MAD robust length-outlier flags per source domain
    * ([[graft.operators.QualityFilters.madOutlierFlags]]): the whole rule
    * is exact integer arithmetic on the ½-grid-scaled medians
    * (`med2 = 2·median`, `mad4 = 2·median(|2v − med2|)`,
    * outlier ⟺ `2·|2v − med2| > k·mad4`), so the DuckDB mirror
    * hash-matches every verdict — no float thresholds anywhere.
    */
  val qOutlierMad = q(
    "q_outlier_mad",
    "WITH m AS (SELECT source, CAST(median(n_chars) * 2 AS BIGINT) AS med2 " +
      "FROM documents GROUP BY 1), " +
      "d AS (SELECT doc_id, documents.source, " +
      "abs(n_chars * 2 - med2) AS d2, med2 FROM documents JOIN m USING (source)), " +
      "md AS (SELECT source, CAST(median(d2) * 2 AS BIGINT) AS mad4 " +
      "FROM d GROUP BY 1) " +
      "SELECT doc_id, d.source, med2, mad4, " +
      "CAST(d2 * 2 > 3 * mad4 AS BIGINT) AS is_outlier " +
      "FROM d JOIN md USING (source)") { (s, d) =>
    graft.operators.QualityFilters.madOutlierFlags(
      Tables.documents(s, d).select("doc_id", "source", "n_chars"),
      Seq("source"), "n_chars", k = 3L)
      .select("doc_id", "source", "med2", "mad4", "is_outlier")
  }

  /** CCNet head/middle/tail buckets per language
    * ([[graft.operators.QualityFilters.percentileBuckets]], Wenzek '20
    * §4.3) keyed on the document-length score: exact integer
    * percent-ranks (`(rank−1)·10⁶ div n`, RANK ties shared) against ppm
    * cuts, so every label hash-matches the DuckDB mirror.
    */
  val qCcnetBuckets = q(
    "q_ccnet_buckets",
    "WITH x AS (SELECT doc_id, lang, " +
      "rank() OVER (PARTITION BY lang ORDER BY n_chars) AS r, " +
      "count(*) OVER (PARTITION BY lang) AS n FROM documents) " +
      "SELECT doc_id, lang, ((r - 1) * 1000000) // n AS pr_ppm, " +
      "CASE WHEN ((r - 1) * 1000000) // n < 333333 THEN 'head' " +
      "WHEN ((r - 1) * 1000000) // n < 666667 THEN 'middle' " +
      "ELSE 'tail' END AS bucket FROM x") { (s, d) =>
    graft.operators.QualityFilters.percentileBuckets(
      Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
      Seq("lang"), "n_chars")
      .select("doc_id", "lang", "pr_ppm", "bucket")
  }

  val qQualityGopher = q(
    "q_quality_gopher",
    "WITH wr AS (SELECT doc_id, text, " +
      "list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w, " +
      "string_split(text, chr(10)) AS ls FROM documents), " +
      "m AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, " +
      "CAST(coalesce(list_sum(list_transform(w, x -> len(x))), 0) AS BIGINT) AS sum_len, " +
      "CAST(len(ls) AS BIGINT) AS n_lines, " +
      "CAST(len(list_filter(ls, l -> regexp_matches(trim(l), '^[-*•]'))) AS BIGINT) AS bullets, " +
      "CAST(len(list_filter(ls, l -> regexp_matches(l, '\\.\\.\\.\\s*$'))) AS BIGINT) AS ellipsis, " +
      "CAST(len(regexp_extract_all(text, '#')) AS BIGINT) AS hashes, " +
      "CAST(len(regexp_extract_all(text, '\\.\\.\\.')) AS BIGINT) AS ellipses, " +
      "CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT) AS alpha_w, " +
      "CAST(len(list_intersect(list_transform(w, x -> lower(x)), " +
      "['the','be','to','of','and','that','have','with'])) AS BIGINT) AS stops FROM wr) " +
      "SELECT doc_id, " +
      "CAST(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END AS BIGINT) AS g_word_count, " +
      "CAST(CASE WHEN 3*n_words <= sum_len AND sum_len <= 10*n_words THEN 1 ELSE 0 END AS BIGINT) AS g_mean_word_len, " +
      "CAST(CASE WHEN hashes*10 <= n_words AND ellipses*10 <= n_words THEN 1 ELSE 0 END AS BIGINT) AS g_symbol_ratio, " +
      "CAST(CASE WHEN bullets*10 <= n_lines*9 THEN 1 ELSE 0 END AS BIGINT) AS g_bullet_lines, " +
      "CAST(CASE WHEN ellipsis*10 <= n_lines*3 THEN 1 ELSE 0 END AS BIGINT) AS g_ellipsis_lines, " +
      "CAST(CASE WHEN alpha_w*5 >= n_words*4 THEN 1 ELSE 0 END AS BIGINT) AS g_alpha_words, " +
      "CAST(CASE WHEN stops >= 2 THEN 1 ELSE 0 END AS BIGINT) AS g_stop_words " +
      "FROM m") { (s, d) =>
    graft.operators.QualityFilters
      .gopherFlags(Tables.documents(s, d), "text")
      .select(col("doc_id"),
        col("g_word_count").cast("long"),
        col("g_mean_word_len").cast("long"),
        col("g_symbol_ratio").cast("long"),
        col("g_bullet_lines").cast("long"),
        col("g_ellipsis_lines").cast("long"),
        col("g_alpha_words").cast("long"),
        col("g_stop_words").cast("long"))
  }

  /** C4 line/page cleaning (Raffel et al. 2020 §2.2) through
    * [[graft.operators.QualityFilters.c4CleanLines]]: retained-line
    * counts, the cleaned text itself, and the page-drop flag — value- and
    * text-exact against the DuckDB mirror.
    */
  val qC4Clean = q(
    "q_c4_clean",
    "SELECT doc_id, CAST(len(kept) AS BIGINT) AS c4_lines_kept, " +
      "CAST(len(ls) AS BIGINT) AS c4_lines_total, " +
      "CAST(CASE WHEN contains(lower(text), 'lorem ipsum') OR contains(text, '{') " +
      "THEN 1 ELSE 0 END AS BIGINT) AS c4_page_drop, " +
      // DuckDB's array_to_string yields NULL for an empty list where
      // Spark's array_join yields '' — coalesce to the Spark behavior
      "coalesce(array_to_string(kept, chr(10)), '') AS c4_text FROM (" +
      "SELECT doc_id, text, string_split(text, chr(10)) AS ls, " +
      "list_filter(string_split(text, chr(10)), l -> " +
      "regexp_matches(l, '[.!?\"]\\s*$') AND " +
      "len(list_filter(regexp_split_to_array(trim(l), '\\s+'), x -> x <> '')) >= 5 AND " +
      "NOT contains(lower(l), 'javascript')) AS kept FROM documents)") { (s, d) =>
    graft.operators.QualityFilters
      .c4CleanLines(Tables.documents(s, d), "text")
      .select(col("doc_id"), col("c4_lines_kept"), col("c4_lines_total"),
        col("c4_page_drop").cast("long"), col("c4_text"))
  }

  /** The q_quality_classifier model: hashed-gram linear weights from a
    * pinned integer formula (`((b·2654435761 + 12345) mod 2000001) −
    * 10⁶` micro-units, a pseudorandom ±1 spread) — both engines derive
    * the SAME weight per bucket from the bucket index alone, so the
    * oracle needs no weight table, just the formula. One definition
    * drives the Spark model array and the SQL expression.
    */
  private[queries] val ClfBuckets = 4096
  private[queries] def clfWeightMicro(b: Long): Long =
    ((b * 2654435761L + 12345L) % 2000001L) - 1000000L
  private[queries] val ClfBiasMicro = 250000L
  private[queries] val ClfWeightSqlOf: String => String =
    b => s"((($b) * 2654435761 + 12345) % 2000001) - 1000000"

  // private[graft], not [queries]: the rehearsal timer drives the SAME
  // model — a re-derived copy of the formula there would silently
  // desynchronize its classifier-gate stage from the oracle-locked one
  private[graft] lazy val ClfModel: graft.operators.QualityClassifier.Model =
    graft.operators.QualityClassifier.Model(ClfBuckets,
      graft.operators.Tokenizer.Ascii.tag, ClfBiasMicro,
      Array.tabulate(ClfBuckets)(b => clfWeightMicro(b.toLong)))

  /** The q_lang_classifier multi-class fixture: 3 language models over
    * the SAME feature rule, weights from the one formula at per-class
    * bucket shifts (`clfWeightMicro(b + c·7919)`), distinct biases. ONE
    * definition drives the Spark model seq and the SQL mirror.
    */
  private[graft] val ClfMultiShift = 7919L
  private[graft] val ClfMultiBias = Array(250000L, -130000L, 40000L)
  private[graft] val ClfMultiLabels = Seq("en", "de", "fr")
  private[graft] lazy val ClfMultiModels
      : Seq[(String, graft.operators.QualityClassifier.Model)] =
    ClfMultiLabels.zipWithIndex.map { case (lbl, c) =>
      lbl -> graft.operators.QualityClassifier.Model(ClfBuckets,
        graft.operators.Tokenizer.Ascii.tag, ClfMultiBias(c),
        Array.tabulate(ClfBuckets)(b => clfWeightMicro(b + c * ClfMultiShift)))
    }

  /** The classifier scoring rule as oracle CTEs over a caller-supplied
    * `(doc_id, text-expr)` relation: grams (unigrams ∪ bigrams, ascii
    * rule) → md5 bucket → formula weight → integer sum. Ends in
    * `clf(doc_id, lg)` where `lg` is the logit WITHOUT bias (callers
    * add `ClfBiasMicro`, mirroring the Spark side's `lit(bias) + Σ`).
    * Shared with `q_curation_pipeline6`.
    */
  /** The ONE gram→bucket mirror (unnest unigrams ∪ bigrams → md5 →
    * mod buckets), parameterized on the CTE prefix so single- and
    * multi-class chains keep their established CTE names while sharing
    * the rule — two hand-maintained copies would let a bucketing change
    * split `q_quality_classifier`/pipeline6 parity from
    * `q_lang_classifier`/pipeline7 parity.
    */
  private def clfBucketCtes(prefix: String, docSql: String,
      textExpr: String): String = {
    val grams =
      s"list_concat(${tokensSqlCol(textExpr)}, ${ngramsSqlCol(textExpr, 2)})"
    val h = hash32Sql("g")
    s"${prefix}src AS ($docSql), " +
      s"${prefix}g AS (SELECT doc_id, ($h % $ClfBuckets) AS b FROM " +
      s"(SELECT doc_id, unnest($grams) AS g FROM ${prefix}src))"
  }

  private[queries] def clfCtes(docSql: String, textExpr: String): String =
    clfBucketCtes("clf", docSql, textExpr) + ", " +
      s"clf AS (SELECT doc_id, sum(${ClfWeightSqlOf("b")}) AS lg " +
      "FROM clfg GROUP BY 1)"

  /** Learned quality-classifier inference ([[graft.operators
    * .QualityClassifier]] — the FineWeb-Edu-style APPLY stage): a
    * hashed-n-gram linear model scored per document as ONE codegen'd
    * map-side projection (the [[graft.functions.DsirScore]] kernel with
    * classifier weights), gated at logit ≥ 0. The oracle recomputes the
    * full unnest → hash → formula-weight → integer-sum pipeline, so
    * logits AND keep verdicts hash-match exactly.
    */
  val qQualityClassifier = q(
    "q_quality_classifier",
    s"WITH ${clfCtes("SELECT doc_id, text FROM documents", "text")} " +
      s"SELECT d.doc_id, CAST($ClfBiasMicro + coalesce(lg, 0) AS BIGINT) " +
      "AS clf_logit_q, " +
      s"CAST(CASE WHEN $ClfBiasMicro + coalesce(lg, 0) >= 0 THEN 1 ELSE 0 " +
      "END AS INT) AS clf_keep " +
      "FROM documents d LEFT JOIN clf USING (doc_id)") { (s, d) =>
    graft.operators.QualityClassifier.classify(
      Tables.documents(s, d), "text", ClfModel, thresholdMicro = 0L)
      .select(col("doc_id"), col("clf_logit_q"), col("clf_keep"))
  }

  /** Multi-class learned language-ID ([[graft.operators.QualityClassifier
    * .classifyMulti]] — the fastText-LID stage CCNet runs first): 3
    * formula-weight language models scored by ONE fused kernel pass,
    * argmax with the lowest-index tie-break. The oracle recomputes all
    * three logits from the shared bucket CTE (the gram hashes once,
    * exactly like the kernel) and replays the tie-break as an ordered
    * CASE; logits AND labels hash-match per document.
    */
  /** The multi-class scoring + argmax rule as oracle CTEs over a
    * caller-supplied `(doc_id, text)` relation — ends in
    * `mlab(doc_id, clf_label, clf_logit_q)` with the ordered-CASE
    * tie-break (first max = lowest class index, the
    * [[graft.operators.QualityClassifier.classifyMulti]] rule). Shared
    * by `q_lang_classifier` and `q_curation_pipeline7`.
    */
  private[queries] def clfMultiCtes(docSql: String): String = {
    def w(shift: Long) = s"sum(${ClfWeightSqlOf(s"b + $shift")})"
    clfBucketCtes("mc", docSql, "text") + ", " +
      s"mlg AS (SELECT doc_id, ${w(0L)} AS s0, ${w(ClfMultiShift)} AS s1, " +
      s"${w(2 * ClfMultiShift)} AS s2 FROM mcg GROUP BY 1), " +
      s"mlab AS (SELECT doc_id, CASE WHEN l0 >= l1 AND l0 >= l2 THEN " +
      s"'${ClfMultiLabels(0)}' WHEN l1 >= l2 THEN '${ClfMultiLabels(1)}' " +
      s"ELSE '${ClfMultiLabels(2)}' END AS clf_label, " +
      "CAST(greatest(l0, l1, l2) AS BIGINT) AS clf_logit_q FROM " +
      s"(SELECT m.doc_id, ${ClfMultiBias(0)} + coalesce(s0, 0) AS l0, " +
      s"${ClfMultiBias(1)} + coalesce(s1, 0) AS l1, " +
      s"${ClfMultiBias(2)} + coalesce(s2, 0) AS l2 " +
      "FROM mcsrc m LEFT JOIN mlg USING (doc_id)))"
  }

  val qLangClassifier = q(
    "q_lang_classifier",
    s"WITH ${clfMultiCtes("SELECT doc_id, text FROM documents")} " +
      "SELECT doc_id, clf_label, clf_logit_q FROM mlab") { (s, d) =>
    graft.operators.QualityClassifier.classifyMulti(
      Tables.documents(s, d), "text", ClfMultiModels)
      .select(col("doc_id"), col("clf_label"), col("clf_logit_q"))
  }

  val all: Seq[GraftQuery] = Seq(
    qQualityGopher, qC4Clean, qQualityClassifier, qLangClassifier,
    qDedupExact, qDedupFingerprint, qDedupSurvivors, qDedupFpSurvivors,
    qMinhashSig, qDedupMinhash, qDedupMinhashUnicode, qDedupNear, qDedupNearBest,
    qDedupIncremental, qDedupIncremental2,
    qSimhash, qSimhash64Cluster,
    qWinnowFingerprint, qWinnowPairs,
    qNgramJaccard, qTextStats, qLangId, qQualityScore, qOutlierMad, qCcnetBuckets, qTokenCount,
    qRepetition, qDecontaminate, qDecontaminateBloom, qDecontaminateFrac, qBoilerplate, qStripLines, qStripLinesIncremental, qBigramRarity, qMultimodalMeta, qImageDedup, qImageDedupIncremental, qImageDedupIncremental16, qVideoOverlap, qAudioDedup, qNgramProfile,
    qCurationPipeline, qChunkTokens, qPackSequences, qPackBoundaries,
    qDedupClusters, qTfidf, qBm25, qBm25Indexed, qBm25Wand, qBm25Unicode, qBm25Batch, qBm25WandBatch, qDocReorder,
    qRedact, qPiiMask, qUrlCanon, qUrlDedup, qHtmlExtract, qHtmlLinks,
    qSplitLeakfree)
}

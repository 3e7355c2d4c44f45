package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import GraftQuery.{q, rowsOnly}

/** Embedding-similarity operators over `embeddings(vec_id, embedding:
  * array<float>, label)`: brute-force cosine top-k (baseline), IVF-style
  * centroid assignment (the scale path — restricts search to one bucket), and
  * embedding-cosine near-duplicate pairs. Dot products are computed with an
  * explicit index-ordered double fold so Spark and DuckDB produce identical
  * bits.
  */
object VectorQueries {

  /** Left-to-right double-precision dot product of two float arrays —
    * the native [[graft.functions.FloatVecDot]] expression: bit-identical
    * to `aggregate(zip_with(a, b, (x, y) => x.cast(double) *
    * y.cast(double)), 0.0, (acc, x) => acc + x)` (parity locked by
    * `FloatVecDotSpec`) with a codegen'd loop instead of a materialized
    * per-row product array.
    */
  def dotCol(a: Column, b: Column): Column =
    graft.functions.FloatVecDot.fvecDot(a, b)

  def normCol(a: Column): Column = sqrt(dotCol(a, a))

  /** DuckDB equivalents (index-ordered fold via list_sum over range). */
  def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a) + 1), i -> $a[i]::DOUBLE * $b[i]::DOUBLE))"

  def normSql(a: String): String = s"sqrt(${dotSql(a, a)})"

  /** Per-vector L2 norm (sanity of the arithmetic path). */
  val qEmbedNorm = q(
    "q_embed_norm",
    s"SELECT vec_id, label, ${Exact.quantSql(normSql("embedding"), 10000)} AS l2_e4 FROM embeddings") { (s, d) =>
    Tables.embeddingsBalanced(s, d)
      .select(col("vec_id"), col("label"),
        Exact.quant(normCol(col("embedding")), 10000).as("l2_e4"))
  }

  /** Brute-force cosine top-10 to the query vector (vec_id=0) — the exact
    * baseline every ANN variant is measured against. Query side is a
    * broadcast single row; the scan side never shuffles.
    */
  val qEmbedTopK = q(
    "q_embed_topk",
    "WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0) " +
      s"SELECT vec_id, ${Exact.quantSql(dotSql("embedding", "q") + " / (" + normSql("embedding") + " * " + normSql("q") + ")", 10000)} AS cos_e4 " +
      "FROM embeddings, qv WHERE vec_id <> 0 " +
      s"ORDER BY ${dotSql("embedding", "q")} / (${normSql("embedding")} * ${normSql("q")}) DESC, vec_id " +
      "LIMIT 10") { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val qv = emb.filter(col("vec_id") === 0).select(col("embedding").as("q"))
    emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .withColumn("cos", dotCol(col("embedding"), col("q")) /
        (normCol(col("embedding")) * normCol(col("q"))))
      .orderBy(col("cos").desc, col("vec_id"))
      .limit(10)
      .select(col("vec_id"), Exact.quant(col("cos"), 10000).as("cos_e4"))
  }

  /** IVF-style assignment: 8 fixed centroids (vec_id 0..7), every other
    * vector assigned to its max-cosine centroid (tie → lowest centroid id).
    * This is the bucketing stage of scalable ANN: search then touches one
    * bucket instead of the full corpus.
    */
  val qAnnIvf = q(
    "q_ann_ivf",
    "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8), " +
      "scored AS (SELECT vec_id, cid, " +
      s"${dotSql("embedding", "ce")} / (${normSql("embedding")} * ${normSql("ce")}) AS cos, " +
      "row_number() OVER (PARTITION BY vec_id ORDER BY " +
      s"${dotSql("embedding", "ce")} / (${normSql("embedding")} * ${normSql("ce")}) DESC, cid) AS rn " +
      "FROM embeddings, c WHERE vec_id >= 8) " +
      s"SELECT cid, count(*) AS n, CAST(sum(${Exact.quantSql("cos", 10000)}) AS BIGINT) AS sum_cos_e4 FROM scored " +
      "WHERE rn = 1 GROUP BY cid") { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val cents = graft.operators.Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    graft.operators.Similarity
      .ivfAssign(emb.filter(col("vec_id") >= 8), "vec_id", "embedding", cents)
      .groupBy(col("centroid_id").as("cid"))
      .agg(count(lit(1)).as("n"), sum(Exact.quant(col("cosine"), 10000)).as("sum_cos_e4"))
  }

  /** IVF query path ([[graft.operators.Similarity.ivfSearchTopK]]): probe
    * the 2 cells (of 8) nearest the query vector (vec_id 8), exact-cosine
    * top-10 over only those cells' members — the search half of IVF ANN,
    * scanning nprobe/k of the corpus. Oracle mirrors assignment, probe
    * selection, and ranking exactly (integer-quantized cosine).
    */
  val qAnnIvfSearch = q(
    "q_ann_ivf_search", {
      val cosCE = s"${dotSql("embedding", "ce")} / (${normSql("embedding")} * ${normSql("ce")})"
      "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8), " +
        "qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 8), " +
        s"probe AS (SELECT cid FROM c, qv ORDER BY ${dotSql("ce", "q")} / (${normSql("ce")} * ${normSql("q")}) DESC, cid LIMIT 2), " +
        s"assigned AS (SELECT vec_id, embedding, cid FROM (SELECT vec_id, embedding, cid, row_number() OVER (PARTITION BY vec_id ORDER BY $cosCE DESC, cid) AS rn " +
        "FROM embeddings, c WHERE vec_id > 8) WHERE rn = 1) " +
        s"SELECT vec_id, ${Exact.quantSql(dotSql("embedding", "q") + " / (" + normSql("embedding") + " * " + normSql("q") + ")", 10000)} AS cos_e4 " +
        "FROM assigned JOIN probe USING (cid), qv " +
        s"ORDER BY ${dotSql("embedding", "q")} / (${normSql("embedding")} * ${normSql("q")}) DESC, vec_id LIMIT 10"
    }) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val cents = graft.operators.Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    val queryVec = Tables.embeddings(s, d).filter(col("vec_id") === 8)
      .select("embedding").collect().head.getAs[Seq[Float]](0).toArray
    val assigned = graft.operators.Similarity
      .ivfAssign(emb.filter(col("vec_id") > 8), "vec_id", "embedding", cents)
    graft.operators.Similarity
      .ivfSearchTopK(assigned, "vec_id", "embedding", cents, queryVec,
        k = 10, nprobe = 2)
      .select(col("vec_id"), Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** Cluster-balanced selection (the DataComp-style embedding-space
    * balance; [[graft.operators.Sampling.clusterBalancedCap]]): assign
    * every corpus vector to its nearest of the 8 fixed centroids, keep
    * at most 40 per CLUSTER by the deterministic hash-rank rule —
    * semantic-space head clusters stop dominating the mixture. At
    * sf0.001 most cells hold ~60 vectors, so the cap genuinely bites
    * while smaller cells pass whole.
    */
  val qClusterBalanced = q(
    "q_cluster_balanced", {
      val cosCE = s"${dotSql("embedding", "ce")} / (${normSql("embedding")} * ${normSql("ce")})"
      "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8), " +
        "assigned AS (SELECT vec_id, cid, cos FROM (SELECT vec_id, cid, " +
        s"$cosCE AS cos, row_number() OVER (PARTITION BY vec_id ORDER BY " +
        s"$cosCE DESC, cid) AS rn FROM embeddings, c WHERE vec_id >= 8) WHERE rn = 1) " +
        s"SELECT vec_id, cid AS centroid_id, ${Exact.quantSql("cos", 10000)} AS cos_e4 " +
        "FROM (SELECT *, row_number() OVER (PARTITION BY cid ORDER BY " +
        s"(${TextQueries.hash32Sql("CAST(vec_id AS VARCHAR)")} % 1000), vec_id) AS kr " +
        "FROM assigned) WHERE kr <= 40"
    }) { (s, d) =>
    val cents = graft.operators.Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    graft.operators.Sampling.clusterBalancedCap(
      Tables.embeddingsBalanced(s, d).filter(col("vec_id") >= 8)
        .select("vec_id", "embedding"),
      "vec_id", "embedding", cents, cap = 40)
      .select(col("vec_id"), col("centroid_id"),
        Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** D4-style prototype drop ([[graft.operators.Sampling
    * .clusterPrototypeDrop]], Tirumala et al. 2023): within each cluster
    * drop the 40% most-prototypical vectors (nearest the centroid —
    * the semantic-redundancy mass), keep the diverse tail. The per-
    * cluster drop count is the exact integer `(n·dropPpm) div 10⁶`.
    */
  val qClusterDiverse = q(
    "q_cluster_diverse", {
      val cosCE = s"${dotSql("embedding", "ce")} / (${normSql("embedding")} * ${normSql("ce")})"
      "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8), " +
        "assigned AS (SELECT vec_id, cid, cos FROM (SELECT vec_id, cid, " +
        s"$cosCE AS cos, row_number() OVER (PARTITION BY vec_id ORDER BY " +
        s"$cosCE DESC, cid) AS rn FROM embeddings, c WHERE vec_id >= 8) WHERE rn = 1) " +
        s"SELECT vec_id, cid AS centroid_id, ${Exact.quantSql("cos", 10000)} AS cos_e4 " +
        "FROM (SELECT *, row_number() OVER (PARTITION BY cid ORDER BY cos DESC, vec_id) AS pr, " +
        "count(*) OVER (PARTITION BY cid) AS n FROM assigned) " +
        "WHERE pr > (n * 400000) // 1000000"
    }) { (s, d) =>
    val cents = graft.operators.Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    graft.operators.Sampling.clusterPrototypeDrop(
      Tables.embeddingsBalanced(s, d).filter(col("vec_id") >= 8)
        .select("vec_id", "embedding"),
      "vec_id", "embedding", cents, dropPpm = 400000L)
      .select(col("vec_id"), col("centroid_id"),
        Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** Batch IVF serving ([[graft.operators.Similarity.ivfJoinTopK]]): every
    * query in the set (vec_id 8, 9) probes its own 2 nearest of the 8
    * cells, exact cosine top-10 within the probed cells — the bulk
    * query path of the IVF index. The oracle mirrors the per-query probe
    * selection (row_number over centroid cosines), the assignment, and the
    * per-query ranking.
    */
  val qAnnIvfSearchBatch = q(
    "q_ann_ivf_search_batch", {
      val cosCE = s"${dotSql("embedding", "ce")} / (${normSql("embedding")} * ${normSql("ce")})"
      val cosQ = s"${dotSql("embedding", "q")} / (${normSql("embedding")} * ${normSql("q")})"
      "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8), " +
        "qv AS (SELECT vec_id AS qid, embedding AS q FROM embeddings WHERE vec_id IN (8, 9)), " +
        "probe AS (SELECT qid, cid FROM (SELECT qid, cid, row_number() OVER " +
        s"(PARTITION BY qid ORDER BY ${dotSql("ce", "q")} / (${normSql("ce")} * ${normSql("q")}) DESC, cid) AS rn " +
        "FROM c, qv) WHERE rn <= 2), " +
        s"assigned AS (SELECT vec_id, embedding, cid FROM (SELECT vec_id, embedding, cid, row_number() OVER (PARTITION BY vec_id ORDER BY $cosCE DESC, cid) AS rn " +
        "FROM embeddings, c WHERE vec_id > 9) WHERE rn = 1) " +
        s"SELECT qid, vec_id, ${Exact.quantSql(cosQ, 10000)} AS cos_e4 " +
        "FROM assigned JOIN probe USING (cid) JOIN qv USING (qid) " +
        s"QUALIFY row_number() OVER (PARTITION BY qid ORDER BY $cosQ DESC, vec_id) <= 10"
    }) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val cents = graft.operators.Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    val qdf = Tables.embeddings(s, d)
      .filter(col("vec_id") === 8 || col("vec_id") === 9)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val assigned = graft.operators.Similarity
      .ivfAssign(emb.filter(col("vec_id") > 9), "vec_id", "embedding", cents)
    graft.operators.Similarity
      .ivfJoinTopK(assigned, qdf, "vec_id", "embedding", "qid", "qvec",
        cents, k = 10, nprobe = 2)
      .select(col("qid"), col("vec_id"),
        Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** IVF-PQ search ([[graft.operators.Pq.ivfPqSearchTopK]]): the full
    * compressed-index pipeline — 16×256 PQ codebooks trained by
    * integer-exact Lloyd k-means, every corpus vector encoded to 16 code
    * bytes, the 2 nearest of 8 cells probed, candidates ranked by
    * integer-exact ADC (16 table lookups per row, no float vector read),
    * the top-256 shortlist re-scored EXACTLY against full vectors, top-10
    * returned. The rerank contract makes the output the probed-cell exact
    * top-10 — which is precisely what the oracle computes (same probe
    * selection, same assignment, same ranking as `q_ann_ivf_search`).
    * PqSpec locks the contract at full rerank and measures the shortlist
    * recall; SCALE.md carries the index-bytes-vs-raw row.
    */
  val qAnnIvfPq = q(
    "q_ann_ivfpq", {
      val cosCE = s"${dotSql("embedding", "ce")} / (${normSql("embedding")} * ${normSql("ce")})"
      "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8), " +
        "qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 8), " +
        s"probe AS (SELECT cid FROM c, qv ORDER BY ${dotSql("ce", "q")} / (${normSql("ce")} * ${normSql("q")}) DESC, cid LIMIT 2), " +
        s"assigned AS (SELECT vec_id, embedding, cid FROM (SELECT vec_id, embedding, cid, row_number() OVER (PARTITION BY vec_id ORDER BY $cosCE DESC, cid) AS rn " +
        "FROM embeddings, c WHERE vec_id > 8) WHERE rn = 1) " +
        s"SELECT vec_id, ${Exact.quantSql(dotSql("embedding", "q") + " / (" + normSql("embedding") + " * " + normSql("q") + ")", 10000)} AS cos_e4 " +
        "FROM assigned JOIN probe USING (cid), qv " +
        s"ORDER BY ${dotSql("embedding", "q")} / (${normSql("embedding")} * ${normSql("q")}) DESC, vec_id LIMIT 10"
    }) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val corpus = emb.filter(col("vec_id") > 8)
    val cents = graft.operators.Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    val queryVec = Tables.embeddings(s, d).filter(col("vec_id") === 8)
      .select("embedding").collect().head.getAs[Seq[Float]](0).toArray
    val cb = graft.operators.Pq.train(corpus, "vec_id", "embedding",
      subspaces = 16, codes = 256, iters = 3)
    val encoded = graft.operators.Pq.encode(
      graft.operators.Similarity.ivfAssign(corpus, "vec_id", "embedding", cents),
      "embedding", cb)
    graft.operators.Pq.ivfPqSearchTopK(encoded, corpus, "vec_id", "embedding",
        cents, cb, queryVec, k = 10, rerankK = 256, nprobe = 2)
      .select(col("vec_id"), Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** IVFADC residual-encoded search ([[graft.operators.Pq.trainResidual]]
    * / [[Pq.encodeResidual]], Jégou TPAMI'11 §IV): codebooks quantize
    * `x − centroid(cell)` so their bits model within-cell variance, the
    * ADC estimate adds the driver-computed per-cell coarse offset
    * `q·c(cell)`, and the full PERSISTED-index lifecycle runs under the
    * residual tag — build half the corpus via writeIndex (the `enc` tag
    * lands in `_pq_codebooks`), APPEND the other half (the append
    * resolves encoding + centroids + codebooks from the index itself),
    * probe the merged index. Same oracle as `q_ann_ivfpq`: the exact
    * rerank makes the output the probed-cell exact top-10 regardless of
    * encoding — what differs is shortlist recall at small rerankK, and
    * SCALE.md's r15 grid measured that honestly: on this near-random
    * synthetic corpus residual does NOT beat raw (see [[graft.operators.Pq]]
    * scaladoc); the entry locks the residual LIFECYCLE, not a recall win.
    */
  val qAnnIvfPqResidual = q(
    "q_ann_ivfpq_residual",
    qAnnIvfPq.oracle.get) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val corpus = emb.filter(col("vec_id") > 8)
    val cents = graft.operators.Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    val queryVec = Tables.embeddings(s, d).filter(col("vec_id") === 8)
      .select("embedding").collect().head.getAs[Seq[Float]](0).toArray
    val cb = graft.operators.Pq.trainResidual(corpus, "vec_id", "embedding",
      cents, subspaces = 16, codes = 256, iters = 3)
    val idx = TextQueries.scratchDir("graft_pqidx_res", d)
    val half1 = corpus.filter(col("vec_id") % 2 === 0)
    val half2 = corpus.filter(col("vec_id") % 2 === 1)
    graft.operators.Pq.writeIndex(
      graft.operators.Pq.encodeResidual(
        graft.operators.Similarity.ivfAssign(half1, "vec_id", "embedding",
          cents), "embedding", cb, cents),
      "vec_id", cents, cb, idx)
    graft.operators.Pq.appendToIndex(half2, "vec_id", "embedding", idx)
    graft.operators.Pq.ivfPqSearchTopK(
        graft.operators.Pq.readIndex(s, idx), corpus, "vec_id", "embedding",
        cents, graft.operators.Pq.readCodebooks(s, idx), queryVec,
        k = 10, rerankK = 256, nprobe = 2)
      .select(col("vec_id"), Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** STREAMING-INGESTED IVF-PQ index ([[graft.operators.Pq.ingestPqBatch]]
    * / [[graft.operators.Pq.streamingPqIngest]] /
    * [[graft.operators.Pq.readIndex]]): a third of the corpus builds the
    * base via writeIndex; the other two thirds arrive as TWO ingest-loop
    * microbatches landing in idempotent `_ingest/<queryTag>/b_<id>`
    * subtrees (encoding self-configured from the index's own `_centroids`
    * + `_pq_codebooks`); batch 1 is then REPLAYED — the crash-recovery
    * path — and must overwrite its own subtree, not duplicate it. The
    * probe reads the base ∪ ingest union and, by the rerank contract,
    * returns exactly the probed-cell exact top-10 over the FULL corpus —
    * the same oracle as `q_ann_ivfpq` (which never leaves memory), so a
    * dropped, duplicated, or double-counted streamed row breaks the
    * hash.
    */
  val qAnnIvfPqIncremental = q(
    "q_ann_ivfpq_incremental",
    qAnnIvfPq.oracle.get) { (s, d) =>
    import graft.operators.{IndexLifecycle, Pq, Similarity}
    val emb = Tables.embeddingsBalanced(s, d)
    val corpus = emb.filter(col("vec_id") > 8)
    val cents = Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    val queryVec = Tables.embeddings(s, d).filter(col("vec_id") === 8)
      .select("embedding").collect().head.getAs[Seq[Float]](0).toArray
    val cb = Pq.train(corpus, "vec_id", "embedding",
      subspaces = 16, codes = 256, iters = 3)
    val idx = TextQueries.scratchDir("graft_pqidx_inc", d)
    Pq.writeIndex(Pq.encode(
        Similarity.ivfAssign(corpus.filter(col("vec_id") % 3 === 0),
          "vec_id", "embedding", cents), "embedding", cb),
      "vec_id", cents, cb, idx)
    val tag = IndexLifecycle.queryTagOf(s, s"$idx/_ckpt")
    val batch1 = corpus.filter(col("vec_id") % 3 === 1)
    Pq.ingestPqBatch(batch1, "vec_id", "embedding", idx, tag, 0L)
    Pq.ingestPqBatch(corpus.filter(col("vec_id") % 3 === 2),
      "vec_id", "embedding", idx, tag, 1L)
    Pq.ingestPqBatch(batch1, "vec_id", "embedding", idx, tag, 0L) // replay
    Pq.ivfPqSearchTopK(Pq.readIndex(s, idx), corpus, "vec_id", "embedding",
        cents, Pq.readCodebooks(s, idx), queryVec,
        k = 10, rerankK = 256, nprobe = 2)
      .select(col("vec_id"), Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** BATCH IVF-PQ serving ([[graft.operators.Pq.ivfPqJoinTopK]]): the
    * compressed-index pipeline for a query SET in one plan — per-query
    * probe cells + ADC tables prepared driver-side (bounded by the
    * batch), candidates scored by the native batch ADC kernel, per-query
    * top-256 shortlists broadcast into the exact-cosine rerank. Same
    * setup as `q_ann_ivf_search_batch` (queries = vec 8, 9; corpus > 9;
    * 2 of 8 cells), and the same oracle: the rerank contract makes each
    * query's output the probed-cell exact top-10.
    */
  val qAnnIvfPqBatch = q(
    "q_ann_ivfpq_batch",
    qAnnIvfSearchBatch.oracle.get) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val corpus = emb.filter(col("vec_id") > 9)
    val cents = graft.operators.Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    val cb = graft.operators.Pq.train(corpus, "vec_id", "embedding",
      subspaces = 16, codes = 256, iters = 3)
    val encoded = graft.operators.Pq.encode(
      graft.operators.Similarity.ivfAssign(corpus, "vec_id", "embedding", cents),
      "embedding", cb)
    val qdf = Tables.embeddings(s, d)
      .filter(col("vec_id") === 8 || col("vec_id") === 9)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    graft.operators.Pq.ivfPqJoinTopK(encoded, corpus, "vec_id", "embedding",
        qdf, "qid", "qvec", cents, cb, k = 10, rerankK = 256, nprobe = 2)
      .select(col("query_id").as("qid"), col("vec_id"),
        Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** Multi-probe LSH ANN ([[graft.operators.Similarity.annTopKMultiProbe]]):
    * the query's bucket plus the 3 flip-sets with the smallest TOTAL
    * hyperplane |margin| (globally ordered across flip sizes — a pair of
    * low-margin flips may beat one high-margin flip), exact cosine top-10
    * over the probed buckets. The oracle mirrors the margins (same literal
    * ±1 hyperplanes, same fold order) and the flip selection by enumerating
    * every nonzero flip mask and sorting by (total |margin|, mask) — the
    * exact order the operator's heap emits.
    */
  val qAnnMultiProbe = q(
    "q_ann_multiprobe", {
      val nBits = 8
      // per-bit margin: dot(q, h_j) as one scalar expression per bit
      val marginRows = (0 until nBits).map { j =>
        val lits = Vectors.hyperplane(j, Vectors.Dim)
          .map(x => if (x > 0) "1.0" else "-1.0").mkString(", ")
        s"SELECT $j AS b, list_sum(list_transform(range(1, ${Vectors.Dim + 1}), " +
          s"i -> q[i]::DOUBLE * ([$lits])[i])) AS d FROM qv"
      }.mkString(" UNION ALL ")
      "WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0), " +
        s"m AS ($marginRows), " +
        "qb AS (SELECT CAST(sum(CASE WHEN d > 0 THEN 1 << b ELSE 0 END) AS INT) AS qbucket FROM m), " +
        s"flips AS (SELECT mask FROM (SELECT t.mask, " +
        "(SELECT sum(abs(d)) FROM m WHERE ((t.mask >> b) & 1) = 1) AS tot " +
        s"FROM range(1, ${1 << nBits}) t(mask)) ORDER BY tot, mask LIMIT 3), " +
        "probes AS (SELECT qbucket AS bkt FROM qb " +
        "UNION SELECT xor(qbucket, CAST(mask AS INT)) FROM qb, flips), " +
        s"bk AS (SELECT vec_id, embedding, ${Vectors.lshBucketSql("embedding", nBits)} AS bkt " +
        "FROM embeddings WHERE vec_id <> 0) " +
        s"SELECT vec_id, ${Exact.quantSql(dotSql("embedding", "q") + " / (" + normSql("embedding") + " * " + normSql("q") + ")", 10000)} AS cos_e4 " +
        "FROM bk JOIN probes USING (bkt), qv " +
        s"ORDER BY ${dotSql("embedding", "q")} / (${normSql("embedding")} * ${normSql("q")}) DESC, vec_id LIMIT 10"
    }) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val queryVec = Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select("embedding").collect().head.getAs[Seq[Float]](0).toArray
    graft.operators.Similarity
      .annTopKMultiProbe(emb.filter(col("vec_id") =!= 0), "vec_id",
        "embedding", queryVec, k = 10, nBits = 8, probes = 4)
      .select(col("vec_id"), Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** Embedding-cosine near-duplicate pairs via banded random-hyperplane LSH
    * (4 bands × 4 bits, blocked by label): candidates come from bucket
    * agreement in SOME band, the exact cosine > threshold is the verify
    * stage. The pair join shuffles on (label, band, bucket) — bounded
    * buckets — never on the fixed-cardinality label alone, which would be
    * O(N²/|labels|) at 100 TB. The oracle mirrors the banding bit-exactly
    * (literal ±1 hyperplanes, index-ordered folds); the operator's
    * hot-bucket star guard sits far above any organic bucket at test SFs,
    * so it does not need mirroring.
    *
    * Threshold 0.35 rather than a real near-dup 0.9: the synthetic
    * embeddings top out at cosine ~0.47, so 0.35 is what makes the verify
    * stage actually fire on test data (pairs at sf0.01: 20). Recall at the
    * unusually-wide θ = acos(0.35) is ~0.7; for true near-dups (cos > 0.9)
    * the same 4×4 banding catches ~0.96.
    */
  val qEmbedNearDup = q(
    "q_embed_near_dup", {
      val bands = 4; val bits = 4
      val bandSel = (0 until bands).map(b =>
        s"SELECT vec_id, label, $b AS band, " +
          s"${Vectors.lshBandBucketSql("embedding", b, bits)} AS bkt FROM embeddings")
        .mkString(" UNION ALL ")
      val cos = s"${dotSql("a.embedding", "b.embedding")} / (a.nrm * b.nrm)"
      s"WITH e AS (SELECT vec_id, label, embedding, ${normSql("embedding")} AS nrm FROM embeddings), " +
        s"bk AS ($bandSel), " +
        "cand AS (SELECT DISTINCT x.vec_id AS ida, y.vec_id AS idb FROM bk x " +
        "JOIN bk y ON x.label = y.label AND x.band = y.band AND x.bkt = y.bkt " +
        "AND x.vec_id < y.vec_id) " +
        s"SELECT ida, idb, ${Exact.quantSql(cos, 10000)} AS cos_e4 FROM cand " +
        "JOIN e a ON a.vec_id = ida JOIN e b ON b.vec_id = idb " +
        s"WHERE $cos > 0.35"
    }) { (s, d) =>
    graft.operators.Similarity.nearDupPairs(
        Tables.embeddingsBalanced(s, d), "vec_id", "embedding",
        minCosine = 0.35, blockCols = Seq("label"), bands = 4, bitsPerBand = 4)
      .select(col("ida"), col("idb"), Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** LSH bucket histogram (random-hyperplane SimHash over embeddings): 12
    * deterministic xorshift-derived hyperplanes. The hyperplanes are literal
    * ±1 arrays, so the identical bucket arithmetic is expressible in DuckDB
    * (bucket recall vs brute force is additionally asserted in the spec).
    */
  val qAnnLsh = q(
    "q_ann_lsh",
    "SELECT bucket, count(*) AS n, min(vec_id) AS min_id FROM (" +
      s"SELECT vec_id, ${Vectors.lshBucketSql("embedding", 12)} AS bucket " +
      "FROM embeddings) GROUP BY bucket") { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val bucketed = emb.withColumn("bucket", Vectors.lshBucket(col("embedding"), 12))
    bucketed.groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("vec_id").as("min_id"))
  }

  /** Batch multi-query ANN — the 100 TB shape: a query SET joins the corpus
    * on LSH bucket id (corpus bucket is computed map-side, query side is
    * broadcast), then per-query top-k ranks only the bucket's candidates.
    * The corpus never shuffles; the window runs over candidates, not corpus.
    */
  val qAnnMulti = q(
    "q_ann_multi", {
      val b = Vectors.lshBucketSql("embedding", 8)
      val cos = s"${dotSql("c.embedding", "qv")} / (${normSql("c.embedding")} * ${normSql("qv")})"
      s"WITH c AS (SELECT vec_id, embedding, $b AS bkt FROM embeddings WHERE vec_id >= 16), " +
        s"qs AS (SELECT vec_id AS qid, embedding AS qv, $b AS qbkt FROM embeddings WHERE vec_id < 16), " +
        s"cand AS (SELECT qid, c.vec_id AS vec_id, $cos AS cos, " +
        s"row_number() OVER (PARTITION BY qid ORDER BY $cos DESC, c.vec_id) AS rn " +
        "FROM c JOIN qs ON c.bkt = qs.qbkt) " +
        s"SELECT qid, vec_id, ${Exact.quantSql("cos", 10000)} AS cos_e4 FROM cand WHERE rn <= 3"
    }) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val corpus = emb.filter(col("vec_id") >= 16).select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    graft.operators.Similarity
      .annJoinTopK(corpus, queries, "vec_id", "embedding", "qid", "qvec", k = 3, nBits = 8)
      .select(col("qid"), col("vec_id"), Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** Int8 symmetric quantization — the storage/bandwidth step of an
    * embedding pipeline (4× smaller vectors for ANN candidate scans). Per
    * vector: scale = 127 / max|x|, q_i = ⌊x_i·scale + 0.5⌋ ∈ [−127, 127].
    * Pure map-side — no shuffle at any scale. The oracle pins the full
    * quantized vector through two order-sensitive digests (plain sum +
    * position-weighted sum) rather than comparing arrays textually.
    */
  val qEmbedQuant = q(
    "q_embed_quant", {
      val m = "list_max(list_transform(embedding, x -> abs(x::DOUBLE)))"
      val sc = s"(CASE WHEN $m = 0 THEN 0.0 ELSE 127.0 / $m END)"
      def qi(ix: String) = s"CAST(floor(embedding[$ix]::DOUBLE * sc + 0.5) AS BIGINT)"
      // list_sum types as DOUBLE/HUGEINT — CAST keeps the digests int64
      s"SELECT vec_id, ${Exact.quantSql("sc", 1000000)} AS scale_e6, " +
        s"CAST(list_sum(list_transform(range(1, len(embedding) + 1), i -> ${qi("i")})) AS BIGINT) AS qsum, " +
        s"CAST(list_sum(list_transform(range(1, len(embedding) + 1), i -> ${qi("i")} * ((i - 1) % 31 + 1))) AS BIGINT) AS qdot " +
        s"FROM (SELECT vec_id, embedding, $sc AS sc FROM embeddings)"
    }) { (s, d) =>
    graft.operators.Similarity
      .quantizeInt8(Tables.embeddingsBalanced(s, d), "embedding")
      .select(col("vec_id"), Exact.quant(col("q_scale"), 1000000).as("scale_e6"),
        aggregate(col("q_vec"), lit(0L), (a, x) => a + x.cast("long")).as("qsum"),
        aggregate(zip_with(col("q_vec"), sequence(lit(0), size(col("q_vec")) - 1),
            (x, i) => x.cast("long") * ((i % 31) + 1).cast("long")),
          lit(0L), (a, x) => a + x).as("qdot"))
  }

  /** One k-means (Lloyd) update step over the IVF assignment: per cluster,
    * the count and the per-dimension sums — the sufficient statistics of the
    * new centroid (mean = sums / n). Elements quantize to integers BEFORE
    * summing (row-order-independent, exact on both engines); the per-dim sum
    * vector is pinned through a position-weighted digest, which is linear in
    * the element sums, so it folds per ROW and aggregates with plain SUM —
    * no dimension explode, map-side partials all the way. An IVF training
    * loop is this step iterated with re-collected centroids.
    */
  val qKmeansStep = q(
    "q_kmeans_step", {
      val cos = s"${dotSql("embedding", "ce")} / (${normSql("embedding")} * ${normSql("ce")})"
      def xq(ix: String) = s"CAST(floor(embedding[$ix]::DOUBLE * 1000000 + 0.5) AS BIGINT)"
      "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8), " +
        s"scored AS (SELECT vec_id, embedding, cid, row_number() OVER (" +
        s"PARTITION BY vec_id ORDER BY $cos DESC, cid) AS rn " +
        "FROM embeddings, c WHERE vec_id >= 8) " +
        "SELECT cid, CAST(count(*) AS BIGINT) AS n, " +
        s"CAST(sum(CAST(list_sum(list_transform(range(1, len(embedding) + 1), i -> ${xq("i")})) AS BIGINT)) AS BIGINT) AS sum_q, " +
        s"CAST(sum(CAST(list_sum(list_transform(range(1, len(embedding) + 1), i -> ${xq("i")} * ((i - 1) % 31 + 1))) AS BIGINT)) AS BIGINT) AS dot_q " +
        "FROM scored WHERE rn = 1 GROUP BY cid"
    }) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val cents = graft.operators.Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    // digest the operator's per-dim sums (both digests are linear in the
    // element sums, so they equal the oracle's per-row formulation exactly)
    graft.operators.Similarity
      .kmeansStep(emb.filter(col("vec_id") >= 8), "vec_id", "embedding", cents)
      .select(col("cid"), col("n"),
        aggregate(col("sums"), lit(0L), (a, x) => a + x).as("sum_q"),
        aggregate(zip_with(col("sums"), sequence(lit(0), size(col("sums")) - 1),
            (x, i) => x * ((i % 31) + 1).cast("long")),
          lit(0L), (a, x) => a + x).as("dot_q"))
  }

  /** k-means|| seeding over the embeddings corpus. The hash-randomized
    * sampling itself has no DuckDB mirror, so the entry oracle-checks the
    * algorithm's CONTRACT instead (the approx-entry pattern): exactly k
    * seed rows; every seed is a bit-exact member of the corpus (k-means‖
    * samples and farthest-point-REDUCES actual points — it never
    * averages, so float equality is exact); and the k seed vectors are
    * pairwise distinct. The DuckDB side locks all three. Cluster-quality
    * determinism stays spec-locked in `OperatorsSpec` (planted-cluster
    * test). Exercises the distributed seeding passes end-to-end at bench
    * scale.
    */
  val qKmeansSeed = q(
    "q_kmeans_seed",
    "SELECT unnest(range(0, 8)) AS seed_id, " +
      "CAST(1 AS BIGINT) AS in_corpus, CAST(1 AS BIGINT) AS seeds_distinct") { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val seeds = graft.operators.Similarity.kmeansSeedParallel(
      emb, "vec_id", "embedding", k = 8, rounds = 3, seed = 42L)
    val distinctOk = seeds.map(_._2.toSeq).distinct.size == seeds.size
    import s.implicits._
    val seedDf = seeds.map { case (cid, v) => (cid.toLong, v) }
      .toDF("seed_id", "__sv")
    // membership via a BROADCAST probe of the k-row seed frame against the
    // streaming corpus scan (map-side, then a k-row aggregate) — a
    // distinct() of corpus vectors + array-keyed join would shuffle every
    // embedding just to answer 8 lookups
    val matches = emb.join(broadcast(seedDf),
        col("embedding") === col("__sv"))
      .groupBy(col("seed_id")).agg(count(lit(1)).as("__m"))
    seedDf.join(matches, Seq("seed_id"), "left")
      .select(col("seed_id"),
        when(col("__m").isNotNull, 1L).otherwise(0L).as("in_corpus"),
        lit(if (distinctOk) 1L else 0L).as("seeds_distinct"))
  }

  /** Batch multi-probe ANN
    * ([[graft.operators.Similarity.annJoinTopKMultiProbe]]): every query in
    * the set probes its own bucket plus the 2 lowest-|margin| single-bit
    * flips, computed in-plan — no driver loop. The oracle mirrors the
    * per-query margins (identical literal hyperplanes and fold order), the
    * flip selection (QUALIFY over (|margin|, bit)), and the per-query
    * ranking.
    */
  val qAnnMultiProbeBatch = q(
    "q_ann_multiprobe_batch", {
      val nBits = 6
      val marginRows = (0 until nBits).map { j =>
        val lits = Vectors.hyperplane(j, Vectors.Dim)
          .map(x => if (x > 0) "1.0" else "-1.0").mkString(", ")
        s"SELECT qid, $j AS b, list_sum(list_transform(range(1, ${Vectors.Dim + 1}), " +
          s"i -> q[i]::DOUBLE * ([$lits])[i])) AS d FROM qv"
      }.mkString(" UNION ALL ")
      "WITH qv AS (SELECT vec_id AS qid, embedding AS q FROM embeddings WHERE vec_id < 2), " +
        s"m AS ($marginRows), " +
        "qb AS (SELECT qid, CAST(sum(CASE WHEN d > 0 THEN 1 << b ELSE 0 END) AS INT) AS qbucket FROM m GROUP BY qid), " +
        "flips AS (SELECT qid, b FROM m QUALIFY row_number() OVER (PARTITION BY qid ORDER BY abs(d), b) <= 2), " +
        "probes AS (SELECT qid, qbucket AS bkt FROM qb " +
        "UNION SELECT qb.qid, xor(qbucket, 1 << b) FROM qb JOIN flips ON qb.qid = flips.qid), " +
        s"bk AS (SELECT vec_id, embedding, ${Vectors.lshBucketSql("embedding", nBits)} AS bkt " +
        "FROM embeddings WHERE vec_id >= 2) " +
        s"SELECT qid, vec_id, ${Exact.quantSql(dotSql("embedding", "q") + " / (" + normSql("embedding") + " * " + normSql("q") + ")", 10000)} AS cos_e4 " +
        "FROM bk JOIN probes USING (bkt) JOIN qv USING (qid) " +
        s"QUALIFY row_number() OVER (PARTITION BY qid ORDER BY ${dotSql("embedding", "q")} / (${normSql("embedding")} * ${normSql("q")}) DESC, vec_id) <= 5"
    }) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val qdf = Tables.embeddings(s, d).filter(col("vec_id") < 2)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    graft.operators.Similarity
      .annJoinTopKMultiProbe(emb.filter(col("vec_id") >= 2), qdf,
        "vec_id", "embedding", "qid", "qvec", k = 5, nBits = 6, probes = 3)
      .select(col("qid"), col("vec_id"),
        Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** Batch multi-probe ANN in the DEEP regime (probes > nBits + 1):
    * multi-bit flip masks in the full Lv'07 global total-margin order,
    * generated per query row by the native heap expression
    * ([[graft.functions.Lv07ProbeMasksExpr]]) — fully in-plan, no driver
    * collect. The oracle enumerates ALL 2^nBits − 1 masks per query,
    * scores each by its flipped bits' total |margin|, and takes the first
    * probes − 1 in (total, mask) order — the same global order the heap
    * emits — then mirrors the probe join and per-query ranking.
    */
  val qAnnMultiProbeDeep = q(
    "q_ann_multiprobe_deep", {
      val nBits = 5
      val probes = 13 // > nBits + 1 = 6: the deep regime
      val marginRows = (0 until nBits).map { j =>
        val lits = Vectors.hyperplane(j, Vectors.Dim)
          .map(x => if (x > 0) "1.0" else "-1.0").mkString(", ")
        s"SELECT qid, $j AS b, list_sum(list_transform(range(1, ${Vectors.Dim + 1}), " +
          s"i -> q[i]::DOUBLE * ([$lits])[i])) AS d FROM qv"
      }.mkString(" UNION ALL ")
      "WITH qv AS (SELECT vec_id AS qid, embedding AS q FROM embeddings WHERE vec_id < 3), " +
        s"m AS ($marginRows), " +
        "qb AS (SELECT qid, CAST(sum(CASE WHEN d > 0 THEN 1 << b ELSE 0 END) AS INT) AS qbucket FROM m GROUP BY qid), " +
        "flips AS (SELECT qid, mask FROM (" +
        "SELECT ids.qid AS qid, t.mask, " +
        "(SELECT sum(abs(d)) FROM m WHERE m.qid = ids.qid AND ((t.mask >> b) & 1) = 1) AS tot " +
        s"FROM (SELECT DISTINCT qid FROM qv) ids, range(1, ${1 << nBits}) t(mask)) " +
        s"QUALIFY row_number() OVER (PARTITION BY qid ORDER BY tot, mask) <= ${probes - 1}), " +
        "probes AS (SELECT qid, qbucket AS bkt FROM qb " +
        "UNION SELECT qb.qid, xor(qbucket, CAST(mask AS INT)) FROM qb JOIN flips ON qb.qid = flips.qid), " +
        s"bk AS (SELECT vec_id, embedding, ${Vectors.lshBucketSql("embedding", nBits)} AS bkt " +
        "FROM embeddings WHERE vec_id >= 3) " +
        s"SELECT qid, vec_id, ${Exact.quantSql(dotSql("embedding", "q") + " / (" + normSql("embedding") + " * " + normSql("q") + ")", 10000)} AS cos_e4 " +
        "FROM bk JOIN probes USING (bkt) JOIN qv USING (qid) " +
        s"QUALIFY row_number() OVER (PARTITION BY qid ORDER BY ${dotSql("embedding", "q")} / (${normSql("embedding")} * ${normSql("q")}) DESC, vec_id) <= 5"
    }) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val qdf = Tables.embeddings(s, d).filter(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    graft.operators.Similarity
      .annJoinTopKMultiProbe(emb.filter(col("vec_id") >= 3), qdf,
        "vec_id", "embedding", "qid", "qvec", k = 5, nBits = 5, probes = 13)
      .select(col("qid"), col("vec_id"),
        Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** Whole-sample exact top-5 per query via the k-capped heap aggregate
    * ([[graft.functions.TopKIdsAgg]]) — the one-job exact side of
    * `annRecallAtBatch`: query vectors ride as broadcast literals, the
    * explode feeds partial aggregation directly (shuffle = partitions ×
    * queries × k rows, never |corpus| × |queries|). The oracle mirrors the
    * ranking (cosine desc, id asc — identical double fold) with a window +
    * ordered list; ids emit as a CSV string so both engines render
    * identically.
    */
  val qAnnTopkBatch = q(
    "q_ann_topk_batch",
    "WITH qv AS (SELECT vec_id AS qid, embedding AS q FROM embeddings WHERE vec_id < 3), " +
      "c AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 3), " +
      s"scored AS (SELECT qid, vec_id, ${dotSql("embedding", "q")} / (${normSql("embedding")} * ${normSql("q")}) AS cs FROM c, qv), " +
      "ranked AS (SELECT qid, vec_id, row_number() OVER (PARTITION BY qid ORDER BY cs DESC, vec_id) AS rn FROM scored) " +
      "SELECT qid, array_to_string(list(vec_id ORDER BY rn), ',') AS ids_csv " +
      "FROM ranked WHERE rn <= 5 GROUP BY qid") { (s, d) =>
    graft.functions.TopKIdsAgg.register(s)
    val queries = Tables.embeddings(s, d).filter(col("vec_id") < 3)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toIndexedSeq))
    val qlits = array(queries.map { case (qi, qv) =>
      struct(lit(qi).as("qid"), array(qv.map(lit(_)): _*).as("qvec"))
    }.toIndexedSeq: _*)
    Tables.embeddingsBalanced(s, d).filter(col("vec_id") >= 3)
      .select(col("vec_id"), col("embedding"))
      .withColumn("__q", explode(qlits))
      .select(col("__q.qid").as("qid"),
        (dotCol(col("embedding"), col("__q.qvec")) /
          (normCol(col("embedding")) * normCol(col("__q.qvec")))).as("cs"),
        col("vec_id"))
      .groupBy("qid")
      .agg(graft.functions.TopKIdsAgg.topkIds(col("cs"), col("vec_id"), 5).as("ids"))
      .select(col("qid"),
        concat_ws(",", transform(col("ids"), _.cast("string"))).as("ids_csv"))
  }

  /** SemDeDup ([[graft.operators.Similarity.semDedupFlag]], Abbas et al.
    * arXiv:2303.09540): 8 fixed centroids (vec_id 0..7), every other vector
    * assigned to its max-cosine centroid, then flagged as a semantic
    * duplicate iff some LOWER-id vector in the same cell has cosine > 0.35
    * (the deterministic dominated-by-earlier variant of the paper's
    * keep-one-exemplar policy). The oracle mirrors assignment argmax
    * (tie → lowest cid) and the within-cell EXISTS over the identical
    * double-fold cosine, so the flag is bit-reproducible. 0.35 rather than
    * a production 0.9+ for the same reason as q_embed_near_dup: the
    * synthetic embeddings top out near cosine 0.47, and 0.35 makes the
    * policy actually fire (~75 of 492 rows flagged).
    */
  val qSemDedup = q(
    "q_semdedup", {
      val cosCE = s"${dotSql("embedding", "ce")} / (${normSql("embedding")} * ${normSql("ce")})"
      val cosAB = s"${dotSql("a.embedding", "b.embedding")} / (${normSql("a.embedding")} * ${normSql("b.embedding")})"
      "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8), " +
        "assigned AS (SELECT vec_id, embedding, cid FROM (" +
        s"SELECT vec_id, embedding, cid, row_number() OVER (PARTITION BY vec_id ORDER BY $cosCE DESC, cid) AS rn " +
        "FROM embeddings, c WHERE vec_id >= 8) WHERE rn = 1), " +
        "rm AS (SELECT DISTINCT b.vec_id FROM assigned a JOIN assigned b " +
        s"ON a.cid = b.cid AND a.vec_id < b.vec_id WHERE $cosAB > 0.35) " +
        "SELECT a.vec_id, a.cid, (rm.vec_id IS NOT NULL) AS is_semdup " +
        "FROM assigned a LEFT JOIN rm ON a.vec_id = rm.vec_id"
    }) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val cents = graft.operators.Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    graft.operators.Similarity
      .semDedupFlag(emb.filter(col("vec_id") >= 8).select("vec_id", "embedding"),
        "vec_id", "embedding", cents, tau = 0.35)
      .select(col("vec_id"), col("centroid_id").as("cid"), col("is_semdup"))
  }

  /** SemDeDup survivor policy ([[graft.operators.Similarity.semDedupBy]]):
    * semantic groups = connected components of the within-cell cos > 0.35
    * graph; each group keeps its HIGHEST-NORM member (ties → lowest id)
    * instead of the earliest id. The oracle composes the same recursive
    * transitive closure as `q_dedup_clusters` over the cell-scoped pair
    * set, then ranks members by the identical double-fold norm.
    */
  val qSemDedupBest = q(
    "q_semdedup_best", {
      val cosCE = s"${dotSql("embedding", "ce")} / (${normSql("embedding")} * ${normSql("ce")})"
      val cosAB = s"${dotSql("a.embedding", "b.embedding")} / (${normSql("a.embedding")} * ${normSql("b.embedding")})"
      "WITH RECURSIVE c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8), " +
        "assigned AS (SELECT vec_id, embedding, cid FROM (" +
        s"SELECT vec_id, embedding, cid, row_number() OVER (PARTITION BY vec_id ORDER BY $cosCE DESC, cid) AS rn " +
        "FROM embeddings, c WHERE vec_id >= 8) WHERE rn = 1), " +
        "pairs AS (SELECT a.vec_id AS ida, b.vec_id AS idb FROM assigned a JOIN assigned b " +
        s"ON a.cid = b.cid AND a.vec_id < b.vec_id WHERE $cosAB > 0.35), " +
        "e(na, nb) AS (SELECT ida, idb FROM pairs UNION SELECT idb, ida FROM pairs), " +
        "reach(na, nb) AS (SELECT na, nb FROM e " +
        "UNION SELECT r.na, e2.nb FROM reach r JOIN e e2 ON r.nb = e2.na), " +
        "reps AS (SELECT a.vec_id, least(a.vec_id, coalesce(min(r.nb), a.vec_id)) AS rep " +
        "FROM assigned a LEFT JOIN reach r ON r.na = a.vec_id GROUP BY a.vec_id) " +
        "SELECT vec_id, label FROM (SELECT m.vec_id, m.label, " +
        s"row_number() OVER (PARTITION BY reps.rep ORDER BY ${normSql("m.embedding")} DESC, m.vec_id) AS rnk " +
        "FROM embeddings m JOIN reps ON m.vec_id = reps.vec_id) WHERE rnk = 1"
    }) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val cents = graft.operators.Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    graft.operators.Similarity
      .semDedupBy(emb.filter(col("vec_id") >= 8)
          .select("vec_id", "embedding", "label"),
        "vec_id", "embedding", cents, tau = 0.35,
        keepBy = normCol(col("embedding")))
      .select("vec_id", "label")
  }

  /** INCREMENTAL semantic dedup against a persisted IVF index
    * ([[graft.operators.Similarity.writeSemIndex]] /
    * [[graft.operators.Similarity.semDedupAgainstIndex]]): the corpus
    * (vec_id ≥ 8, vec_id % 7 ≠ 0) is indexed once — cell-partitioned, its
    * centroids inside the artifact; the ingest batch (vec_id % 7 = 0)
    * probes it with a scan pruned to the batch's cells, corpus never
    * shuffled. The Spark leg includes the index WRITE (honest end-to-end
    * cost); the oracle recomputes both sides' cell assignments and joins
    * them directly.
    */
  val qSemDedupIncremental = q(
    "q_semdedup_incremental", {
      val cosCE = s"${dotSql("embedding", "ce")} / (${normSql("embedding")} * ${normSql("ce")})"
      val cosNB = s"${dotSql("n.embedding", "b.embedding")} / (${normSql("n.embedding")} * ${normSql("b.embedding")})"
      "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8), " +
        "assigned AS (SELECT vec_id, embedding, cid FROM (" +
        s"SELECT vec_id, embedding, cid, row_number() OVER (PARTITION BY vec_id ORDER BY $cosCE DESC, cid) AS rn " +
        "FROM embeddings, c WHERE vec_id >= 8) WHERE rn = 1) " +
        s"SELECT n.vec_id, b.vec_id AS corpus_id, ${Exact.quantSql(cosNB, 10000)} AS cos_e4 " +
        "FROM assigned n JOIN assigned b ON n.cid = b.cid " +
        "AND n.vec_id % 7 = 0 AND b.vec_id % 7 <> 0 " +
        s"WHERE $cosNB > 0.35"
    }) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val cents = graft.operators.Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") >= 8 && col("vec_id") % 7 =!= 0)
      .select("vec_id", "embedding")
    val batch = emb.filter(col("vec_id") >= 8 && col("vec_id") % 7 === 0)
      .select("vec_id", "embedding")
    val idx = TextQueries.scratchDir("graft_semidx", d)
    graft.operators.Similarity.writeSemIndex(corpus, "vec_id", "embedding",
      cents, idx)
    graft.operators.Similarity
      .semDedupAgainstIndex(batch, "vec_id", "embedding", idx, tau = 0.35)
      .select(col("vec_id"), col("corpus_id"),
        Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** Johnson–Lindenstrauss projection to 8 dims
    * ([[graft.operators.Similarity.projectJL]], Achlioptas ±1 sign matrix
    * over the deterministic hyperplanes): flat (vec_id, dim_j, value)
    * output so the oracle value-checks every projected coordinate against
    * the identical double fold over the same ±1 literals.
    */
  val qEmbedProject = q(
    "q_embed_project", {
      (0 until 8).map { j =>
        val lits = Vectors.hyperplane(j, Vectors.Dim)
          .map(x => if (x > 0) "1.0" else "-1.0").mkString(", ")
        val d = s"list_sum(list_transform(range(1, ${Vectors.Dim + 1}), " +
          s"i -> embedding[i]::DOUBLE * ([$lits])[i]))"
        s"SELECT vec_id, $j AS dim_j, ${Exact.quantSql(s"($d) / sqrt(8.0)", 10000)} AS v_e4 FROM embeddings"
      }.mkString(" UNION ALL ")
    }) { (s, d) =>
    Tables.embeddingsBalanced(s, d)
      .select(col("vec_id"),
        posexplode(graft.operators.Similarity.projectJL(col("embedding"), 8)))
      .select(col("vec_id"), col("pos").as("dim_j"),
        Exact.quant(col("col"), 10000).as("v_e4"))
  }

  /** JL-prefiltered brute-force top-10
    * ([[graft.operators.Similarity.bruteForceTopKProjected]]): rank by
    * 16-dim projected cosine, keep 160 candidates, re-rank exactly. (The
    * synthetic embeddings are near-random — the JL worst case, neighbors
    * separated by razor-thin margins — so the params here overfetch more
    * than a clustered real corpus would need; recall measured 10/10 at
    * sf0.001 with these settings vs 2/10 at 8-dim/4x.) The
    * oracle mirrors both stages bit-for-bit: the projected coordinates are
    * the same ±1-literal double folds (division by √16 included), the
    * projected cosine the same left-associated 8-term sum, candidate and
    * final ties broken by vec_id.
    */
  val qAnnProjected = q(
    "q_ann_projected", {
      val dim = Vectors.Dim
      def dj(v: String, j: Int): String = {
        val lits = Vectors.hyperplane(j, dim)
          .map(x => if (x > 0) "1.0" else "-1.0").mkString(", ")
        s"(list_sum(list_transform(range(1, ${dim + 1}), " +
          s"i -> ($v)[i]::DOUBLE * ([$lits])[i])) / sqrt(16.0))"
      }
      val pcols = (0 until 16).map(j => s"${dj("embedding", j)} AS d$j").mkString(", ")
      val qcols = (0 until 16).map(j => s"${dj("q", j)} AS e$j").mkString(", ")
      val dotPE = (0 until 16).map(j => s"d$j * e$j").mkString(" + ")
      val nP = (0 until 16).map(j => s"d$j * d$j").mkString(" + ")
      val nQ = (0 until 16).map(j => s"e$j * e$j").mkString(" + ")
      val cosFull = s"${dotSql("embedding", "q")} / (${normSql("embedding")} * ${normSql("q")})"
      "WITH qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0), " +
        s"pq AS (SELECT $qcols FROM qv), " +
        s"pc AS (SELECT vec_id, embedding, $pcols FROM embeddings WHERE vec_id <> 0), " +
        s"cand AS (SELECT vec_id, embedding FROM pc, pq " +
        s"ORDER BY ($dotPE) / (sqrt($nP) * sqrt($nQ)) DESC, vec_id LIMIT 160) " +
        s"SELECT vec_id, ${Exact.quantSql(cosFull, 10000)} AS cos_e4 FROM cand, qv " +
        s"ORDER BY $cosFull DESC, vec_id LIMIT 10"
    }) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val queryVec = Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select("embedding").collect().head.getAs[Seq[Float]](0).toArray
    graft.operators.Similarity
      .bruteForceTopKProjected(emb.filter(col("vec_id") =!= 0), "vec_id",
        "embedding", queryVec, k = 10, outDim = 16, overfetch = 16)
      .select(col("vec_id"), Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** TWO-BATCH sequential semantic ingest
    * ([[graft.operators.Similarity.appendToSemIndex]]): the corpus
    * (vec_id % 7 ≥ 2) is indexed; batch 1 (vec_id % 7 = 1) is cleaned
    * against it and its CLEAN vectors APPENDED; batch 2 (vec_id % 7 = 0)
    * then probes the grown index — a batch-2 vector whose only near-dup
    * arrived in batch 1 is caught without any corpus rewrite. The oracle
    * recomputes both probe legs: batch-1 flags, the surviving index
    * membership, then batch 2's matches against it.
    */
  val qSemDedupIncremental2 = q(
    "q_semdedup_incremental2", {
      val cosCE = s"${dotSql("embedding", "ce")} / (${normSql("embedding")} * ${normSql("ce")})"
      val cosNB = s"${dotSql("n.embedding", "b.embedding")} / (${normSql("n.embedding")} * ${normSql("b.embedding")})"
      "WITH c AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < 8), " +
        "assigned AS (SELECT vec_id, embedding, cid FROM (" +
        s"SELECT vec_id, embedding, cid, row_number() OVER (PARTITION BY vec_id ORDER BY $cosCE DESC, cid) AS rn " +
        "FROM embeddings, c WHERE vec_id >= 8) WHERE rn = 1), " +
        "flag1 AS (SELECT DISTINCT n.vec_id FROM assigned n JOIN assigned b " +
        "ON n.cid = b.cid AND n.vec_id % 7 = 1 AND b.vec_id % 7 NOT IN (0, 1) " +
        s"WHERE $cosNB > 0.35), " +
        "idx AS (SELECT vec_id FROM assigned WHERE vec_id % 7 NOT IN (0, 1) " +
        "UNION ALL SELECT vec_id FROM assigned WHERE vec_id % 7 = 1 " +
        "AND vec_id NOT IN (SELECT vec_id FROM flag1)) " +
        s"SELECT n.vec_id, b.vec_id AS corpus_id, ${Exact.quantSql(cosNB, 10000)} AS cos_e4 " +
        "FROM assigned n JOIN assigned b ON n.cid = b.cid " +
        "JOIN idx ON idx.vec_id = b.vec_id " +
        s"WHERE n.vec_id % 7 = 0 AND $cosNB > 0.35"
    }) { (s, d) =>
    val emb = Tables.embeddingsBalanced(s, d)
    val cents = graft.operators.Similarity.collectCentroids(
      Tables.embeddings(s, d).filter(col("vec_id") < 8), "vec_id", "embedding")
    val corpus = emb.filter(col("vec_id") >= 8 && col("vec_id") % 7 >= 2)
      .select("vec_id", "embedding")
    val batch1 = emb.filter(col("vec_id") >= 8 && col("vec_id") % 7 === 1)
      .select("vec_id", "embedding")
    val batch2 = emb.filter(col("vec_id") >= 8 && col("vec_id") % 7 === 0)
      .select("vec_id", "embedding")
    val idx = TextQueries.scratchDir("graft_semidx2", d)
    graft.operators.Similarity.writeSemIndex(corpus, "vec_id", "embedding",
      cents, idx)
    val clean1 = graft.operators.Similarity.cleanSemAgainstIndex(
      batch1, "vec_id", "embedding", idx, tau = 0.35)
    graft.operators.Similarity.appendToSemIndex(clean1, "vec_id", "embedding", idx)
    graft.operators.Similarity
      .semDedupAgainstIndex(batch2, "vec_id", "embedding", idx, tau = 0.35)
      .select(col("vec_id"), col("corpus_id"),
        Exact.quant(col("cosine"), 10000).as("cos_e4"))
  }

  /** HYBRID retrieval: Reciprocal Rank Fusion
    * ([[graft.operators.Retrieval.rrfFuse]], Cormack SIGIR'09) of the
    * BM25 lexical top-50 over `documents` and the cosine ANN top-50 over
    * `embeddings` for the vec_id-0 query vector (documents and embeddings
    * share the 0..N id space). Each list contributes the exact integer
    * `10⁹ div (60 + rank)`, so the fused scores and ranks hash-match the
    * DuckDB recompute of BOTH legs end-to-end.
    */
  val qRrfHybrid = q(
    "q_rrf_hybrid", {
      val cosQ = s"${dotSql("embedding", "q")} / (${normSql("embedding")} * ${normSql("q")})"
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
        "FROM sc GROUP BY 1), " +
        "lex AS (SELECT doc_id, row_number() OVER " +
        "(ORDER BY bm25_q DESC, doc_id) AS rank FROM tot QUALIFY rank <= 50), " +
        "qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0), " +
        s"anns AS (SELECT vec_id AS doc_id, $cosQ AS cs " +
        "FROM embeddings, qv WHERE vec_id <> 0), " +
        "ann AS (SELECT doc_id, row_number() OVER " +
        "(ORDER BY cs DESC, doc_id) AS rank FROM anns QUALIFY rank <= 50), " +
        "u AS (SELECT doc_id, 1000000000 // (60 + rank) AS c FROM lex " +
        "UNION ALL SELECT doc_id, 1000000000 // (60 + rank) FROM ann), " +
        "f AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS rrf_q FROM u GROUP BY 1) " +
        "SELECT doc_id, rrf_q, CAST(row_number() OVER " +
        "(ORDER BY rrf_q DESC, doc_id) AS INT) AS rank FROM f " +
        "QUALIFY rank <= 20"
    }) { (s, d) =>
    import graft.operators.Retrieval
    val lex = Retrieval.bm25Rank(Tables.documentsBalanced(s, d), "doc_id",
        "text", Seq("hash", "join", "spark", "window"), 50)
      .select("doc_id", "rank")
    val qv = Tables.embeddings(s, d).filter(col("vec_id") === 0)
      .select("embedding").collect().head.getSeq[Float](0).toIndexedSeq
    val qlit = array(qv.map(lit(_)): _*)
    val scored = Tables.embeddingsBalanced(s, d).filter(col("vec_id") =!= 0)
      .select(col("vec_id").as("doc_id"),
        (dotCol(col("embedding"), qlit) /
          (normCol(col("embedding")) * normCol(qlit))).as("cs"))
    val ann = scored.orderBy(col("cs").desc, col("doc_id").asc).limit(50)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("cs").desc, col("doc_id").asc)))
      .select("doc_id", "rank")
    Retrieval.rrfFuse(Seq(lex, ann), n = 20)
  }

  /** Batched hybrid retrieval ([[graft.operators.Retrieval.rrfFuseBatch]]):
    * TWO queries served in one plan end-to-end — lexical top-50s from the
    * persisted inverted index's batch probe (`bm25BatchAgainstIndex`, one
    * bucket-pruned scan for the whole batch), ANN cosine top-50s for both
    * query embeddings in one corpus pass (literal query array, per-query
    * rank window), fused per (query_id, doc_id) with the exact integer
    * RRF contribution and (rrf_q desc, doc_id) ties. Query 1 = lexical
    * {hash, join} + embedding 0; query 2 = {spark, window, scan} +
    * embedding 1; ids share the doc_id space as in `q_rrf_hybrid`.
    */
  val qRrfHybridBatch = q(
    "q_rrf_hybrid_batch", {
      val cosQ = s"${dotSql("embedding", "q")} / (${normSql("embedding")} * ${normSql("q")})"
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
        "FROM sc GROUP BY 1, 2), " +
        "lex AS (SELECT query_id, doc_id, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY bm25_q DESC, doc_id) AS rank " +
        "FROM tot QUALIFY rank <= 50), " +
        "qv AS (SELECT vec_id + 1 AS query_id, embedding AS q " +
        "FROM embeddings WHERE vec_id < 2), " +
        s"anns AS (SELECT query_id, vec_id AS doc_id, $cosQ AS cs " +
        "FROM embeddings, qv WHERE vec_id >= 2), " +
        "ann AS (SELECT query_id, doc_id, row_number() OVER " +
        "(PARTITION BY query_id ORDER BY cs DESC, doc_id) AS rank " +
        "FROM anns QUALIFY rank <= 50), " +
        "u AS (SELECT query_id, doc_id, 1000000000 // (60 + rank) AS c FROM lex " +
        "UNION ALL SELECT query_id, doc_id, 1000000000 // (60 + rank) FROM ann), " +
        "f AS (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_q " +
        "FROM u GROUP BY 1, 2) " +
        "SELECT query_id, doc_id, rrf_q, CAST(row_number() OVER " +
        "(PARTITION BY query_id ORDER BY rrf_q DESC, doc_id) AS INT) AS rank " +
        "FROM f QUALIFY rank <= 20"
    }) { (s, d) =>
    import graft.operators.Retrieval
    import s.implicits._
    val idx = TextQueries.scratchDir("graft_textidx_rrfb", d)
    Retrieval.writeTextIndex(Tables.documentsBalanced(s, d), "doc_id", "text",
      idx, nBuckets = 16)
    val batch = Seq((1L, "hash"), (1L, "join"), (2L, "spark"),
      (2L, "window"), (2L, "scan")).toDF("query_id", "term")
    val lex = Retrieval.bm25BatchAgainstIndex(s, idx, batch,
        "query_id", "term", 50)
      .select("query_id", "doc_id", "rank")
    val queries = Tables.embeddings(s, d).filter(col("vec_id") < 2)
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0) + 1L, r.getSeq[Float](1).toIndexedSeq))
    val qlits = array(queries.map { case (qi, qv) =>
      struct(lit(qi).as("qid"), array(qv.map(lit(_)): _*).as("qvec"))
    }.toIndexedSeq: _*)
    val ann = Tables.embeddingsBalanced(s, d).filter(col("vec_id") >= 2)
      .withColumn("__q", explode(qlits))
      .select(col("__q.qid").as("query_id"), col("vec_id").as("doc_id"),
        (dotCol(col("embedding"), col("__q.qvec")) /
          (normCol(col("embedding")) * normCol(col("__q.qvec")))).as("cs"))
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
          .orderBy(col("cs").desc, col("doc_id").asc)))
      .where(col("rank") <= 50)
      .select("query_id", "doc_id", "rank")
    Retrieval.rrfFuseBatch(Seq(lex, ann), n = 20)
  }

  val all: Seq[GraftQuery] = Seq(
    qRrfHybrid, qRrfHybridBatch,
    qEmbedNorm, qEmbedTopK, qAnnIvf, qAnnIvfSearch, qAnnIvfPq, qAnnIvfPqResidual, qAnnMultiProbe,
    qEmbedNearDup, qAnnLsh, qAnnMulti, qEmbedQuant, qKmeansStep, qKmeansSeed,
    qAnnTopkBatch, qAnnMultiProbeBatch, qAnnMultiProbeDeep, qAnnIvfSearchBatch,
    qAnnIvfPqBatch, qAnnIvfPqIncremental,
    qSemDedup, qSemDedupBest, qSemDedupIncremental, qSemDedupIncremental2,
    qEmbedProject, qAnnProjected, qClusterBalanced, qClusterDiverse)
}

/** Shared vector helpers (also used by operators.Similarity). */
object Vectors {
  val Dim = 64

  /** Deterministic ±1 hyperplane components (xorshift-mixed), generated
    * driver-side once — they become literal arrays in the plan, so no per-row
    * hashing and the whole bucket computation stays inside codegen.
    */
  def hyperplane(j: Int, dim: Int = Dim): Array[Double] =
    Array.tabulate(dim) { i =>
      var x = (j.toLong * 2654435761L + i.toLong * 40503L + 987654321L) & 0xffffffffL
      x ^= x >> 13; x ^= (x << 17) & 0xffffffffL; x ^= x >> 5
      if ((x & 1L) == 1L) 1.0 else -1.0
    }

  /** Random-hyperplane LSH bucket id: bit j = [dot(v, r_j) > 0]. */
  def lshBucket(v: Column, nBits: Int, dim: Int = Dim): Column =
    lshBandBucket(v, 0, nBits, dim)

  /** Bucket id for band `band` of a banded sketch: `bitsPerBand` sign bits
    * from the hyperplane block starting at `band * bitsPerBand`. Bands use
    * disjoint hyperplanes, so a pair's band buckets are independent trials —
    * the OR across bands is what buys near-dup recall back from bucketing.
    * `lshBucket(v, n)` ≡ band 0 of width n.
    */
  def lshBandBucket(v: Column, band: Int, bitsPerBand: Int, dim: Int = Dim): Column = {
    val bits = (0 until bitsPerBand).map { j =>
      val r = hyperplane(band * bitsPerBand + j, dim)
      val rCol = array(r.toIndexedSeq.map(lit): _*)
      // native fold (same doubles as the zip_with formulation — hyperplane
      // components are ±1.0 literals, so float×double stays exact)
      val d = VectorQueries.dotCol(v, rCol)
      when(d > 0, 1 << j).otherwise(0)
    }
    bits.reduce(_ + _)
  }

  /** DuckDB equivalent of [[lshBucket]]: the hyperplanes are ±1 literals, so
    * the same index-ordered double fold (list_sum over range) reproduces the
    * sign bits bit-exactly.
    */
  def lshBucketSql(v: String, nBits: Int, dim: Int = Dim): String =
    lshBandBucketSql(v, 0, nBits, dim)

  /** DuckDB equivalent of [[lshBandBucket]]. */
  def lshBandBucketSql(v: String, band: Int, bitsPerBand: Int, dim: Int = Dim): String =
    (0 until bitsPerBand).map { j =>
      val lits = hyperplane(band * bitsPerBand + j, dim)
        .map(x => if (x > 0) "1.0" else "-1.0").mkString(", ")
      s"(CASE WHEN list_sum(list_transform(range(1, ${dim + 1}), " +
        s"i -> ($v)[i]::DOUBLE * ([$lits])[i])) > 0 THEN ${1 << j} ELSE 0 END)"
    }.mkString("(", " + ", ")")
}

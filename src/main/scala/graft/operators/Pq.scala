package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Product quantization for the ANN index (Jégou, Douze, Schmid, "Product
  * Quantization for Nearest Neighbor Search", TPAMI 2011 — the FAISS IVF-PQ
  * lineage, re-expressed as DataFrame passes).
  *
  * Why: the IVF index ([[Similarity.ivfWrite]]) stores FULL float vectors —
  * 4·dim bytes per row. At the 100 TB / 10¹⁰-vector regime the index itself
  * becomes the storage and scan problem. PQ splits each vector into `m`
  * subspaces, k-means-quantizes each subspace to one of `codes` codewords,
  * and stores only the `m` small code ids per vector (m bytes at codes ≤
  * 256 vs 4·dim — 32× smaller at dim 64, m 8). Queries scan CODES with
  * asymmetric distance (ADC): per subspace, the query's dot product against
  * every codeword is precomputed into a tiny table, so scoring a row is `m`
  * table lookups — no float vector is read in the scan. A top-`rerankK`
  * shortlist is then re-scored EXACTLY against full vectors fetched by id
  * (the rerank contract: with adequate `rerankK`, output is exactly the
  * probed-cell exact top-k, which is what the oracle checks).
  *
  * Everything that must agree across runs/engines is INTEGER arithmetic:
  * vectors are L2-normalized then quantized to a `scale` grid (long), the
  * codebooks live on the same grid, code assignment is integer-L2 argmin
  * (tie → lowest code id), and ADC scores are exact BIGINT sums of integer
  * products — no float accumulates anywhere in the index or the scan.
  *
  * Scale shape: training runs on a deterministic hash-sample (`trainN`, the
  * FAISS practice — codebook quality saturates long before corpus size),
  * one distributed pass per Lloyd iteration covering ALL subspaces at once
  * (posexplode of subspaces → integer stats; only m·codes·subDim longs
  * return to the driver). Encoding is pure map-side. The serving layout is
  * the [[Similarity.ivfWrite]] cell-partitioned parquet with the codebooks
  * persisted inside the index (`_pq_codebooks`) — a serving process needs
  * nothing but the path.
  */
object Pq {

  /** Codebook encoding tags, persisted in `_pq_codebooks` so appends and
    * probes can never drift from what the index was built with (the
    * tokenizer-tag pattern): [[EncRaw]] quantizes the normalized vector
    * itself; [[EncResidual]] quantizes `x − centroid(cell)` (the FAISS
    * IVFADC recipe, Jégou TPAMI'11 §IV), spending the codebook's bits on
    * within-cell variance.
    *
    * MEASURED (SCALE.md "IVFADC residual recall", r15 grids over
    * (config × nprobe × rerankK) at sf0.1): the choice is CORPUS
    * GEOMETRY. On the near-random synthetic corpus residual does NOT
    * beat raw (indistinguishable at 16×256, consistently worse at 8×16 —
    * no cell structure, and the residual grid's doubled dynamic range
    * halves per-subspace resolution); on a clustered derivation of the
    * same data (‖x − c‖ ≪ ‖x‖, the TPAMI'11 regime) residual wins EVERY
    * grid point — up to 1.8× recall@10 at small rerankK (0.575 vs 0.313
    * at 16×256, rerankK 16). [[EncRaw]] stays the default; pick
    * [[EncResidual]] when vectors cluster around the coarse cells (most
    * real embedding corpora — sweep with [[ivfPqRecallAtBatch]] to
    * check). Output correctness is encoding-independent either way (the
    * exact-rerank contract).
    */
  val EncRaw = "raw"
  val EncResidual = "residual"

  /** Trained codebooks: `books(m)(code)` is the quantized codeword for
    * subspace `m` — `subDim` longs on the `scale` grid (value ≈
    * unitVec · scale for [[EncRaw]]; residual-grid for [[EncResidual]]).
    * `m · codes · subDim` longs total — driver-tiny.
    */
  final case class Codebooks(
      subspaces: Int, subDim: Int, scale: Long,
      books: IndexedSeq[IndexedSeq[Array[Long]]],
      encoding: String = EncRaw) {
    require(books.length == subspaces, s"expected $subspaces books, got ${books.length}")
    require(encoding == EncRaw || encoding == EncResidual,
      s"unknown PQ encoding '$encoding' (this build knows raw/residual)")
    def codes: Int = books.head.length
    def dim: Int = subspaces * subDim
  }

  /** Overflow guard shared by train/encode/ADC: normalized elements are in
    * [−1, 1] so a grid value is ≤ scale; the largest intermediate is a
    * squared diff sum ≤ dim·(2·scale)² (encode) or a dot ≤ dim·scale²
    * (ADC) — both must fit a signed 64-bit long with headroom.
    */
  private def requireScaleFits(scale: Long, dim: Int): Unit =
    require(scale >= 1 && 4.0 * scale * scale * dim < Long.MaxValue / 4.0,
      s"Pq: scale $scale overflows 64-bit intermediates at dim $dim " +
        "(need 4·scale²·dim ≪ 2⁶³); use scale ≤ ~3e8 at dim 64")

  /** L2-normalized, `scale`-grid quantized copy of a float-vector column:
    * `xq_i = floor(x_i / ‖x‖ · scale + 0.5)` (round-half-up, matching the
    * house [[graft.queries.Exact.quant]] rule); an all-zero vector
    * quantizes to zeros. Pure map-side.
    */
  def quantizedUnit(vecCol: Column, scale: Long): Column = {
    val nrm = Similarity.norm(vecCol)
    transform(vecCol, x =>
      when(nrm === 0.0, lit(0L))
        .otherwise(floor(x.cast("double") / nrm * scale + 0.5).cast("long")))
  }

  // ---------------------------------------------------------------------
  // Training
  // ---------------------------------------------------------------------

  /** Train PQ codebooks: per subspace, integer-L2 Lloyd k-means over the
    * (normalized, quantized) subvectors of a deterministic hash-sample.
    *
    * - `trainN = 0` trains on the full corpus; otherwise on the `trainN`
    *   rows with the smallest `xxhash64(id, seed)` — reproducible, unbiased,
    *   and the reason training cost is INDEPENDENT of corpus size (FAISS
    *   trains IVF-PQ codebooks on ~10⁵–10⁶ samples however big the index).
    * - Seeds: the `codes` distinct subvectors with the smallest hash per
    *   subspace (one pass, all subspaces at once).
    * - Each Lloyd iteration is ONE distributed job for ALL subspaces:
    *   posexplode to (subspace, subvector) rows, literal-codebook integer
    *   argmin (the [[Similarity.ivfAssign]] shape — no join, no window),
    *   then per-(subspace, code, position) integer sums; m·codes·subDim
    *   longs return to the driver, which rounds the new codeword grid
    *   values. Clusters that lose all members keep their codeword.
    */
  def train(corpus: DataFrame, idCol: String, vecCol: String,
      subspaces: Int, codes: Int, iters: Int = 8,
      scale: Long = 1000000L, trainN: Int = 0, seed: Long = 42L): Codebooks = {
    val subDim = trainChecks(corpus, vecCol, subspaces, codes, iters, scale,
      "Pq.train")
    val dim = subDim * subspaces
    val sampled = sampleRows(corpus, idCol, vecCol, trainN, seed)
    val xq = checkedXq(col(vecCol), dim, scale, "Pq.train")
    // anchor xq behind its OWN aliased column before the 16-way slice
    // fan-out: inlined, each slice lambda re-evaluates the whole
    // quantizedUnit (norm aggregate + per-element scale) — no CSE under
    // HOF lambdas/CaseWhen (the SCALE.md r18 NLL-fusion lesson). The
    // alias is non-cheap and multiply-referenced, so CollapseProject
    // keeps the projections split and xq computes once per row.
    // Measured: train seeds leg 3.3 s → the anchored form re-timed in
    // OPTIMIZATION_r18.md.
    val subs = sampled
      .select(col(idCol), xq.as("__xq"))
      .select(posexplode(transform(sequence(lit(0), lit(subspaces - 1)),
        s => slice(col("__xq"), s * subDim + 1, lit(subDim)))).as(Seq("sub", "sv")),
        xxhash64(col(idCol), lit(seed + 1)).as("__h"), col(idCol).as("__id"))
    Codebooks(subspaces, subDim, scale,
      lloydTrain(subs, subspaces, subDim, codes, iters, "Pq.train"), EncRaw)
  }

  /** [[train]] on RESIDUALS `xq − quantizedCentroid(cell)` (IVFADC, Jégou
    * TPAMI'11 §IV): each sampled row is coarse-assigned with the SAME rule
    * every encode uses ([[Similarity.ivfAssign]] over `centroids`), its
    * quantized-unit vector has its cell's quantized centroid subtracted,
    * and the Lloyd loop runs over the residual subvectors. Same sampling,
    * seeding, iteration, and integer-exactness contracts as [[train]];
    * the returned codebooks carry the [[EncResidual]] tag so every
    * downstream path (encode, ADC, append) self-selects the residual
    * arithmetic — a caller cannot mix the encodings.
    *
    * Residual grid values live in [−2·scale, 2·scale] (difference of two
    * unit-grid vectors), which the shared [[requireScaleFits]] headroom
    * covers: encode distances peak at dim·(4·scale)² = 16·dim·scale², the
    * guard's exact bound.
    */
  def trainResidual(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])],
      subspaces: Int, codes: Int, iters: Int = 8,
      scale: Long = 1000000L, trainN: Int = 0, seed: Long = 42L): Codebooks = {
    require(centroids.nonEmpty, "Pq.trainResidual needs centroids")
    val subDim = trainChecks(corpus, vecCol, subspaces, codes, iters, scale,
      "Pq.trainResidual")
    val dim = subDim * subspaces
    centroids.foreach { case (cid, c) =>
      require(c.length == dim,
        s"Pq.trainResidual: centroid $cid has dim ${c.length} != corpus dim $dim")
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    val cqDf = centroids
      .map { case (cid, c) => (cid, quantizeUnitDriver(c, scale).toSeq) }
      .toDF("__cid", "__cq")
    val sampled = sampleRows(corpus, idCol, vecCol, trainN, seed)
    val assigned = Similarity.ivfAssign(sampled, idCol, vecCol, centroids)
      .join(broadcast(cqDf), col("centroid_id") === col("__cid"))
    val xq = checkedXq(col(vecCol), dim, scale, "Pq.trainResidual")
    val rq = zip_with(xq, col("__cq"), (a, b) => a - b)
    // same anchored-alias shape as [[train]]: the residual vector computes
    // once per row instead of once per slice lambda
    val subs = assigned
      .select(col(idCol), rq.as("__rq"))
      .select(posexplode(transform(sequence(lit(0), lit(subspaces - 1)),
        s => slice(col("__rq"), s * subDim + 1, lit(subDim)))).as(Seq("sub", "sv")),
        xxhash64(col(idCol), lit(seed + 1)).as("__h"), col(idCol).as("__id"))
    Codebooks(subspaces, subDim, scale,
      lloydTrain(subs, subspaces, subDim, codes, iters, "Pq.trainResidual"),
      EncResidual)
  }

  private def trainChecks(corpus: DataFrame, vecCol: String, subspaces: Int,
      codes: Int, iters: Int, scale: Long, op: String): Int = {
    require(subspaces >= 1, s"$op: subspaces must be >= 1, got $subspaces")
    require(codes >= 1 && codes <= 65536,
      s"$op: codes must be in [1, 65536], got $codes")
    require(iters >= 0, s"$op: iters must be >= 0, got $iters")
    val dim = corpus.select(size(col(vecCol))).limit(1).collect() match {
      case Array(r) if !r.isNullAt(0) => r.getInt(0)
      case _ => throw new IllegalArgumentException(s"$op: corpus is empty")
    }
    require(dim % subspaces == 0,
      s"$op: dim $dim not divisible into $subspaces subspaces")
    requireScaleFits(scale, dim)
    dim / subspaces
  }

  /** `trainN = 0` trains on the full corpus; otherwise on the `trainN`
    * rows with the smallest `xxhash64(id, seed)` — reproducible, unbiased,
    * corpus-size-independent (the FAISS practice).
    */
  private def sampleRows(corpus: DataFrame, idCol: String, vecCol: String,
      trainN: Int, seed: Long): DataFrame =
    if (trainN <= 0) corpus.select(col(idCol), col(vecCol))
    else corpus.select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol)).limit(trainN)

  /** Quantized-unit vector with the malformed-row guard. A ragged or
    * null-element vector FAILS the job (the kmeansStep rule): a short
    * vector's truncated slices could otherwise be chosen as codebook
    * seeds, silently poisoning the whole index (every later encode would
    * null out or crash on the width mismatch); assert_true rides inside
    * the projected expression so Catalyst can't prune it.
    */
  private def checkedXq(vecCol: Column, dim: Int, scale: Long,
      op: String): Column = {
    val wellFormed = size(vecCol) === lit(dim) &&
      !exists(vecCol, x => x.isNull)
    when(assert_true(wellFormed,
        concat(lit(s"$op: vector size != dim $dim or null element in "),
          vecCol.cast("string"))).isNull,
      quantizedUnit(vecCol, scale))
  }

  /** Seed + Lloyd-iterate over prepared (sub, sv, __h, __id) subvector
    * rows — the shared core of [[train]] and [[trainResidual]] (one
    * distributed job per iteration covering ALL subspaces; only
    * m·codes·subDim longs ever return to the driver).
    */
  private def lloydTrain(subsIn: DataFrame, subspaces: Int, subDim: Int,
      codes: Int, iters: Int,
      op: String): IndexedSeq[IndexedSeq[Array[Long]]] = {
    val subs = subsIn
    // Seeds: per subspace, the `codes` hash-smallest DISTINCT subvectors.
    import org.apache.spark.sql.expressions.Window
    val sw = Window.partitionBy(col("sub")).orderBy(col("__h"), col("__id"))
    val seedRows = subs
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("sub"), col("sv")).orderBy(col("__h"), col("__id"))))
      .filter(col("__rn") === 1).drop("__rn") // distinct subvectors only
      .withColumn("__rn", row_number().over(sw))
      .filter(col("__rn") <= codes)
      .select(col("sub"), col("__rn") - 1, col("sv"))
      .collect()
    var books: IndexedSeq[IndexedSeq[Array[Long]]] =
      (0 until subspaces).map { s =>
        val mine = seedRows.filter(_.getInt(0) == s)
          .map(r => (r.getInt(1), r.getSeq[Long](2).toArray))
          .sortBy(_._1).map(_._2).toIndexedSeq
        require(mine.nonEmpty, s"$op: subspace $s has no training data")
        // fewer distinct subvectors than codes: pad by repeating (harmless —
        // duplicate codewords never win an argmin tie against a lower id)
        (0 until codes).map(c => mine(c % mine.length))
      }

    val subsForIters = if (iters > 0) subs.select("sub", "sv").localCheckpoint() else subs
    for (_ <- 0 until iters) {
      val assigned = subsForIters
        .withColumn("code", assignCode(col("sub"), col("sv"), books))
      val stats = assigned
        .select(col("sub"), col("code"), posexplode(col("sv")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("code"), col("pos"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
        .collect()
        .map(r => ((r.getInt(0), r.getInt(1), r.getInt(2)),
          (r.getLong(3), r.getLong(4)))).toMap
      books = (0 until subspaces).map { s =>
        (0 until codes).map { c =>
          val prev = books(s)(c)
          val fresh: Array[Long] = Array.tabulate(subDim) { p =>
            stats.get((s, c, p)) match {
              case Some((sm, n)) if n > 0 => Math.round(sm.toDouble / n)
              case _ => Long.MinValue // marker: no members at this (s, c)
            }
          }
          if (fresh.contains(Long.MinValue)) prev else fresh
        }
      }
    }
    books
  }

  /** Integer-L2 argmin over a codebook, per (subspace, subvector) row —
    * the native [[graft.functions.PqAssignSub]] kernel (tie → lowest code
    * id). The codebooks ride as a plan reference object; a
    * higher-order-function fold here rebuilt the m·codes·subDim literal
    * array PER ROW and was ~1000× slower.
    */
  private def assignCode(subCol: Column, svCol: Column,
      books: IndexedSeq[IndexedSeq[Array[Long]]]): Column =
    graft.functions.PqCodec.pqAssignSub(subCol, svCol,
      books.map(_.toArray).toArray)

  // ---------------------------------------------------------------------
  // Encoding
  // ---------------------------------------------------------------------

  /** Append `pq_code: array<int>` (length `subspaces`) to the input — each
    * element the integer-L2-nearest codeword of that subspace's normalized
    * quantized subvector (tie → lowest code id). Pure map-side projection
    * via the native [[graft.functions.PqEncode]] kernel (whole-stage
    * codegen, codebooks as one plan reference object): no join, no window,
    * no shuffle — a single scan stage at any corpus size. Ragged or
    * null-element vectors yield a NULL code (they cannot be searched).
    */
  def encode(df: DataFrame, vecCol: String, cb: Codebooks): DataFrame = {
    require(!df.columns.contains("pq_code"),
      "Pq.encode: input already has a pq_code column")
    require(cb.encoding == EncRaw,
      "Pq.encode: residual codebooks need the row's coarse cell - use " +
        "encodeResidual (the codebook's encoding tag self-selects the path)")
    df.withColumn("pq_code", graft.functions.PqCodec.pqEncode(
      col(vecCol), cb.books.map(_.toArray).toArray, cb.scale))
  }

  /** [[encode]] for [[EncResidual]] codebooks: the input must already
    * carry `centroid_id` (the [[Similarity.ivfAssign]] output - coarse
    * assignment happens BEFORE encoding in IVFADC), and each row's code
    * quantizes `xq - quantizedCentroid(cell)` via the native
    * [[graft.functions.PqEncodeRes]] kernel. Still pure map-side: the
    * per-cell quantized centroids ride as one plan reference object.
    * Rows whose centroid_id the codebook never saw yield NULL codes.
    */
  def encodeResidual(df: DataFrame, vecCol: String, cb: Codebooks,
      centroids: Seq[(Int, Array[Float])]): DataFrame = {
    require(!df.columns.contains("pq_code"),
      "Pq.encodeResidual: input already has a pq_code column")
    require(cb.encoding == EncResidual,
      "Pq.encodeResidual: codebooks are raw-encoded - use encode")
    require(df.columns.contains("centroid_id"),
      "Pq.encodeResidual: input needs a centroid_id column (run " +
        "Similarity.ivfAssign first - IVFADC encodes relative to the cell)")
    df.withColumn("pq_code", graft.functions.PqCodec.pqEncodeRes(
      col(vecCol), col("centroid_id").cast("int"),
      quantizedCentroids(centroids, cb.scale),
      cb.books.map(_.toArray).toArray, cb.scale))
  }

  /** Per-cell quantized-unit centroids as a dense id-indexed array (the
    * kernel reference-object shape); gaps in the id space are null slots
    * the kernel rejects loudly.
    */
  private def quantizedCentroids(centroids: Seq[(Int, Array[Float])],
      scale: Long): Array[Array[Long]] = {
    require(centroids.nonEmpty, "quantizedCentroids: no centroids")
    centroids.foreach { case (cid, _) =>
      require(cid >= 0 && cid < (1 << 22),
        s"quantizedCentroids: cell id $cid outside the dense-array range")
    }
    val out = new Array[Array[Long]](centroids.map(_._1).max + 1)
    centroids.foreach { case (cid, c) =>
      out(cid) = quantizeUnitDriver(c, scale)
    }
    out
  }

  /** The residual ADC's per-(query, cell) offset: `qq . cq(cell)` - the
    * coarse term of `q.x ~ q.c + q.r`. A per-cell CONSTANT, so it is
    * computed driver-side (nprobe integers) and added to each candidate's
    * table-lookup sum, making ADC scores comparable ACROSS probed cells.
    */
  def cellOffset(queryVec: Array[Float], cb: Codebooks,
      centroid: Array[Float]): Long =
    cellOffsetQ(quantizeUnitDriver(queryVec, cb.scale), cb, centroid)

  /** [[cellOffset]] with the query already quantized — both probe paths
    * quantize the query ONCE and reuse `qq` across their nprobe (or
    * nprobe × batch) cells instead of re-running the normalization per
    * (query, cell) pair.
    */
  private def cellOffsetQ(qq: Array[Long], cb: Codebooks,
      centroid: Array[Float]): Long = {
    val cq = quantizeUnitDriver(centroid, cb.scale)
    var d = 0L; var i = 0
    while (i < qq.length) { d += qq(i) * cq(i); i += 1 }
    d
  }

  // ---------------------------------------------------------------------
  // ADC scoring
  // ---------------------------------------------------------------------

  /** Per-query ADC lookup tables: `tables(s)(c)` = integer dot of the
    * (normalized, quantized) query subvector with codeword `c` of subspace
    * `s` — exact BIGINT, computed driver-side over m·codes·subDim longs.
    * Row score = Σ_s tables(s)(code_s) ≈ scale²·cos(query, row).
    */
  def adcTables(queryVec: Array[Float], cb: Codebooks): IndexedSeq[Array[Long]] = {
    require(queryVec.length == cb.dim,
      s"Pq.adcTables: query dim ${queryVec.length} != index dim ${cb.dim}")
    val qq = quantizeUnitDriver(queryVec, cb.scale)
    (0 until cb.subspaces).map { s =>
      cb.books(s).map { cw =>
        var d = 0L; var i = 0
        while (i < cb.subDim) { d += qq(s * cb.subDim + i) * cw(i); i += 1 }
        d
      }.toArray
    }
  }

  /** Driver twin of [[quantizedUnit]] — same IEEE double ops, same
    * round-half-up. (ADC is shortlist-only, so even a ULP divergence here
    * could not change final output — the rerank is exact — but keeping the
    * twins identical makes the encode/ADC specs exact.)
    */
  def quantizeUnitDriver(v: Array[Float], scale: Long): Array[Long] = {
    var ss = 0.0
    v.foreach(x => ss += x.toDouble * x.toDouble)
    val nrm = math.sqrt(ss)
    if (nrm == 0.0) Array.fill(v.length)(0L)
    else v.map(x => math.floor(x.toDouble / nrm * scale + 0.5).toLong)
  }

  /** ADC score column over a `pq_code` array: m table lookups summed —
    * integer-exact, map-side, and the ONLY thing the candidate scan reads
    * besides the id (the float vector column is never touched).
    */
  def adcScore(codeCol: Column, tables: IndexedSeq[Array[Long]]): Column =
    graft.functions.PqCodec.pqAdc(codeCol, tables.toArray)

  // ---------------------------------------------------------------------
  // Search
  // ---------------------------------------------------------------------

  /** IVF-PQ query: probe the `nprobe` cells nearest the query (same cell
    * choice and tie rules as [[Similarity.ivfSearchTopK]] — cos desc, cid
    * asc), ADC-score ONLY those cells' code rows, shortlist the top
    * `rerankK` by (adc desc, id asc), then re-score the shortlist EXACTLY
    * (full-precision cosine against `corpus`' float vectors, fetched by a
    * pushed-down id filter) and return the top `k` by (cosine desc, id).
    *
    * The rerank contract: whenever the true probed-cell top-k survives the
    * ADC shortlist (guaranteed at rerankK = probed size; overwhelmingly
    * likely far below it — measured in PqSpec/SCALE.md), the output is
    * EXACTLY the probed-cell exact top-k — same rows, same cosines, same
    * order. `rerankK` is the recall/cost knob: the candidate scan reads m
    * bytes per row, and full vectors are fetched for only rerankK ids.
    *
    * Two jobs by design (the FAISS serving shape): the shortlist job scans
    * codes (cell-partition-pruned when `encoded` is a persisted index) and
    * returns rerankK ids to the driver; the rerank job reads only
    * id+vector for rows passing the pushed `id IN (…)` filter.
    */
  def ivfPqSearchTopK(encoded: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])], cb: Codebooks,
      queryVec: Array[Float], k: Int, rerankK: Int,
      nprobe: Int = 2): DataFrame = {
    require(k >= 1, s"ivfPqSearchTopK: k must be >= 1, got $k")
    require(rerankK >= k, s"ivfPqSearchTopK: rerankK $rerankK < k $k")
    require(nprobe >= 1, s"ivfPqSearchTopK: nprobe must be >= 1, got $nprobe")
    require(centroids.nonEmpty, "ivfPqSearchTopK needs centroids")
    val cells = probeCells(centroids, queryVec, nprobe)
    val ids = adcShortlist(
      encoded.filter(col("centroid_id").isin(cells: _*)),
      idCol, shortlistScore(queryVec, cb, centroids, cells), rerankK)
    rerankExact(corpus, idCol, vecCol, ids, queryVec, k)
  }

  /** The ADC estimate each shortlist ranks by: the table-lookup sum, plus
    * - for residual codebooks - the probed cell's driver-computed coarse
    * offset `qq . cq(cell)` (a literal int->long map over the nprobe
    * probed cells), which makes estimates comparable across cells.
    */
  private def shortlistScore(queryVec: Array[Float], cb: Codebooks,
      centroids: Seq[(Int, Array[Float])], cells: Seq[Int]): Column = {
    val tableSum = adcScore(col("pq_code"), adcTables(queryVec, cb))
    if (cb.encoding != EncResidual) tableSum
    else {
      val cmap = centroids.toMap
      val qq = quantizeUnitDriver(queryVec, cb.scale)
      val entries = cells.flatMap { c =>
        Seq(lit(c), lit(cellOffsetQ(qq, cb, cmap(c))))
      }
      tableSum + element_at(map(entries: _*), col("centroid_id").cast("int"))
    }
  }

  /** Flat (whole-corpus) PQ search — no IVF stage: ADC over every code
    * row, then the exact rerank. The degenerate one-cell case of
    * [[ivfPqSearchTopK]]; useful when the corpus is already filtered.
    */
  def pqSearchTopK(encoded: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, cb: Codebooks,
      queryVec: Array[Float], k: Int, rerankK: Int): DataFrame = {
    require(k >= 1, s"pqSearchTopK: k must be >= 1, got $k")
    require(rerankK >= k, s"pqSearchTopK: rerankK $rerankK < k $k")
    require(cb.encoding == EncRaw,
      "pqSearchTopK: residual codes only rank within their coarse cells - " +
        "use ivfPqSearchTopK with the index's centroids")
    val ids = adcShortlist(encoded, idCol,
      adcScore(col("pq_code"), adcTables(queryVec, cb)), rerankK)
    rerankExact(corpus, idCol, vecCol, ids, queryVec, k)
  }

  /** The nprobe cells nearest the query — [[Similarity.probeCellsFor]],
    * the ONE probe-selection rule all IVF paths share.
    */
  def probeCells(centroids: Seq[(Int, Array[Float])],
      queryVec: Array[Float], nprobe: Int): Seq[Int] =
    Similarity.probeCellsFor(centroids, queryVec, nprobe)

  private def adcShortlist(candidates: DataFrame, idCol: String,
      scoreCol: Column, rerankK: Int): Seq[Long] =
    candidates
      .select(col(idCol).cast("long").as("__id"), scoreCol.as("__adc"))
      // dedupe BEFORE the limit: duplicate code rows from a replayed
      // append would otherwise consume rerankK slots, shrinking the
      // DISTINCT shortlist below rerankK and silently voiding the
      // "rerankK = probed size ⇒ exact probed-cell top-k" guarantee.
      // max(adc) is a no-op on true replays (same vector + same codebooks
      // ⇒ same code ⇒ same score); the aggregate just makes rerankK count
      // distinct documents.
      .groupBy(col("__id")).agg(max(col("__adc")).as("__adc"))
      .orderBy(col("__adc").desc, col("__id"))
      .limit(rerankK)
      .collect().map(_.getLong(0)).toSeq

  private def rerankExact(corpus: DataFrame, idCol: String, vecCol: String,
      ids: Seq[Long], queryVec: Array[Float], k: Int): DataFrame = {
    val qArr = array(queryVec.toIndexedSeq.map(lit): _*)
    corpus
      .filter(col(idCol).isin(ids: _*))
      .withColumn("cosine", Similarity.cosine(col(vecCol), qArr))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cosine"))
  }

  /** BATCH IVF-PQ serving: top-k for a whole query set in ONE plan (after
    * two driver-side preparations bounded by the batch, never the corpus).
    * Per query the cell choice, ADC ranking, shortlist size, and exact
    * rerank match [[ivfPqSearchTopK]] row for row.
    *
    * Shape: the query batch collects to the driver (`maxQueries` guard —
    * each query's ADC table is m·codes longs, so the reference object is
    * ~32 KB/query at 16×256), probe cells compute per query over the
    * centroids, and the union of probed cells prunes the code scan
    * statically (partition pruning on a persisted index). Candidates =
    * codes ⋈ broadcast (query, cell) pairs, scored by the native
    * [[graft.functions.PqAdcBatch]] kernel (the batch's tables ride as ONE
    * reference object); a per-query rank window keeps `rerankK`; the
    * shortlist — ≤ |batch|·rerankK rows — BROADCASTS into the corpus scan
    * for the exact-cosine rerank (the corpus never shuffles), and the
    * final per-query top-k window runs over ≤ rerankK rows per query.
    *
    * Output: (query_id, `idCol`, cosine) — `k` rows per query by
    * (cosine desc, id asc).
    */
  def ivfPqJoinTopK(encoded: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String,
      queries: DataFrame, qIdCol: String, qVecCol: String,
      centroids: Seq[(Int, Array[Float])], cb: Codebooks,
      k: Int, rerankK: Int, nprobe: Int = 2,
      maxQueries: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k >= 1, s"ivfPqJoinTopK: k must be >= 1, got $k")
    require(rerankK >= k, s"ivfPqJoinTopK: rerankK $rerankK < k $k")
    require(nprobe >= 1, s"ivfPqJoinTopK: nprobe must be >= 1, got $nprobe")
    require(centroids.nonEmpty, "ivfPqJoinTopK needs centroids")
    val spark = encoded.sparkSession
    val qRows = queries
      .select(col(qIdCol).cast("long"), col(qVecCol))
      .take(maxQueries + 1)
    require(qRows.length <= maxQueries,
      s"ivfPqJoinTopK holds one ADC table per query on the driver, and " +
        s"the batch exceeds maxQueries=$maxQueries — split the batch or " +
        "raise the cap explicitly (≈ m·codes·8 bytes per query)")
    require(qRows.nonEmpty, "ivfPqJoinTopK: empty query batch")
    val qs = qRows.map { r =>
      require(!r.isNullAt(0) && !r.isNullAt(1),
        "ivfPqJoinTopK: NULL query ids/vectors are not addressable")
      (r.getLong(0), r.getSeq[Float](1).toArray)
    }
    val tables3 = qs.map { case (_, v) => adcTables(v, cb).toArray }.toArray

    import spark.implicits._
    // per-(query, cell) rows; for residual codebooks each carries the
    // query's coarse offset qq . cq(cell) so batch ADC estimates compare
    // across cells exactly like the single-query path (0 for raw)
    val cmap = centroids.toMap
    val qCellsLocal = qs.zipWithIndex.flatMap { case ((qid, v), qi) =>
      // quantize each query ONCE, not once per probed cell
      val qq = if (cb.encoding == EncResidual) quantizeUnitDriver(v, cb.scale)
        else null
      probeCells(centroids, v, nprobe).map { c =>
        val off = if (qq != null) cellOffsetQ(qq, cb, cmap(c)) else 0L
        (qid, qi, c, off)
      }
    }.toSeq
    val qCells = qCellsLocal.toDF("query_id", "__qidx", "__cell", "__off")
    val allCells = qCellsLocal.map(_._3).distinct // driver data — no job

    val shortlist = encoded
      .filter(col("centroid_id").isin(allCells: _*))
      .join(broadcast(qCells), col("centroid_id") === col("__cell"))
      .withColumn("__adc", graft.functions.PqCodec.pqAdcBatch(
        col("pq_code"), col("__qidx"), tables3) + col("__off"))
      // dedupe BEFORE the rank window — a replayed append's duplicate
      // code rows would otherwise occupy rerankK slots (fewer DISTINCT
      // docs than rerankK per query, voiding the rerank guarantee) and
      // duplicate (query, doc) rows into the rerank join. max(adc) is a
      // no-op on true replays (same vector + codebooks ⇒ same score);
      // the aggregate makes rerankK count distinct documents, matching
      // the single-query path's groupBy(id)
      .groupBy(col("query_id"), col(idCol))
      .agg(max(col("__adc")).as("__adc"))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("__adc").desc, col(idCol).asc)))
      .filter(col("__rn") <= rerankK)
      .select(col("query_id"), col(idCol))

    val qVecs = qs.map { case (qid, v) => (qid, v.toSeq) }.toSeq
      .toDF("query_id", "__qvec")
    corpus
      .join(broadcast(shortlist), idCol)
      .join(broadcast(qVecs), "query_id")
      .withColumn("cosine", Similarity.cosine(col(vecCol),
        col("__qvec").cast("array<float>")))
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col(idCol).asc)))
      .filter(col("__rn") <= k)
      .select(col("query_id"), col(idCol), col("cosine"))
  }

  /** Mean recall@k of the IVF-PQ path against [[Similarity.bruteForceTopK]]
    * over a probe-query set — the knob-tuning tool for (subspaces, codes,
    * rerankK, nprobe), the PQ sibling of [[Similarity.annRecallAt]]. A
    * query with an empty exact top-k scores 1.0.
    */
  def ivfPqRecallAt(encoded: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])], cb: Codebooks,
      queries: Seq[Array[Float]], k: Int, rerankK: Int,
      nprobe: Int = 2): Double = {
    require(queries.nonEmpty, "ivfPqRecallAt: at least one probe query")
    val recalls = queries.map { qv =>
      val exact = Similarity.bruteForceTopK(corpus, idCol, vecCol, qv, k)
        .collect().map(_.getLong(0)).toSet
      if (exact.isEmpty) 1.0
      else {
        val got = ivfPqSearchTopK(encoded, corpus, idCol, vecCol, centroids,
            cb, qv, k, rerankK, nprobe)
          .collect().map(_.getLong(0)).toSet
        (got & exact).size.toDouble / exact.size
      }
    }
    recalls.sum / recalls.size
  }

  /** Batched [[ivfPqRecallAt]]: the whole probe-query set served by ONE
    * [[ivfPqJoinTopK]] plan and the exact side computed in one corpus
    * pass ([[Similarity.annRecallAtBatch]]'s TopKIdsAgg job) — a fixed
    * handful of jobs instead of 2·|queries|, which is what makes wide
    * (config × nprobe × rerankK) tuning sweeps affordable (the r15
    * recall grid ran 256 evaluations). Same recall definition and the
    * same per-query probe-cell/rank/tie rules (batch ≡ single is
    * PqSpec-locked), so the two evaluators agree exactly.
    */
  def ivfPqRecallAtBatch(encoded: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])], cb: Codebooks,
      queries: Seq[Array[Float]], k: Int, rerankK: Int,
      nprobe: Int = 2): Double = {
    require(queries.nonEmpty, "ivfPqRecallAtBatch: at least one probe query")
    val spark = encoded.sparkSession
    import spark.implicits._
    val qdf = queries.zipWithIndex
      .map { case (v, i) => (i.toLong, v.toSeq) }.toDF("__qid", "__qvec")
      .selectExpr("__qid", "cast(__qvec as array<float>) as __qvec")
    // maxQueries tracks |queries| rather than enforcing the serving cap:
    // that guard bounds DRIVER memory against an unbounded DataFrame
    // batch, but this evaluator's queries are ALREADY a driver-side Seq —
    // the caller has materialized them, so the ADC tables (~m·codes·8 B
    // each) are the same order of driver memory the input itself is
    val ann = ivfPqJoinTopK(encoded, corpus, idCol, vecCol, qdf, "__qid",
      "__qvec", centroids, cb, k, rerankK, nprobe,
      maxQueries = math.max(512, queries.size))
    Similarity.annRecallAtBatch(corpus, idCol, vecCol, queries, k,
      ann.select(col("query_id").as("qid"), col(idCol)))
  }

  // ---------------------------------------------------------------------
  // Persisted index
  // ---------------------------------------------------------------------

  /** One-call IVF-PQ build: IVF centroids + assignment
    * ([[Similarity.ivfBuild]]), PQ codebooks trained on a hash-sample, every
    * row encoded. Returns the encoded assignment (…, centroid_id, pq_code),
    * the centroids, and the codebooks. Persist with [[writeIndex]]; the
    * SERVING scan then reads (id, centroid_id, pq_code) only — the float
    * vectors stay in the base corpus for the rerank fetch.
    */
  def ivfPqBuild(corpus: DataFrame, idCol: String, vecCol: String,
      kCells: Int, subspaces: Int, codes: Int, iters: Int = 5,
      trainN: Int = 0, seed: Long = 42L, residual: Boolean = false)
      : (DataFrame, Seq[(Int, Array[Float])], Codebooks) = {
    val (assigned, cents) = Similarity.ivfBuild(corpus, idCol, vecCol,
      kCells, iters, seed)
    if (residual) {
      val cb = trainResidual(corpus, idCol, vecCol, cents, subspaces, codes,
        iters, trainN = trainN, seed = seed)
      (encodeResidual(assigned, vecCol, cb, cents), cents, cb)
    } else {
      val cb = train(corpus, idCol, vecCol, subspaces, codes, iters,
        trainN = trainN, seed = seed)
      (encode(assigned, vecCol, cb), cents, cb)
    }
  }

  /** Persist the SERVING layout: (id, centroid_id, pq_code) cell-partitioned
    * parquet (partition pruning answers the probe filter), centroids at
    * `_centroids` ([[Similarity.ivfWriteWithCentroids]] layout), codebooks
    * at `_pq_codebooks` — underscore-prefixed so partition discovery skips
    * both. The float vector column is deliberately NOT written: the codes
    * ARE the index (m·1 byte-ish ints vs 4·dim bytes — the whole point),
    * and the rerank reads vectors from the base corpus by id.
    */
  def writeIndex(encoded: DataFrame, idCol: String,
      centroids: Seq[(Int, Array[Float])], cb: Codebooks,
      path: String): Unit = {
    Similarity.ivfWriteWithCentroids(
      encoded.select(col(idCol), col("centroid_id"),
        checkedCode(idCol, "Pq.writeIndex")),
      centroids, path)
    writeCodebooks(encoded.sparkSession, cb, path)
  }

  /** The persist-path null-code guard: [[encode]]/[[encodeResidual]]
    * yield NULL codes for ragged/null-element vectors and (residual)
    * unknown coarse cells — correct for ad-hoc scoring, but a PERSISTED
    * null-code row would silently vanish from every future shortlist
    * (null ADC sorts last), degrading recall with no failure anywhere.
    * So every write path fails the job instead (the [[checkedXq]]
    * training rule applied at persist time); assert_true rides inside the
    * projected expression so Catalyst can't prune it.
    */
  private def checkedCode(idCol: String, op: String): Column =
    when(assert_true(col("pq_code").isNotNull,
        concat(lit(s"$op: NULL pq_code for id "), col(idCol).cast("string"),
          lit(" — ragged/null-element vector or a coarse cell the " +
            "codebooks never saw; a persisted null-code row would " +
            "silently vanish from every shortlist"))).isNull,
      col("pq_code")).as("pq_code")

  private def writeCodebooks(spark: SparkSession, cb: Codebooks,
      path: String): Unit = {
    import spark.implicits._
    cb.books.zipWithIndex.flatMap { case (b, s) =>
      b.zipWithIndex.map { case (cw, c) =>
        (s, c, cw.toSeq, cb.scale, cb.encoding)
      }
    }.toDF("sub", "code", "cw", "scale", "enc")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_pq_codebooks")
  }

  /** APPEND a batch to a [[writeIndex]] artifact — the ingest-loop second
    * half, self-configuring like the other index families: cells come
    * from the index's OWN `_centroids` and codes from its OWN
    * `_pq_codebooks` (a caller cannot drift the quantization), and the
    * codes-only rows partition-append without touching existing cells'
    * files. CONTRACT: each vector appends at most once across the
    * index's lifetime (the [[Retrieval.appendToTextIndex]] rule) —
    * duplicate code rows from a replayed append cannot corrupt results
    * (both search paths deduplicate their shortlists) but they inflate
    * every probe's candidate scan; [[compactIndex]] does not collapse
    * them (ids are opaque here).
    */
  def appendToIndex(df: DataFrame, idCol: String, vecCol: String,
      path: String): Unit =
    selfConfiguredCodes(df, idCol, vecCol, path, "Pq.appendToIndex")
      .write.mode("append").partitionBy("centroid_id").parquet(path)

  /** The self-configured codes projection every post-build write path
    * shares: cells from the index's OWN `_centroids`, codes (and the
    * raw/residual encoding tag) from its OWN `_pq_codebooks` — a caller
    * can never drift the quantization. Artifacts are resolved PER CALL
    * on purpose (two tiny driver reads): a replayed batch must encode
    * with whatever the index at `path` holds at replay time, even after
    * artifact surgery between runs.
    */
  private def selfConfiguredCodes(df: DataFrame, idCol: String,
      vecCol: String, path: String, op: String): DataFrame = {
    val spark = df.sparkSession
    val cents = Similarity.ivfReadCentroids(spark, path)
    val cb = readCodebooks(spark, path)
    val assigned = Similarity.ivfAssign(df.select(col(idCol), col(vecCol)),
      idCol, vecCol, cents)
    val enc = if (cb.encoding == EncResidual)
      encodeResidual(assigned, vecCol, cb, cents)
    else encode(assigned, vecCol, cb)
    enc.select(col(idCol), col("centroid_id"), checkedCode(idCol, op))
  }

  /** One streaming-ingest microbatch — exposed for direct replay
    * exercise (the oracle replays a batch id and the probe must not
    * move); [[streamingPqIngest]] wires it into `foreachBatch`. Unlike
    * [[appendToIndex]] (append-only, at-most-once per vector by caller
    * contract), the batch's rows land in the idempotent
    * `_ingest/<queryTag>/b_<batchId>` subtree ([[IndexLifecycle]] layout,
    * shared with the text/signature/semantic/line/image families): a
    * REPLAYED batch overwrites its own subtree instead of appending
    * duplicate code rows. Encoding is self-configuring — cells from the
    * index's own `_centroids`, codes (and the raw/residual tag) from its
    * own `_pq_codebooks` — so an ingest loop can never drift from the
    * base build. The write stages into a `.tmp` sibling and renames into
    * place, so probes never see a half-written subtree; the visibility
    * gap is one delete+rename of metadata, not the encode+write.
    */
  def ingestPqBatch(batch: DataFrame, idCol: String, vecCol: String,
      indexPath: String, queryTag: String, batchId: Long): Unit = {
    val enc = selfConfiguredCodes(batch, idCol, vecCol, indexPath,
      "Pq.ingestPqBatch")
    IndexLifecycle.requireBatchIdFresh(batch.sparkSession, indexPath,
      queryTag, batchId, "Pq.ingestPqBatch")
    val dir = IndexLifecycle.ingestBatchDir(indexPath, queryTag, batchId)
    IndexLifecycle.writeViaTmp(batch.sparkSession, dir) { tmp =>
      enc.write.mode("overwrite").partitionBy("centroid_id").parquet(tmp)
    }
  }

  /** Live-ingest loop for the PQ index — the PQ member of the streaming-
    * index family ([[Retrieval.streamingTextIngest]],
    * [[Dedup.streamingIngest]], [[Similarity.streamingSemIngest]],
    * [[Boilerplate.streamingLineIngest]],
    * [[ImageDedup.streamingImageIngest]]): each trigger's vectors land as
    * one idempotent subtree that [[readIndex]] unions into every later
    * probe. Build the base first with [[writeIndex]]; [[compactIndex]]
    * folds accumulated subtrees back into the base cell layout. The
    * query tag derives from the QUALIFIED checkpoint path so a restarted
    * query lands replayed batches on the same subtrees.
    */
  def streamingPqIngest(stream: DataFrame, idCol: String, vecCol: String,
      indexPath: String, checkpointDir: String,
      maxLiveSubtrees: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val queryTag = IndexLifecycle.queryTagOf(stream.sparkSession, checkpointDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        maybeCompactPqIngest(batch.sparkSession, indexPath, queryTag,
          batchId, maxLiveSubtrees)
        ingestPqBatch(batch.toDF(), idCol, vecCol, indexPath, queryTag,
          batchId)
      }
      .start()
  }

  /** The loop's `maxLiveSubtrees` trigger ([[IndexLifecycle
    * .compactOwnSubtrees]] mechanics): the query's accumulated code
    * subtrees fold into one under the base cell-partitioned layout
    * ([[readIndex]]'s schema rule: subtrees read under the base's own
    * schema). Row-identical union → every later probe is bit-identical;
    * only the file/subtree count collapses. 0 disables.
    */
  private[operators] def maybeCompactPqIngest(spark: SparkSession,
      indexPath: String, queryTag: String, batchId: Long,
      maxLiveSubtrees: Int): Boolean =
    maxLiveSubtrees > 0 &&
      IndexLifecycle.compactOwnSubtrees(spark, indexPath, queryTag, batchId,
          maxLiveSubtrees) { (sources, tmp) =>
        // schema inference on the (corpus-sized) base only when a fold
        // actually runs — per-batch inference was seconds of listing/footer
        // overhead on object stores for a hook that usually returns false
        val baseSchema = spark.read.parquet(indexPath).schema
        val all = sources.map(s => spark.read.schema(baseSchema).parquet(s))
          .reduce(_ unionByName _)
        IndexLifecycle.clusterForPartitionedWrite(all, "centroid_id")
          .write.mode("overwrite").partitionBy("centroid_id").parquet(tmp)
      }

  /** Codebooks persisted by [[writeIndex]], back in driver shape. */
  def readCodebooks(spark: SparkSession, path: String): Codebooks = {
    val raw = spark.read.parquet(s"$path/_pq_codebooks")
    // `enc` column absent on pre-residual indexes -> EncRaw (what they are)
    val withEnc = if (raw.columns.contains("enc")) raw
      else raw.withColumn("enc", lit(EncRaw))
    val rows = withEnc
      .select(col("sub"), col("code"), col("cw"), col("scale"), col("enc"))
      .collect()
    require(rows.nonEmpty, s"Pq.readCodebooks: no codebooks at $path")
    val scale = rows.head.getLong(3)
    val encoding = rows.head.getString(4)
    // every row must agree on (scale, enc): a torn or mixed _pq_codebooks
    // write would otherwise silently elect rows.head's tag and decode the
    // whole index with the wrong arithmetic
    require(rows.forall(r => r.getLong(3) == scale && r.getString(4) == encoding),
      s"Pq.readCodebooks: _pq_codebooks at $path mixes (scale, enc) values " +
        "— torn or mixed write; rebuild the index artifact")
    val bySub = rows.groupBy(_.getInt(0))
    val subspaces = bySub.keys.max + 1
    val books = (0 until subspaces).map { s =>
      bySub(s).map(r => (r.getInt(1), r.getSeq[Long](2).toArray))
        .sortBy(_._1).map(_._2).toIndexedSeq
    }
    Codebooks(subspaces, books.head.head.length, scale, books, encoding)
  }

  /** Read back a [[writeIndex]]-persisted code index (cell-partitioned),
    * UNIONED with every [[streamingPqIngest]] subtree under `_ingest` —
    * the one read all probes go through, so streamed rows are findable
    * the moment their batch commits. Each subtree is itself
    * cell-partitioned parquet, so the probe's `centroid_id` filter
    * partition-prunes every leg of the union; ingest dirs read with the
    * base schema pinned (an empty batch's subtree has no files to infer
    * from).
    */
  def readIndex(spark: SparkSession, path: String): DataFrame = {
    val base = spark.read.parquet(path)
    val ingest = IndexLifecycle.listIngestDirs(spark, path)
    if (ingest.isEmpty) base
    else (base +: ingest.map(spark.read.schema(base.schema).parquet(_)))
      .reduce(_ unionByName _)
  }

  /** Compact an appended/streamed PQ index into `targetPath` (disjoint
    * by contract, like every index family): each microbatch adds ≥ 1
    * file per touched cell, so long ingest loops accrete small files;
    * compaction folds the base layout AND every `_ingest` subtree
    * ([[readIndex]]'s union) into `filesPerCell` files per cell and
    * carries the `_centroids` + `_pq_codebooks` artifacts verbatim —
    * both are read (and thereby validated) BEFORE the corpus-sized
    * rewrite, so a non-artifact source fails in milliseconds. The
    * compacted target has no `_ingest` subtree: streamed rows become
    * base rows (the raw/residual `enc` tag survives in the carried
    * codebooks — PqSpec-locked).
    */
  def compactIndex(spark: SparkSession, path: String, targetPath: String,
      filesPerCell: Int = 1): Unit = {
    require(filesPerCell >= 1, s"filesPerCell must be >= 1, got $filesPerCell")
    IndexLifecycle.requireDistinctPaths(spark, path, targetPath, "Pq.compactIndex")
    val cents = Similarity.ivfReadCentroids(spark, path)
    require(cents.nonEmpty,
      s"Pq.compactIndex: empty _centroids at $path — not a Pq.writeIndex artifact")
    val cb = readCodebooks(spark, path)
    IndexLifecycle.clusterForPartitionedWrite(readIndex(spark, path),
        "centroid_id", filesPerPartition = filesPerCell)
      .write.partitionBy("centroid_id").mode("overwrite").parquet(targetPath)
    Similarity.writeCentroids(spark, cents, targetPath)
    writeCodebooks(spark, cb, targetPath)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.{Vectors, VectorQueries}

/** Embedding-similarity search over an `array<float>` column.
  *
  * Scale path: brute force is the exact baseline (scan × broadcast query
  * vectors — never shuffles the corpus); LSH buckets / IVF assignment bound
  * the candidate set so per-query work is corpus_size / buckets.
  */
object Similarity {

  def dot(a: Column, b: Column): Column = VectorQueries.dotCol(a, b)
  def norm(a: Column): Column = VectorQueries.normCol(a)
  def cosine(a: Column, b: Column): Column =
    cosDiv(dot(a, b), norm(a) * norm(b))

  /** Cosine's division, null on a zero denominator: a zero-norm (all-zero)
    * vector would otherwise make 0/0, which under ANSI mode (the Spark 4
    * default) is not NaN but a hard DIVIDE_BY_ZERO that kills the whole
    * job — one all-zero embedding in a 100 TB corpus must degrade to "this
    * row pairs with nothing" (null, the same convention as null vectors),
    * never to a failed stage. Every cosine site must divide through this.
    */
  private def cosDiv(num: Column, den: Column): Column =
    when(den =!= 0.0, num / den)

  /** Exact top-k by cosine against one query vector (broadcast single row). */
  def bruteForceTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int): DataFrame = {
    val qArr = array(queryVec.toIndexedSeq.map(v => lit(v)): _*)
    corpus.withColumn("cosine", cosine(col(vecCol), qArr))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cosine"))
  }

  /** Random-hyperplane LSH bucket id per row (deterministic literal
    * hyperplanes — stays inside codegen). `dim` must equal the vectors'
    * true width — a mismatch nulls the hyperplane dots and collapses every
    * bucket to 0.
    */
  def lshBucket(vecCol: Column, nBits: Int = 12, dim: Int = Vectors.Dim): Column =
    Vectors.lshBucket(vecCol, nBits, dim)

  /** Bucketed ANN: search only the query's bucket. Recall is traded for a
    * 2^nBits candidate reduction; verify with [[bruteForceTopK]].
    */
  def annTopK(corpus: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int, nBits: Int = 12): DataFrame = {
    val dim = queryVec.length
    val qBucket = {
      // same hyperplanes as lshBucket, evaluated driver-side
      (0 until nBits).map { j =>
        val r = Vectors.hyperplane(j, dim)
        val d = queryVec.zip(r).map { case (x, y) => x.toDouble * y }.sum
        if (d > 0) 1 << j else 0
      }.sum
    }
    val qArr = array(queryVec.toIndexedSeq.map(v => lit(v)): _*)
    // hyperplane dim must match the query's on BOTH sides (a shorter corpus
    // vector zip_with a longer literal hyperplane nulls the dot product)
    corpus.withColumn("__bucket", Vectors.lshBucket(col(vecCol), nBits, dim))
      .filter(col("__bucket") === qBucket)
      .withColumn("cosine", cosine(col(vecCol), qArr))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cosine"))
  }

  /** Multi-probe LSH ANN (Lv et al., "Multi-Probe LSH", VLDB'07 — a
    * published technique): besides the query's own bucket, also probe the
    * buckets reached by flipping the sign bits whose hyperplane margin
    * |dot(q, r_j)| is smallest — the bits most likely to differ for a true
    * neighbor. `probes` buckets ≈ the recall of `probes` independent hash
    * tables at 1× the index size and a `probes/2^nBits` corpus fraction
    * scanned. Probe set is computed driver-side; the corpus-side filter is
    * a bucket-id IN list (partition-prunable when persisted by bucket).
    */
  /** Flip MASKS in globally nondecreasing total-|margin| order (the Lv'07
    * query-directed probe sequence), `count` of them: min-heap over bit-sets
    * in ascending-|margin| bit order with the classic shift/expand
    * successor step — each subset is generated exactly once, the heap stays
    * O(count), total driver work O(count · log count) for ANY nBits (no
    * combination materialization). Ties on total margin break by flip
    * mask, mirroring the oracle's (total, mask) sort — property-locked
    * against brute-force mask enumeration in `OperatorsSpec`.
    */
  private[graft] def probeMasks(absMargins: IndexedSeq[Double],
      count: Int): Seq[Int] = {
    if (count <= 0 || absMargins.isEmpty) return Nil
    val sortedBits = absMargins.zipWithIndex
      .map { case (m, j) => (j, m) }.sortBy(_._2)
    def flipMask(set: Vector[Int]): Int =
      set.foldLeft(0)((m, i) => m | (1 << sortedBits(i)._1))
    val heap = scala.collection.mutable.PriorityQueue.empty[(Double, Vector[Int])](
      Ordering.by[(Double, Vector[Int]), (Double, Int)] {
        case (s, set) => (s, flipMask(set)) }.reverse)
    heap.enqueue((sortedBits(0)._2, Vector(0)))
    val out = scala.collection.mutable.ArrayBuffer.empty[Int]
    while (out.size < count && heap.nonEmpty) {
      val (score, set) = heap.dequeue()
      out += flipMask(set)
      val mx = set.last
      if (mx + 1 < absMargins.length) {
        // shift: …,mx → …,mx+1   expand: …,mx → …,mx,mx+1
        heap.enqueue((score - sortedBits(mx)._2 + sortedBits(mx + 1)._2,
          set.init :+ (mx + 1)))
        heap.enqueue((score + sortedBits(mx + 1)._2, set :+ (mx + 1)))
      }
    }
    out.toSeq
  }

  def annTopKMultiProbe(corpus: DataFrame, idCol: String, vecCol: String,
      queryVec: Array[Float], k: Int, nBits: Int = 12,
      probes: Int = 4): DataFrame = {
    require(nBits >= 1 && nBits <= 30, s"nBits must be in [1, 30], got $nBits")
    require(probes >= 1 && probes <= (1 << nBits),
      s"probes must be in [1, 2^$nBits], got $probes")
    val dim = queryVec.length
    val margins = (0 until nBits).map { j =>
      val r = Vectors.hyperplane(j, dim)
      j -> queryVec.zip(r).map { case (x, y) => x.toDouble * y }.sum
    }
    val qBucket = margins.collect { case (j, d) if d > 0 => 1 << j }.sum
    // the query's own bucket first, then [[probeMasks]]'s globally-ordered
    // flip sequence (a pair of low-margin flips may legitimately outrank a
    // single high-margin flip, so flip sizes interleave)
    val probeBuckets = (qBucket +: probeMasks(
      margins.map { case (_, d) => math.abs(d) }.toIndexedSeq, probes - 1)
      .map(qBucket ^ _)).distinct
    val qArr = array(queryVec.toIndexedSeq.map(v => lit(v)): _*)
    corpus.withColumn("__bucket", Vectors.lshBucket(col(vecCol), nBits, dim))
      .filter(col("__bucket").isin(probeBuckets: _*))
      .withColumn("cosine", cosine(col(vecCol), qArr))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cosine"))
  }

  /** Mean recall@k of an ANN strategy against the brute-force baseline over
    * a probe query set: |ann ∩ exact| / |exact| averaged across queries.
    * The tuning loop for `nBits`/`probes`/`nprobe` — run on a SAMPLE of
    * queries (each query costs two small jobs), not per production query.
    */
  def annRecallAt(corpus: DataFrame, idCol: String, vecCol: String,
      queries: Seq[Array[Float]], k: Int,
      search: Array[Float] => DataFrame): Double = {
    require(queries.nonEmpty, "annRecallAt needs at least one query vector")
    val recalls = queries.map { qv =>
      val exact = bruteForceTopK(corpus, idCol, vecCol, qv, k)
        .select(idCol).collect().map(_.getLong(0)).toSet
      if (exact.isEmpty) 1.0
      else {
        val got = search(qv).select(idCol).collect().map(_.getLong(0)).toSet
        (got & exact).size.toDouble / exact.size
      }
    }
    recalls.sum / recalls.size
  }

  /** Whole-sample recall@k in ONE distributed brute-force job (vs
    * [[annRecallAt]]'s two jobs per query — a 1k-query tuning sample there
    * launches 2k jobs): the query sample rides along as a broadcast literal
    * array, each corpus row explodes into (qid, cosine) pairs that feed a
    * k-capped heap aggregate ([[graft.functions.TopKIdsAgg]]) — explode is
    * pipelined into the partial agg, so nothing materializes and the
    * shuffle is O(partitions × |queries| × k) rows however large the
    * corpus. `ann` is the ANN result set for the SAME sample — (`qidCol`,
    * `idCol`) rows, e.g. [[annJoinTopK]] output — evaluated in one more
    * job. Per-query recall |ann ∩ exact| / |exact|, averaged; queries with
    * an empty exact set count 1.0, matching the per-query form exactly
    * (spec-asserted identical).
    */
  def annRecallAtBatch(corpus: DataFrame, idCol: String, vecCol: String,
      queries: Seq[Array[Float]], k: Int, ann: DataFrame,
      qidCol: String = "qid"): Double = {
    require(queries.nonEmpty, "annRecallAtBatch needs at least one query vector")
    graft.functions.TopKIdsAgg.register(corpus.sparkSession)
    val qlits = array(queries.zipWithIndex.map { case (qv, qi) =>
      struct(lit(qi).as("qid"),
        array(qv.toIndexedSeq.map(lit(_)): _*).as("qvec"))
    }: _*)
    val exact = corpus
      .select(col(idCol).cast("long").as("__id"), col(vecCol).as("__vec"))
      .withColumn("__q", explode(qlits))
      .select(col("__q.qid").as("__qid"),
        cosine(col("__vec"), col("__q.qvec")).as("__cos"), col("__id"))
      .groupBy("__qid")
      .agg(graft.functions.TopKIdsAgg.topkIds(
        col("__cos"), col("__id"), k).as("__ids"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSet).toMap
    val got = ann
      .select(col(qidCol).cast("int"), col(idCol).cast("long"))
      .collect().groupBy(_.getInt(0))
      .map { case (qi, rows) => qi -> rows.map(_.getLong(1)).toSet }
    val recalls = queries.indices.map { qi =>
      val ex = exact.getOrElse(qi, Set.empty)
      if (ex.isEmpty) 1.0
      else (got.getOrElse(qi, Set.empty) & ex).size.toDouble / ex.size
    }
    recalls.sum / recalls.size
  }

  /** Collect (id, vector) centroid pairs driver-side by column name — the
    * input shape [[ivfAssign]] expects. Runs one small Spark job. Accepts any
    * integral id column width (rejects ids outside Int range rather than
    * silently truncating).
    */
  def collectCentroids(df: DataFrame, idCol: String, vecCol: String): Seq[(Int, Array[Float])] =
    df.select(col(idCol).cast("long"), col(vecCol)).collect()
      .map { r =>
        val id = r.getLong(0)
        require(id >= Int.MinValue && id <= Int.MaxValue, s"centroid id $id outside Int range")
        (id.toInt, r.getAs[Seq[Float]](vecCol).toArray)
      }.toSeq

  /** Driver-side cosine over float arrays — THE one definition the probe
    * paths share (zero-norm → −1.0). Index-ordered double accumulation,
    * like the in-plan fold.
    */
  private[operators] def cosDriver(a: Array[Float], b: Array[Float]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1 }
    if (na == 0 || nb == 0) -1.0 else d / math.sqrt(na * nb)
  }

  /** The `nprobe` cells nearest a query (cos desc, cid asc on tie) — the
    * ONE probe-selection rule [[ivfSearchTopK]], [[ivfJoinTopK]]'s oracle
    * twin, and the IVF-PQ paths ([[Pq]]) all share; a drift here would
    * silently desynchronize their cell choices.
    */
  def probeCellsFor(centroids: Seq[(Int, Array[Float])],
      queryVec: Array[Float], nprobe: Int): Seq[Int] =
    centroids.map { case (cid, v) => (cid, cosDriver(queryVec, v)) }
      .sortBy { case (cid, c) => (-c, cid) }
      .take(nprobe).map(_._1)

  /** IVF-style assignment: nearest of `centroids` per row (tie → lowest
    * centroid id). Returns (row cols…, centroid_id, cosine) where `cosine`
    * is the similarity to the assigned centroid.
    *
    * The centroids become one literal array-of-structs and the argmax is a
    * per-row `aggregate` fold — a pure map-side projection with NO join, NO
    * window, NO shuffle, so the plan is a single codegen'd scan stage however
    * large the corpus. (Centroids iterate in ascending id order with a strict
    * `>`, so equal-cosine ties keep the lowest id — same as ORDER BY cos
    * DESC, cid.)
    */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])]): DataFrame = {
    require(centroids.nonEmpty, "ivfAssign needs at least one centroid")
    // Centroid norms precompute DRIVER-SIDE as literals: [[FloatVecDot]]
    // is a left-to-right double accumulation, so the fold below is
    // bit-identical IEEE math — the old in-plan norm(cvec) re-derived a
    // constant per row per centroid. And each centroid's cosine computes
    // ONCE in a `transform` (bound variable in the max-fold): the old
    // fold referenced `cs` in both the comparison and the kept struct,
    // and HOF lambdas get no CSE, so every centroid paid its dot twice
    // (the r18 Pq.train lesson, same disease). Tie rule unchanged:
    // centroids scan in cid order, strictly-greater replaces — lowest
    // cid wins ties; null cosines (zero-norm vectors) never replace.
    def normOf(v: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < v.length) { val x = v(i).toDouble; s += x * x; i += 1 }
      math.sqrt(s)
    }
    val scoredArr = array(centroids.sortBy(_._1).map { case (cid, v) =>
      struct(lit(cid).as("cid"), array(v.toIndexedSeq.map(lit(_)): _*).as("cvec"),
        lit(normOf(v)).as("cnorm"))
    }: _*)
    val scored = transform(scoredArr, c =>
      struct(c.getField("cid").as("cid"),
        cosDiv(dot(col(vecCol), c.getField("cvec")),
          col("__nrm") * c.getField("cnorm")).as("cos")))
    val best = aggregate(
      scored,
      struct(lit(-1).as("cid"), lit(-2.0).as("cos")),
      (acc, s) =>
        when(s.getField("cos") > acc.getField("cos"), s).otherwise(acc))
    corpus.withColumn("__nrm", norm(col(vecCol)))
      .withColumn("__best", best)
      .withColumn("centroid_id", col("__best").getField("cid"))
      .withColumn("cosine", col("__best").getField("cos"))
      .drop("__nrm", "__best")
  }

  /** IVF query path: probe the `nprobe` cells whose centroids are nearest
    * the query (driver-side over k centroids — tiny), then exact-cosine
    * top-k over ONLY those cells' rows. `assigned` is [[ivfAssign]] output
    * (or a table persisted from it); at scale, persist via [[ivfWrite]]
    * (`partitionBy("centroid_id")`) and the `isin` filter becomes partition
    * pruning — the query scans nprobe/k of the corpus and shuffles nothing
    * (asserted end-to-end on the selected file set in PartitioningSpec).
    * Recall is the IVF trade: a true neighbor assigned to an unprobed cell
    * is missed; raise `nprobe` toward k to converge on [[bruteForceTopK]].
    */
  def ivfSearchTopK(assigned: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])], queryVec: Array[Float],
      k: Int, nprobe: Int = 2, cellCap: Int = 0): DataFrame = {
    require(centroids.nonEmpty, "ivfSearchTopK needs centroids")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    val cells = probeCellsFor(centroids, queryVec, nprobe)
    val qArr = array(queryVec.toIndexedSeq.map(v => lit(v)): _*)
    capCells(assigned.filter(col("centroid_id").isin(cells: _*)),
        idCol, cellCap)
      .withColumn("cosine", cosine(col(vecCol), qArr))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cosine"))
  }

  /** Optional verify-stage bound for the IVF paths: keep at most `cellCap`
    * members per probed cell — a DETERMINISTIC uniform sample in
    * `xxhash64(id)` order — before the exact-cosine stage. With the cap
    * off (0, the default) results are exact over the probed cells; with it
    * on, per-query verify work is bounded by nprobe × cellCap dot products
    * no matter how occupancy-skewed the index is (the 100× duplicated
    * corpus puts 100× the members in every probed cell and the verify
    * stage alone grows 100-fold — measured in SCALE.md, with the recall
    * delta). Cost: one row_number window over the PROBED rows only
    * (narrow: id, vector, cell), after partition pruning; cells at or
    * under the cap pass through byte-identically. Hash order, not head(n):
    * a head sample would bias toward whatever order the files were
    * written in (often insertion time), while the hash is a uniform draw
    * that is stable across runs and plans.
    */
  private def capCells(probed: DataFrame, idCol: String, cellCap: Int): DataFrame = {
    require(cellCap >= 0, s"cellCap must be >= 0 (0 = off), got $cellCap")
    if (cellCap == 0) probed
    else {
      import org.apache.spark.sql.expressions.Window
      val cw = Window.partitionBy(col("centroid_id"))
        .orderBy(xxhash64(col(idCol)), col(idCol))
      probed.withColumn("__cn", row_number().over(cw))
        .filter(col("__cn") <= cellCap).drop("__cn")
    }
  }

  /** Batch IVF serving: [[ivfSearchTopK]] for a query SET — each query's
    * `nprobe` nearest cells are computed IN-PLAN (scores against the
    * literal centroid array, `array_sort`, slice, explode — no driver loop
    * over queries), then the probed (query, cell) pairs join the assigned
    * corpus on `centroid_id` with the query side broadcast. Cell choice and
    * tie rules match [[ivfSearchTopK]] exactly (cos desc, cid asc). The
    * corpus never shuffles, and the UNION of probed cells — collected in
    * one tiny job over the (broadcast-sized by assumption) query side — is
    * pushed as a STATIC `centroid_id IN (…)` filter, so an
    * [[ivfWrite]]-persisted index is partition-pruned to the probed cells'
    * files before the join (spec-asserted on the selected file set;
    * Spark's dynamic-pruning subquery would not fire here — its heuristic
    * wants a filtered dimension side). Per-query ranking touches only
    * probed-cell candidates; `cellCap` optionally bounds the exact-cosine
    * verify per cell under occupancy skew ([[capCells]]).
    */
  def ivfJoinTopK(assigned: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      centroids: Seq[(Int, Array[Float])], k: Int, nprobe: Int = 2,
      cellCap: Int = 0, broadcastQueries: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(centroids.nonEmpty, "ivfJoinTopK needs centroids")
    require(nprobe >= 1, s"nprobe must be >= 1, got $nprobe")
    // (-cos, cid) structs: array_sort's lexicographic order = cos desc,
    // tie -> lowest cid — the ivfSearchTopK probe rule
    val cellScores = array(centroids.sortBy(_._1).map { case (cid, v) =>
      val cvec = array(v.toIndexedSeq.map(lit(_)): _*)
      struct((-cosDiv(dot(col(qVecCol), cvec), norm(col(qVecCol)) * norm(cvec)))
        .as("negcos"), lit(cid).as("cid"))
    }: _*)
    val qs = queries
      .withColumn("__cell", explode(transform(
        slice(array_sort(cellScores), 1, nprobe), _.getField("cid"))))
    // one tiny job over the broadcast-sized query side turns the probed-cell
    // union into a static filter the source can partition-prune on
    val probedCells = qs.select("__cell").distinct()
      .collect().map(_.getInt(0)).toSeq
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cosine").desc, col(idCol))
    // broadcastQueries: same strategy trade as [[annJoinTopKMultiProbe]];
    // the probed-cell pruning above stays either way (its collect is
    // bounded by the CENTROID count, not the batch — distinct runs
    // distributed)
    val qside = if (broadcastQueries) broadcast(qs) else qs.hint("shuffle_hash")
    capCells(assigned.filter(col("centroid_id").isin(probedCells: _*)),
        idCol, cellCap)
      .join(qside, col("centroid_id") === col("__cell"))
      .withColumn("cosine", cosine(col(vecCol), col(qVecCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__cell", "__rn")
  }

  /** Batch multi-query ANN: join a query SET to the corpus on LSH bucket id,
    * then take the top-k candidates per query — the shape that scales to a
    * 100 TB corpus. The corpus computes its bucket map-side and never
    * shuffles (the query side is broadcast); the per-query `row_number` ranks
    * only the joined candidates (corpus_size / 2^nBits per query in
    * expectation), not the corpus.
    *
    * `queries` column names must not collide with `corpus` ones. Recall is
    * the standard LSH trade-off: a true neighbor in a different bucket is
    * missed; verify with [[bruteForceTopK]].
    *
    * `dim` MUST equal the vectors' true width: the hyperplanes are literal
    * arrays, and a width mismatch nulls every dot product, collapsing all
    * buckets to 0 — the "join" then silently degenerates into a per-query
    * full-corpus scan.
    */
  def annJoinTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, nBits: Int = 12, dim: Int = Vectors.Dim,
      broadcastQueries: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = corpus.withColumn("__bucket", Vectors.lshBucket(col(vecCol), nBits, dim))
    val qs = queries.withColumn("__qbucket", Vectors.lshBucket(col(qVecCol), nBits, dim))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cosine").desc, col(idCol))
    // broadcastQueries: same strategy trade as [[annJoinTopKMultiProbe]] —
    // default serves bounded batches against a never-shuffled corpus;
    // false runs a shuffle-hash join for bulk batches
    val qside = if (broadcastQueries) broadcast(qs) else qs.hint("shuffle_hash")
    c.join(qside, col("__bucket") === col("__qbucket"))
      .withColumn("cosine", cosine(col(vecCol), col(qVecCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__bucket", "__qbucket", "__rn")
  }

  /** Batch MULTI-PROBE ANN: [[annJoinTopK]] widened so every query also
    * probes the buckets reached by flipping its lowest-|margin| sign bits.
    * Two regimes, same join shape (corpus computes its bucket map-side and
    * never shuffles; query side broadcast):
    *
    *  - `probes <= nBits + 1` (the common case): probe sets computed
    *    IN-PLAN per query row — no driver job at all. STEP-WISE single-bit
    *    probing (flip the lowest-|margin| bits in margin order — Lv'07's
    *    simpler step-wise variant). Note this is not always identical to
    *    the global total-margin ordering: a pair of tiny-margin flips can
    *    outrank one large single flip, so for the same `probes` the two
    *    regimes may visit slightly different bucket sets — both are
    *    published probe policies; pick the deep regime when exact Lv'07
    *    ordering matters.
    *  - `probes > nBits + 1` (deep probing): multi-bit flip masks in the
    *    full Lv'07 global total-margin order — ALSO fully in-plan: the
    *    same heap generator as the single-query form ([[probeMasks]])
    *    runs per query row as a native expression
    *    ([[graft.functions.Lv07ProbeMasksExpr]]). No driver collect, no
    *    literal probe map, and therefore no query-count bound, no
    *    qid-uniqueness contract and no double-evaluation hazard — the
    *    deep regime scales to whatever query set the broadcast join
    *    itself can carry. (Until round 9 this regime collected the query
    *    set and keyed a literal qid → buckets map; the expression form
    *    removed that driver-side contract entirely.)
    *
    * Spec-locked: the deep regime returns exactly the per-query
    * [[annTopKMultiProbe]] results for every query in the batch (and the
    * join-strategy flag below does not change results, only the plan).
    *
    * `broadcastQueries` picks the join strategy for the (bucket == probe)
    * join. Default true: the EXPLODED query side (|queries| × probes
    * rows, each carrying its vector) broadcasts and the corpus never
    * shuffles — the serving shape, right when the corpus dwarfs the batch
    * (broadcasting a bounded batch beats shuffling a 100 TB corpus by
    * construction). For BULK batches flip it false: the join runs as a
    * shuffle-hash join, the corpus pays ONE shuffle on its bucket key and
    * both sides stream. Measured on a 20k-vector corpus (local[32],
    * probes=16, min of 3): 200k queries — broadcast stalls on the
    * multi-GB driver-side build (killed after 17 min), shuffle finishes
    * in 41 s; even 20k queries — broadcast 78 s vs shuffle 4.7 s, because
    * with a small corpus the broadcast build dominates. Results are
    * identical either way; only the plan changes.
    */
  def annJoinTopKMultiProbe(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, nBits: Int = 12, probes: Int = 4,
      dim: Int = Vectors.Dim, broadcastQueries: Boolean = true): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(nBits >= 1 && nBits <= 30, s"nBits must be in [1, 30], got $nBits")
    require(probes >= 1 && probes <= (1 << nBits),
      s"probes must be in [1, 2^$nBits], got $probes")
    val qs = if (probes <= nBits + 1) {
      // per-bit margin structs; field order (am, b, ...) makes array_sort's
      // lexicographic struct order = (|margin| asc, bit asc) — the probe order
      val margins = array((0 until nBits).map { j =>
        val r = Vectors.hyperplane(j, dim)
        val rCol = array(r.toIndexedSeq.map(lit): _*)
        val d = VectorQueries.dotCol(col(qVecCol), rCol)
        struct(abs(d).as("am"), lit(j).as("b"), lit(1 << j).as("bit"), d.as("d"))
      }: _*)
      queries
        .withColumn("__m", margins)
        .withColumn("__qbucket", aggregate(col("__m"), lit(0), (acc, e) =>
          acc + when(e.getField("d") > 0, e.getField("bit")).otherwise(0)))
        .withColumn("__probe", explode(concat(
          array(col("__qbucket")),
          transform(slice(array_sort(col("__m")), 1, probes - 1),
            f => col("__qbucket").bitwiseXOR(f.getField("bit"))))))
        .drop("__m")
    } else {
      // deep probing, fully in-plan: per-bit margins exactly as above,
      // then the Lv'07 heap generator runs per row as a native expression
      // — masks are nonzero and distinct (locked by the probeMasks spec),
      // so XOR against the query's own bucket never duplicates a probe
      val margins = array((0 until nBits).map { j =>
        val r = Vectors.hyperplane(j, dim)
        val rCol = array(r.toIndexedSeq.map(lit): _*)
        val d = VectorQueries.dotCol(col(qVecCol), rCol)
        struct(abs(d).as("am"), lit(1 << j).as("bit"), d.as("d"))
      }: _*)
      queries
        .withColumn("__m", margins)
        .withColumn("__qbucket", aggregate(col("__m"), lit(0), (acc, e) =>
          acc + when(e.getField("d") > 0, e.getField("bit")).otherwise(0)))
        .withColumn("__probe", explode(concat(
          array(col("__qbucket")),
          transform(
            graft.functions.Lv07ProbeMasks.masksCol(
              transform(col("__m"), e => e.getField("am")), probes - 1),
            m => col("__qbucket").bitwiseXOR(m)))))
        .drop("__m")
    }
    val c = corpus.withColumn("__bucket", Vectors.lshBucket(col(vecCol), nBits, dim))
    val w = Window.partitionBy(col(qIdCol)).orderBy(col("cosine").desc, col(idCol))
    val qside = if (broadcastQueries) broadcast(qs) else qs.hint("shuffle_hash")
    c.join(qside, col("__bucket") === col("__probe"))
      .withColumn("cosine", cosine(col(vecCol), col(qVecCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__bucket", "__qbucket", "__probe", "__rn")
  }

  /** Embedding-cosine near-duplicate pairs via banded random-hyperplane LSH —
    * the candidate-generation shape that survives 100 TB. Rows are exploded
    * into `bands` (band, bucket) keys from disjoint hyperplane blocks; a pair
    * is a candidate iff SOME band agrees (prefixed by `blockCols` equality),
    * so the pair machinery shuffles once on (blockCols…, band, bucket) —
    * bounded buckets, in-group pair explosion (see [[Lsh.candidatePairs]]) —
    * never on blockCols alone, which at fixed cardinality is quadratic in
    * the corpus. Candidates are then verified with the exact cosine
    * (> `minCosine`) from one narrow join-back.
    *
    * Recall is the banding OR: with `bitsPerBand` b and per-bit agreement
    * p = 1 − θ/π, a true pair is caught with 1 − (1 − p^b)^bands. Hot buckets
    * (> `hotBucketThreshold`) star-link to the bucket's lowest id — see
    * [[Lsh.candidatePairs]].
    *
    * `dim` MUST equal the vectors' true width: a mismatch nulls the
    * hyperplane dots, collapsing every band bucket to 0 — blocks then
    * degenerate into single hot buckets whose star-linking silently drops
    * most true pairs (the exact verify can't recover candidates that were
    * never generated).
    *
    * Returns (ida, idb, cosine) with ida < idb.
    */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double, blockCols: Seq[String] = Nil,
      bands: Int = 4, bitsPerBand: Int = 4,
      hotBucketThreshold: Int = Dedup.DefaultHotBucketThreshold,
      dim: Int = Vectors.Dim): DataFrame = {
    val e = df.select(
      (col(idCol) +: blockCols.map(col)) :+ col(vecCol) :+ norm(col(vecCol)).as("__nrm"): _*)
    val bandKeys = array((0 until bands).map { b =>
      struct(lit(b).as("__band"),
        Vectors.lshBandBucket(col(vecCol), b, bitsPerBand, dim).as("__bkt"))
    }: _*)
    val exploded = e.select(
      (col(idCol) +: blockCols.map(col)) :+ inline(bandKeys): _*)
    val cand = Lsh.candidatePairs(
      exploded, idCol, blockCols ++ Seq("__band", "__bkt"), hotBucketThreshold)
    val v = e.select(col(idCol), col(vecCol), col("__nrm"))
    cand.join(v.as("a"), col(s"a.$idCol") === col("ida"))
      .join(v.as("b"), col(s"b.$idCol") === col("idb"))
      .withColumn("cosine", cosDiv(dot(col(s"a.$vecCol"), col(s"b.$vecCol")),
        col("a.__nrm") * col("b.__nrm")))
      .filter(exceedsTau(col("cosine"), minCosine))
      .select(col("ida"), col("idb"), col("cosine"))
  }

  /** NaN-safe similarity threshold. Zero-norm cosines are already null via
    * [[cosDiv]] (and null > tau = null, which filters drop), but NaN can
    * still arrive through overflow shapes (inf/inf), and Spark's comparison
    * semantics order NaN ABOVE every double — a bare `cosine > tau` would
    * call such a pair a near-duplicate where the Java/driver-side
    * brute-force reference (NaN > tau = false) treats it as unpairable.
    * Every pair/match verify site must use this guard.
    */
  private def exceedsTau(cos: Column, tau: Double): Column =
    cos > tau && !isnan(cos)

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
    * scoped to clusters. Every row is assigned to its nearest centroid
    * ([[ivfAssign]] — one literal centroid array, pure map-side, no shuffle),
    * and duplicates are then detected ONLY within a cluster: a row is flagged
    * `is_semdup` when some other row in the same cluster with a LOWER id has
    * cosine > `tau` with it. Clustering is what makes the paper's recipe
    * viable at web scale — pair work is Σ|cell|² instead of N², and the
    * cluster count k is the knob that bounds per-cell size (k ≈ N / target
    * cell size; the paper uses k = 50k on LAION).
    *
    * Keep policy — "dominated by an earlier id": deterministic, unlike the
    * paper's random-exemplar choice, so results are reproducible and
    * oracle-checkable. Note it is the EXISTS form, not the sequential greedy
    * scan: a row dominated only by an already-removed earlier row is still
    * removed (in a chain a–b–c with cos(a,b), cos(b,c) > tau but cos(a,c) ≤
    * tau, both b and c are flagged). This is the natural one-join semantics
    * — the greedy variant is inherently sequential per cell and cannot be
    * expressed as a bounded-depth plan.
    *
    * With `bands` = 0 (default) candidates are the full within-cell pair set
    * (the paper's exact recipe): a self-equi-join on `centroid_id`, one
    * shuffle of each side, per-cell quadratic verify. With `bands` > 0, the
    * within-cell candidates come from banded random-hyperplane LSH instead
    * ([[nearDupPairs]] with `centroid_id` as the block column) — per-cell
    * work drops to bucket-bounded pair explosion, the shape that survives
    * skewed giant cells, at the banding OR's recall (near-1 for true
    * near-dups at tau ≥ 0.9; see [[nearDupPairs]]).
    *
    * `collapseExact` (default ON) collapses byte-identical vectors to their
    * min-id representative BEFORE the pair stage, so within-cell work is
    * quadratic in DISTINCT vectors, not rows — the shape that survives a
    * duplicate-heavy crawl where a 100-twin clique would otherwise pay
    * C(100,2) per clique inside its cell. At `bands` = 0 this is
    * semantics-preserving under the dominated-by-earlier policy because
    * cosine is a function of the vector: a twin of any rep is dominated by
    * its group's min id (cos = 1 > tau, same cell — identical vectors
    * assign identically), and a group min is dominated by an earlier row
    * iff it is dominated by that row's rep (identical vector ⇒ identical
    * cosine, and rep id ≤ row id). The equivalence is locked row-for-row
    * in SemDedupSpec and re-proved every round by the q_semdedup oracle,
    * whose SQL computes the naive per-row semantics. With `bands` > 0 the
    * two modes can differ in the LSH approximation's FAVOR: the collapsed
    * path buckets distinct reps, so a duplicate-heavy corpus cannot
    * inflate buckets past the hot-bucket star guard the way the naive
    * path's twins do — same candidates or more, never fewer.
    *
    * Returns the input columns + `centroid_id` + `is_semdup`. Ids must be
    * distinct (the keep policy is an ordering by id); `tau` ∈ (−1, 1).
    */
  def semDedupFlag(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])], tau: Double,
      bands: Int = 0, bitsPerBand: Int = 4,
      hotBucketThreshold: Int = Dedup.DefaultHotBucketThreshold,
      dim: Int = Vectors.Dim, collapseExact: Boolean = true): DataFrame = {
    require(tau > -1.0 && tau < 1.0, s"tau must be in (-1, 1), got $tau")
    requireFreeColumns(corpus, "semDedupFlag",
      "centroid_id", "is_semdup", "cosine", "__rm", "__gmin", "__gvec",
      "__nrm", "__best")
    if (collapseExact) {
      val repFlag = semDedupFlag(
          distinctVectorGroups(corpus, idCol, vecCol)
            .select(col("__gmin").as(idCol), col("__gvec").as(vecCol)),
          idCol, vecCol, centroids, tau, bands, bitsPerBand,
          hotBucketThreshold, dim, collapseExact = false)
        .select(col(vecCol).as("__gvec"), col(idCol).as("__gmin"),
          col("centroid_id"), col("is_semdup").as("__repdup"))
      // unpairable vectors (null, any null ELEMENT, or all-zero — the
      // cosine is null or NaN, so the naive path can never pair them) are
      // excluded from twin domination, keeping the two modes row-for-row
      // equal
      return corpus.join(repFlag, col(vecCol) <=> col("__gvec"))
        .withColumn("is_semdup",
          col("__repdup") ||
            (col(idCol) =!= col("__gmin") && !unpairableVec(col(vecCol))))
        .drop("__gvec", "__gmin", "__repdup")
    }
    val assigned = ivfAssign(corpus, idCol, vecCol, centroids).drop("cosine")
    val removed = withinCellPairs(assigned, idCol, vecCol, tau, bands,
        bitsPerBand, hotBucketThreshold, dim)
      .select(col("idb").as("__rm")).distinct()
    assigned.join(removed, col(idCol) === col("__rm"), "left_outer")
      .withColumn("is_semdup", col("__rm").isNotNull)
      .drop("__rm")
  }

  private def requireFreeColumns(df: DataFrame, op: String,
      names: String*): Unit =
    names.foreach { c =>
      require(!df.columns.contains(c),
        s"$op: input already has a $c column; rename it first")
    }

  /** A vector the pair machinery can never match: whole-array null, any
    * null ELEMENT ([[dot]] returns null either way, so every cosine
    * comparison drops it), ALL-ZERO (cosine = 0/0 = NaN, which
    * [[exceedsTau]] rejects), or any NaN ELEMENT (every cosine involving
    * it is NaN — rejected the same way). The collapse paths must treat
    * such rows as singletons even when the grouping key considers them
    * equal (array grouping compares null elements as equal and NaN
    * elements as equal) — otherwise a twin of such a rep would be flagged
    * via the identical-⇒-cos-1 twin rule that simply does not hold when
    * the cosine is null/NaN, and the collapsed and naive modes would
    * diverge.
    */
  private def unpairableVec(v: Column): Column =
    when(v.isNull, lit(true))
      .otherwise(exists(v, x => x.isNull || isnan(x)) ||
        forall(v, _ === lit(0.0f)))

  /** Shared distinct-vector scaffolding of the collapse paths: one shuffle
    * on the vector itself (array equality = content identity, no
    * hash-collision risk) → `(__gvec, __gmin)`. The respread is
    * load-bearing: the collapse's small aggregate output lets AQE coalesce
    * its exchange well below cluster width, and the downstream per-rep
    * centroid fold (k dots/row — the expensive stage at a real k) would
    * inherit that width; REPARTITION_BY_NUM is exempt from coalescing
    * (same lesson as SpanDedup's gram legs, SCALE.md).
    */
  private def distinctVectorGroups(corpus: DataFrame, idCol: String,
      vecCol: String): DataFrame =
    corpus.groupBy(col(vecCol).as("__gvec"))
      .agg(min(col(idCol)).as("__gmin"))
      .repartition(corpus.sparkSession.sparkContext.defaultParallelism)

  /** Shared within-cell candidate+verify stage of the SemDeDup family:
    * `(ida, idb)` with ida < idb, cosine > tau, same cell. `bands` = 0 =
    * exact per-cell self-join; `bands` > 0 = star-guarded banded LSH
    * blocked by the cell.
    */
  private def withinCellPairs(assigned: DataFrame, idCol: String,
      vecCol: String, tau: Double, bands: Int, bitsPerBand: Int,
      hotBucketThreshold: Int, dim: Int): DataFrame =
    if (bands <= 0) {
      val e = assigned.select(
        col(idCol), col(vecCol), col("centroid_id"),
        norm(col(vecCol)).as("__nrm"))
      e.as("a").join(e.as("b"),
          col("a.centroid_id") === col("b.centroid_id") &&
            col(s"a.$idCol") < col(s"b.$idCol"))
        .filter(exceedsTau(
          cosDiv(dot(col(s"a.$vecCol"), col(s"b.$vecCol")),
            col("a.__nrm") * col("b.__nrm")), tau))
        .select(col(s"a.$idCol").as("ida"), col(s"b.$idCol").as("idb"))
    } else {
      nearDupPairs(assigned, idCol, vecCol, tau,
          blockCols = Seq("centroid_id"), bands, bitsPerBand,
          hotBucketThreshold, dim)
        .select(col("ida"), col("idb"))
    }

  /** [[semDedupFlag]] survivors only — the deduplicated corpus, with each
    * row's `centroid_id` retained (useful for downstream per-domain stats).
    */
  def semDedup(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])], tau: Double,
      bands: Int = 0, bitsPerBand: Int = 4,
      hotBucketThreshold: Int = Dedup.DefaultHotBucketThreshold,
      dim: Int = Vectors.Dim, collapseExact: Boolean = true): DataFrame =
    semDedupFlag(corpus, idCol, vecCol, centroids, tau, bands, bitsPerBand,
        hotBucketThreshold, dim, collapseExact)
      .filter(!col("is_semdup")).drop("is_semdup")

  /** SemDeDup with a SURVIVOR POLICY — the production form: semantic
    * duplicate groups are the connected components of the within-cell
    * tau-similarity graph (pairs never cross cells, so components stay
    * cell-local), and each group keeps the member MAXIMIZING `keepBy`
    * (ties → lowest id), e.g. a quality score or document length, instead
    * of [[semDedup]]'s earliest-id exemplar.
    *
    * Note the group semantics differ from [[semDedupFlag]]'s
    * dominated-by-earlier EXISTS on purpose: a survivor policy needs
    * actual GROUPS to pick from, so the transitive closure is the right
    * equivalence here (the same relationship [[Dedup.dedupNear]] has to
    * [[Dedup.dedupNearBy]]). Components come from the O(log²)-round
    * large-star/small-star contraction; the arg-max is one
    * map-side-combined `groupBy(rep)`.
    *
    * `bands` = 0 pairs each cell exactly (quadratic per cell — the paper's
    * cost model, bounded by cell size via k); `bands` > 0 uses star-guarded
    * banded LSH within cells. Returns the surviving input rows.
    *
    * `collapseExact` (default ON) runs the pair/CC machinery over DISTINCT
    * vectors only and expands components back to rows. Exact at `bands` =
    * 0 and tau < 1 (which the guard enforces): every twin pairs with its
    * rep at cos = 1 > tau, and identical vectors have identical cosines to
    * everything else, so the row-level component graph is precisely the
    * rep-level one with each twin glued to its rep's component — the
    * survivor arg-max then runs over the expanded ROW set, so a twin with
    * the best `keepBy` still wins its component. Vectors that are null,
    * carry a null ELEMENT, or are all-zero are singletons in both modes
    * (the cosine is null or NaN — they can never pair; see
    * [[unpairableVec]]/[[exceedsTau]]).
    */
  def semDedupBy(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])], tau: Double, keepBy: Column,
      bands: Int = 0, bitsPerBand: Int = 4,
      hotBucketThreshold: Int = Dedup.DefaultHotBucketThreshold,
      dim: Int = Vectors.Dim, collapseExact: Boolean = true): DataFrame = {
    require(tau > -1.0 && tau < 1.0, s"tau must be in (-1, 1), got $tau")
    requireFreeColumns(corpus, "semDedupBy",
      "rep", "centroid_id", "cosine", "ida", "idb", "__nrm", "__best",
      "__row", "__gvec", "__gmin", "__grep")
    val cols = corpus.columns.toIndexedSeq
    val rowReps: DataFrame =
      if (collapseExact) {
        val groups = distinctVectorGroups(corpus, idCol, vecCol)
        val reps = groups.select(col("__gmin").as(idCol),
          col("__gvec").as(vecCol))
        val assigned = ivfAssign(reps, idCol, vecCol, centroids).drop("cosine")
        val pairs = withinCellPairs(assigned, idCol, vecCol, tau, bands,
          bitsPerBand, hotBucketThreshold, dim)
        val repCC = Dedup.connectedComponents(pairs, reps, idCol)
          .select(col(idCol).as("__gmin"), col("rep").as("__grep"))
        corpus.join(groups, col(vecCol) <=> col("__gvec"))
          .join(repCC, Seq("__gmin"))
          // an unpairable row (null vector OR any null element — the dot is
          // null either way) can never pair in the naive path: its own
          // component, not its content group's
          .withColumn("rep",
            when(unpairableVec(col(vecCol)), col(idCol))
              .otherwise(col("__grep")))
          .select((cols.map(col) :+ col("rep")): _*)
        // (unpairableVec also covers all-zero vectors: their pair cosine is
        // NaN, which exceedsTau rejects in the naive path)
      } else {
        val assigned = ivfAssign(corpus, idCol, vecCol, centroids).drop("cosine")
        val pairs = withinCellPairs(assigned, idCol, vecCol, tau, bands,
          bitsPerBand, hotBucketThreshold, dim)
        corpus.join(Dedup.connectedComponents(pairs, corpus, idCol), Seq(idCol))
      }
    rowReps
      .groupBy(col("rep"))
      .agg(max_by(struct(cols.map(col): _*),
        struct(keepBy.as("q"), (-col(idCol)).as("negid"))).as("__row"))
      .select(cols.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** Persist an embedding corpus as a SEMANTIC-DEDUP INDEX — the vector
    * analog of [[Dedup.writeSignatureIndex]]: IVF assignment partitioned
    * by `centroid_id` on disk, with the centroids stored INSIDE the index
    * (`path/_centroids`, the [[ivfWriteWithCentroids]] layout). Storing
    * the centroids in-index removes the drift failure class the text
    * index's banding metadata guards against: a probe that assigned the
    * batch with DIFFERENT centroids would land rows in different cells and
    * silently return zero matches — here the probe can only ever use the
    * writer's centroids, because it reads them from the artifact.
    */
  def writeSemIndex(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])], path: String): Unit =
    ivfWriteWithCentroids(
      ivfAssign(corpus.select(col(idCol), col(vecCol)), idCol, vecCol,
        centroids).drop("cosine"),
      centroids, path) // ivfWrite salt-clusters by cell (small-file guard)

  /** Append rows to a [[writeSemIndex]] index (the ingest loop's second
    * half): assignment uses the INDEX'S OWN centroids, `partitionBy` the
    * cell — partition-append, no rewrite of existing cells' files.
    * CONTRACT: at-most-once per row (a replayed append duplicates rows —
    * harmless to the dedup probes, which `distinct()` pairs, but it
    * inflates the index); the streaming loop uses [[ingestSemBatch]]
    * instead, which is replay-IDEMPOTENT.
    */
  def appendToSemIndex(df: DataFrame, idCol: String, vecCol: String,
      path: String): Unit = {
    val cents = ivfReadCentroids(df.sparkSession, path)
    validateSemIndex(df, idCol, vecCol, path, "appendToSemIndex")
    ivfAssign(df.select(col(idCol), col(vecCol)), idCol, vecCol, cents)
      .drop("cosine")
      .write.partitionBy("centroid_id").mode("append").parquet(path)
  }

  /** One streaming-ingest microbatch for the semantic index — the sem
    * member of the shared `_ingest/<queryTag>/b_<batchId>` subtree
    * convention ([[IndexLifecycle]], same as the text/signature/line/
    * image/PQ families): the batch's cell-assigned rows stage into the
    * subtree's `.tmp` sibling and publish by rename, so a REPLAYED batch
    * overwrites its own subtree instead of appending duplicate rows and
    * probes never see a half-written one.
    */
  def ingestSemBatch(batch: DataFrame, idCol: String, vecCol: String,
      indexPath: String, queryTag: String, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val cents = ivfReadCentroids(spark, indexPath)
    validateSemIndex(batch, idCol, vecCol, indexPath, "ingestSemBatch")
    val rows = ivfAssign(batch.select(col(idCol), col(vecCol)), idCol,
      vecCol, cents).drop("cosine")
    IndexLifecycle.requireBatchIdFresh(spark, indexPath, queryTag,
      batchId, "ingestSemBatch")
    val dir = IndexLifecycle.ingestBatchDir(indexPath, queryTag, batchId)
    IndexLifecycle.writeViaTmp(spark, dir) { tmp =>
      IndexLifecycle.clusterForPartitionedWrite(rows, "centroid_id")
        .write.mode("overwrite").partitionBy("centroid_id").parquet(tmp)
    }
  }

  /** The sem index's live roots: base tree ∪ published ingest subtrees
    * (in-flight `.tmp` stages invisible), minus the optionally-excluded
    * one (a replaying batch must not probe its own previous write).
    */
  private def semIndexRoots(spark: org.apache.spark.sql.SparkSession,
      path: String, exclude: Option[String] = None): Seq[String] =
    IndexLifecycle.liveRoots(spark, path, exclude)

  private def validateSemIndex(df: DataFrame, idCol: String, vecCol: String,
      path: String, op: String): Unit = {
    val idxCols = df.sparkSession.read.parquet(path).columns.toSet
    require(idxCols.contains(idCol) && idxCols.contains(vecCol),
      s"$op: index at $path has columns ${idxCols.mkString(", ")} — " +
        s"expected the probe's idCol=$idCol and vecCol=$vecCol; index and " +
        "probe must agree on column names or matches silently miss")
  }

  /** Incremental semantic dedup: flag each row of a BOUNDED ingest `batch`
    * that has ANY index member in its cell with cosine > `tau` (the index
    * is "earlier" by definition — the dominated-by-earlier policy across
    * snapshots). Returns `(idCol, corpus_id, cosine)` matches.
    *
    * The index never shuffles or rescans: the batch is assigned map-side
    * with the index's own centroids, its probed CELLS (≤ k, driver-tiny)
    * prune the index scan to matching partitions statically, and the batch
    * side broadcasts into the cell equi-join. Self-pairs (same id — a
    * replayed append) are excluded, so re-ingesting a doc already indexed
    * does not flag it against itself.
    *
    * `maxBatchRows` keeps the bounded-batch contract CHECKED (a
    * limit(cap+1) count — only a long returns to the driver — instead of
    * an executor OOM mid-broadcast): corpus-sized frames should rebuild
    * with [[semDedup]] instead.
    */
  def semDedupAgainstIndex(batch: DataFrame, idCol: String, vecCol: String,
      indexPath: String, tau: Double,
      maxBatchRows: Int = 1 << 20,
      excludeSubtree: Option[String] = None): DataFrame = {
    require(tau > -1.0 && tau < 1.0, s"tau must be in (-1, 1), got $tau")
    val spark = batch.sparkSession
    validateSemIndex(batch, idCol, vecCol, indexPath, "semDedupAgainstIndex")
    val got = batch.select(col(idCol)).limit(maxBatchRows + 1).count()
    require(got <= maxBatchRows,
      s"semDedupAgainstIndex broadcasts the ingest batch, and it exceeds " +
        s"maxBatchRows=$maxBatchRows — this operator is for BOUNDED " +
        "batches probing a large index; split the batch (foreachBatch " +
        "microbatches), raise maxBatchRows explicitly, or run semDedup " +
        "over the full corpus instead")
    val cents = ivfReadCentroids(spark, indexPath)
    val assigned = ivfAssign(batch.select(col(idCol), col(vecCol)), idCol,
        vecCol, cents)
      .drop("cosine")
      .withColumn("__nn", norm(col(vecCol)))
    val cells = assigned.select(col("centroid_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (cells.isEmpty)
      return assigned.select(col(idCol), col(idCol).as("corpus_id"),
        lit(0.0).as("cosine")).limit(0)
    // base tree ∪ published ingest subtrees, read under the base's own
    // schema (an EMPTY published batch reads as zero rows instead of
    // failing inference); cell pruning pushes into every root alike
    val baseSchema = spark.read.parquet(indexPath).schema
    val index = semIndexRoots(spark, indexPath, excludeSubtree)
      .map(r => spark.read.schema(baseSchema).parquet(r))
      .reduce(_ unionByName _)
      .filter(col("centroid_id").isin(cells: _*)) // static partition pruning
      .withColumn("__nc", norm(col(vecCol)))
    index.as("c")
      .join(broadcast(assigned.as("n")),
        col("n.centroid_id") === col("c.centroid_id"))
      .filter(col(s"n.$idCol") =!= col(s"c.$idCol"))
      .withColumn("cosine", cosDiv(dot(col(s"n.$vecCol"), col(s"c.$vecCol")),
        col("n.__nn") * col("c.__nc")))
      .filter(exceedsTau(col("cosine"), tau))
      .select(col(s"n.$idCol").as(idCol), col(s"c.$idCol").as("corpus_id"),
        col("cosine"))
      // replayed appends can leave duplicate rows in the index; without a
      // distinct they surface as duplicate (id, corpus_id) matches (cosine
      // is a function of the vectors, so the full-row distinct dedups the
      // pair exactly)
      .distinct()
  }

  /** [[semDedupAgainstIndex]] keep-side filter: the batch with
    * index-dominated rows removed — only semantically new content enters
    * the corpus. One extra anti join of the batch against its flagged ids.
    */
  def cleanSemAgainstIndex(batch: DataFrame, idCol: String, vecCol: String,
      indexPath: String, tau: Double,
      maxBatchRows: Int = 1 << 20,
      excludeSubtree: Option[String] = None): DataFrame =
    batch.join(
      semDedupAgainstIndex(batch, idCol, vecCol, indexPath, tau, maxBatchRows,
        excludeSubtree)
        .select(idCol).distinct(),
      Seq(idCol), "left_anti")

  /** Compact a [[writeSemIndex]]/[[appendToSemIndex]] index into
    * `targetPath`: every microbatch append adds at least one file per
    * touched cell, so a long-running ingest loop accretes thousands of
    * small files whose per-file open/footer cost eventually dominates the
    * probe's pruned scan. Compaction rewrites each cell's rows into
    * `filesPerCell` files (cell-partitioned layout and the `_centroids`
    * artifact preserved byte-for-byte), reading the index ONCE with one
    * shuffle on the cell key.
    *
    * Writes to a NEW path on purpose: an in-place rewrite of a live index
    * would race concurrent probes (the same staleness contract as the
    * barrier caches); atomically swapping `targetPath` into service is the
    * deployment's move/rename concern.
    */
  def compactSemIndex(spark: org.apache.spark.sql.SparkSession,
      path: String, targetPath: String, filesPerCell: Int = 1): Unit = {
    require(filesPerCell >= 1, s"filesPerCell must be >= 1, got $filesPerCell")
    IndexLifecycle.requireDistinctPaths(spark, path, targetPath, "compactSemIndex")
    // read + validate the centroid artifact BEFORE the corpus-sized
    // rewrite: a non-writeSemIndex source fails in milliseconds instead of
    // leaving a half-written target with cell data but no _centroids
    val cents = ivfReadCentroids(spark, path)
    require(cents.nonEmpty,
      s"compactSemIndex: empty _centroids at $path — not a writeSemIndex artifact")
    // streaming-ingest subtrees fold into the compacted base — the
    // compacted index starts with a clean _ingest slate
    val baseSchema = spark.read.parquet(path).schema
    val all = semIndexRoots(spark, path)
      .map(r => spark.read.schema(baseSchema).parquet(r))
      .reduce(_ unionByName _)
    IndexLifecycle.clusterForPartitionedWrite(all,
        "centroid_id", filesPerPartition = filesPerCell)
      .write.partitionBy("centroid_id").mode("overwrite").parquet(targetPath)
    writeCentroids(spark, cents, targetPath)
  }

  /** The append-only SEMANTIC ingest loop as one Structured Streaming
    * query — the vector analog of [[Dedup.streamingIngest]]: per
    * microbatch, (1) semantic dedup WITHIN the batch ([[semDedupFlag]]
    * with the index's centroids — the index only knows about previous
    * batches), (2) drop rows dominated by an indexed member
    * ([[cleanSemAgainstIndex]]), (3) hand survivors to `sink`,
    * (4) [[ingestSemBatch]] them so the next batch dedups against them.
    * Same delivery semantics as the text/signature loops: a replayed
    * batch OVERWRITES its own staged subtree and its probe EXCLUDES that
    * subtree, so the replay sees exactly the pre-batch index state and
    * reproduces its original clean set; `sink` must be idempotent, the
    * standard `foreachBatch` contract. `maxLiveSubtrees` (0 = off) is the
    * shared in-loop auto-compaction trigger ([[IndexLifecycle
    * .compactOwnSubtrees]]).
    */
  def streamingSemIngest(stream: DataFrame, idCol: String, vecCol: String,
      indexPath: String, checkpointDir: String,
      sink: (DataFrame, Long) => Unit, tau: Double,
      maxBatchRows: Int = 1 << 20,
      maxLiveSubtrees: Int = 0): org.apache.spark.sql.streaming.StreamingQuery = {
    val tag = IndexLifecycle.queryTagOf(stream.sparkSession, checkpointDir)
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        maybeCompactSemIngest(batch.sparkSession, indexPath, tag, batchId,
          maxLiveSubtrees)
        val b = batch.persist()
        try {
          val cents = ivfReadCentroids(b.sparkSession, indexPath)
          // persisted: the probe's guard count, its cell collect, its
          // broadcast build, and the clean anti-join would otherwise each
          // recompute the within-batch dedup (which, unlike the text
          // analog's signature barriers, has no internal cache)
          val inBatch = semDedup(b.toDF(), idCol, vecCol, cents, tau)
            .drop("centroid_id").persist()
          try {
            // a REPLAY must not probe its own previous append
            val own = IndexLifecycle.ingestBatchDir(indexPath, tag, batchId)
            val clean = cleanSemAgainstIndex(inBatch, idCol, vecCol,
              indexPath, tau, maxBatchRows,
              excludeSubtree = Some(own)).persist()
            try {
              sink(clean, batchId)
              ingestSemBatch(clean, idCol, vecCol, indexPath, tag, batchId)
            } finally { clean.unpersist(); () }
          } finally { inBatch.unpersist(); () }
        } finally { b.unpersist(); () }
      }
      .start()
  }

  /** The loop's `maxLiveSubtrees` trigger ([[IndexLifecycle
    * .compactOwnSubtrees]] mechanics): the query's accumulated cell
    * subtrees fold into one under the base cell-partitioned layout.
    * Row-identical union → every later probe is bit-identical; only the
    * file/subtree count collapses. 0 disables.
    */
  private[operators] def maybeCompactSemIngest(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      queryTag: String, batchId: Long, maxLiveSubtrees: Int): Boolean =
    maxLiveSubtrees > 0 &&
      IndexLifecycle.compactOwnSubtrees(spark, indexPath, queryTag, batchId,
          maxLiveSubtrees) { (sources, tmp) =>
        // base-schema inference only when a fold actually runs (the hook
        // fires per batch; inference per batch was pure listing overhead)
        val baseSchema = spark.read.parquet(indexPath).schema
        val all = sources.map(s => spark.read.schema(baseSchema).parquet(s))
          .reduce(_ unionByName _)
        IndexLifecycle.clusterForPartitionedWrite(all, "centroid_id")
          .write.mode("overwrite").partitionBy("centroid_id").parquet(tmp)
      }

  /** Johnson–Lindenstrauss random projection to `outDim` dimensions:
    * `y_j = dot(x, r_j) / sqrt(outDim)` with the deterministic ±1
    * hyperplanes the LSH machinery already uses (Achlioptas'01 sign
    * matrices satisfy the JL lemma) — so E[‖y‖²] = ‖x‖² and pairwise
    * distances distort by ~1/√outDim. Pure map-side (the matrix is
    * `outDim` literal arrays unrolled into codegen'd [[dot]] folds — no
    * shuffle, no UDF); the standard cheap prefilter ahead of exact
    * distances: project 64→16 and a brute-force scan reads/multiplies 4×
    * less, re-ranking survivors at full precision.
    */
  def projectJL(vecCol: Column, outDim: Int,
      dim: Int = Vectors.Dim): Column = {
    require(outDim >= 1, s"outDim must be >= 1, got $outDim")
    val scale = math.sqrt(outDim.toDouble)
    array((0 until outDim).map { j =>
      dot(vecCol, array(Vectors.hyperplane(j, dim)
        .toIndexedSeq.map(lit(_)): _*)) / scale
    }: _*)
  }

  /** Brute-force top-k with a [[projectJL]] PREFILTER: rank the corpus by
    * cosine in `outDim`-dimensional projected space, keep the top
    * k × `overfetch` candidates, then re-rank ONLY those by the exact
    * full-dimension cosine. The scan multiplies `outDim`/dim as much per
    * row (64→8 is 8× less arithmetic on the corpus leg); the exact stage
    * touches k × overfetch rows. Recall is the JL trade — distances
    * distort by ~1/√outDim, so a true neighbor outside the inflated
    * candidate set is missed; raise `overfetch` (or `outDim`) to converge
    * on [[bruteForceTopK]]. Plan shape: scan → project → TakeOrdered
    * (k × overfetch) → exact re-rank of a driver-bounded candidate set —
    * the corpus never shuffles.
    *
    * COST HONESTY: projecting inside the query scan costs outDim × dim
    * multiplies per row — MORE than the single exact cosine it avoids. The
    * prefilter pays only when the projection is computed ONCE and scanned
    * narrow across many queries: materialize `projectJL(vec)` as a column
    * (one corpus pass, outDim/dim the storage), then pass its name as
    * `projCol` — each query's coarse stage reads outDim doubles per row
    * instead of dim floats and does outDim multiplies. The default (null
    * `projCol`) projects inline, correct but only sensible for one-off
    * calls and tests.
    */
  def bruteForceTopKProjected(corpus: DataFrame, idCol: String,
      vecCol: String, queryVec: Array[Float], k: Int,
      outDim: Int = 8, overfetch: Int = 4,
      dim: Int = Vectors.Dim, projCol: String = null): DataFrame = {
    require(k >= 1 && overfetch >= 1,
      s"need k >= 1 and overfetch >= 1, got k=$k overfetch=$overfetch")
    if (projCol != null) {
      // fail loud on a width mismatch: FloatVecDot would return null for
      // every row and the "candidate set" would silently become the
      // k×overfetch lowest ids regardless of similarity
      // sample a NON-NULL projection: size(null) is null and getInt would
      // throw an opaque NPE instead of the descriptive message (an
      // all-null column sails through — FloatVecDot nulls are the
      // documented behavior for null rows)
      corpus.filter(col(projCol).isNotNull)
        .select(size(col(projCol))).limit(1).collect().headOption
        .foreach { r =>
          require(r.getInt(0) == outDim,
            s"projCol '$projCol' holds ${r.getInt(0)}-dim projections but " +
              s"outDim=$outDim — pass the outDim the column was " +
              "materialized with")
        }
    }
    val q = array(queryVec.toIndexedSeq.map(lit(_)): _*)
    val qp = projectJL(q, outDim, dim)
    val p = if (projCol != null) col(projCol)
      else projectJL(col(vecCol), outDim, dim)
    val cand = corpus
      .withColumn("__pcos", cosDiv(dot(p, qp), norm(p) * norm(qp)))
      .orderBy(col("__pcos").desc, col(idCol))
      .limit(k * overfetch)
    cand
      .withColumn("cosine", cosDiv(dot(col(vecCol), q), norm(col(vecCol)) * norm(q)))
      .orderBy(col("cosine").desc, col(idCol))
      .limit(k)
      .select(col(idCol), col("cosine"))
  }

  /** Int8 symmetric quantization of a float-vector column: per row,
    * `q_scale = 127 / max|x|` and `q_vec(i) = ⌊x_i·scale + 0.5⌋ ∈
    * [−127, 127]` (an all-zero vector quantizes to zeros with scale 0).
    * Pure map-side — 4× smaller candidate scans for ANN at any corpus size.
    */
  def quantizeInt8(df: DataFrame, vecCol: String): DataFrame = {
    require(!df.columns.contains("q_scale") && !df.columns.contains("q_vec"),
      "input already has a q_scale/q_vec column; rename it before quantizing")
    val maxAbs = aggregate(col(vecCol), lit(0.0),
      (acc, x) => greatest(acc, abs(x.cast("double"))))
    df.withColumn("q_scale", when(maxAbs === 0.0, 0.0).otherwise(lit(127.0) / maxAbs))
      .withColumn("q_vec", transform(col(vecCol),
        x => floor(x.cast("double") * col("q_scale") + 0.5).cast("int")))
  }

  /** One k-means (Lloyd) update step: assign each row to its max-cosine
    * centroid, then emit per-cluster sufficient statistics — count and
    * per-dimension element sums, with elements quantized to an integer grid
    * (`quantScale`) BEFORE summing so the result is row-order independent
    * and exact. Output: (cid, n, sums: array<long>). The caller's training
    * loop divides sums by n, re-collects centroids, and iterates.
    *
    * Ill-formed rows FAIL the job (no silent skip): a ragged vector, a null
    * element, or a whole-NULL vector value (`size(NULL) = -1` ≠ dim) all
    * trip the well-formed guard — scrub or filter nulls upstream if they
    * are expected.
    */
  def kmeansStep(corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Seq[(Int, Array[Float])], quantScale: Long = 1000000L): DataFrame = {
    // an empty centroid set would make dim fall back to 0 and the guard
    // below reject every non-empty vector with a misleading message
    require(centroids.nonEmpty, "kmeansStep requires at least one centroid")
    val dim = centroids.head._2.length
    // a ragged or null-element vector would silently skew n vs the
    // per-dimension sums (count(posexplode) != rows, sum skips nulls) —
    // fail the job loudly instead; assert_true rides inside the projected
    // expression so Catalyst can't prune it away
    val wellFormed = size(col(vecCol)) === lit(dim) &&
      !exists(col(vecCol), x => x.isNull)
    val xq = when(assert_true(wellFormed,
        concat(lit(s"kmeansStep: vector size != centroid dim $dim or null " +
          "element in "), col(vecCol).cast("string"))).isNull,
      transform(col(vecCol),
        x => floor(x.cast("double") * quantScale + 0.5).cast("long")))
    // posexplode → scalar two-phase agg: map-side partials shrink the
    // shuffle to clusters × dims rows, and no aggregation buffer ever holds
    // more than one running sum (a collect_list of member vectors would hold
    // O(cluster size) — the thing this shape exists to avoid). The final
    // per-cluster regroup collects exactly `dim` scalars back into the array.
    ivfAssign(corpus, idCol, vecCol, centroids)
      .select(col("centroid_id").as("cid"), posexplode(xq).as(Seq("pos", "xqv")))
      .groupBy(col("cid"), col("pos"))
      .agg(sum(col("xqv")).as("s"), count(lit(1)).as("cnt"))
      .groupBy(col("cid"))
      .agg(max(col("cnt")).as("n"),
        transform(array_sort(collect_list(struct(col("pos"), col("s")))),
          e => e.getField("s")).as("sums"))
  }

  /** Train IVF centroids: `iters` Lloyd iterations from the given seeds.
    * Each iteration is one distributed [[kmeansStep]]; only k × dim integer
    * sums return to the driver per iteration (a documented-small collect,
    * like [[collectCentroids]] — centroid sets are tiny at any corpus
    * scale). Clusters that lose all members keep their previous centroid.
    */
  def kmeansFit(corpus: DataFrame, idCol: String, vecCol: String,
      seeds: Seq[(Int, Array[Float])], iters: Int,
      quantScale: Long = 1000000L): Seq[(Int, Array[Float])] = {
    var cents = seeds
    for (_ <- 0 until iters) {
      val stats = kmeansStep(corpus, idCol, vecCol, cents, quantScale)
        .collect()
        .map(r => r.getInt(0) -> ((r.getLong(1), r.getSeq[Long](2)))).toMap
      cents = cents.map { case (cid, prev) =>
        stats.get(cid) match {
          case Some((n, sums)) if n > 0 =>
            cid -> sums.map(s => (s.toDouble / quantScale / n).toFloat).toArray
          case _ => cid -> prev
        }
      }
    }
    cents
  }

  /** k-means|| seeding (Bahmani et al., "Scalable k-means++", VLDB'12 — a
    * published algorithm, re-expressed as DataFrame passes): instead of
    * k-means++'s k strictly sequential corpus scans, run `rounds` scans that
    * each OVERSAMPLE ~`l` candidates with probability ∝ distance to the
    * nearest seed so far, then reduce the ~l·rounds candidates to k seeds
    * driver-side (weighted farthest-point, deterministic). Every distributed
    * pass is a map-side fold over a broadcast candidate array (the
    * [[ivfAssign]] shape — no join, no shuffle except one count-per-cell
    * aggregation), so seeding a 10⁹-row corpus costs `rounds`+1 scans.
    *
    * Distance is the cosine complement (1 − cos), matching [[ivfAssign]]'s
    * assignment geometry. Sampling is HASH-randomized — `xxhash64(id,
    * round, seed)` — so the result is deterministic for a given `seed`
    * (reproducible pipelines, property-testable), while remaining unbiased
    * across ids. Returns exactly `min(k, distinct candidates)` seeds,
    * ids 0..k-1.
    */
  def kmeansSeedParallel(corpus: DataFrame, idCol: String, vecCol: String,
      k: Int, l: Int = 0, rounds: Int = 5, seed: Long = 42L): Seq[(Int, Array[Float])] = {
    require(k >= 1, s"k must be >= 1, got $k")
    val overs = if (l > 0) l else 2 * k // paper's recommended l ≈ 2k
    // first seed: the hash-minimal row — an arbitrary-but-deterministic pick
    val firstRows = corpus
      .select(col(idCol), col(vecCol))
      .orderBy(xxhash64(col(idCol), lit(seed)), col(idCol)).limit(1)
      .collect()
    require(firstRows.nonEmpty, "kmeansSeedParallel: corpus is empty")
    val first = firstRows.head.getAs[Seq[Float]](1).toArray
    var cand = Vector[Array[Float]](first)
    for (round <- 0 until rounds) {
      val cents = cand.zipWithIndex.map { case (v, i) => (i, v) }
      // one map-side pass: distance to nearest candidate + hash coin flip.
      // cost (Σ d) and the sample ride the same scan via two branches of one
      // cached assignment — at scale this is the pass the paper prescribes.
      val assigned = ivfAssign(corpus.select(col(idCol), col(vecCol)),
          idCol, vecCol, cents)
        .withColumn("__d", lit(1.0) - col("cosine"))
        .localCheckpoint()
      val cost = assigned.agg(sum(col("__d"))).collect().head.getDouble(0)
      if (cost <= 0) return finishSeeds(cand, corpus, idCol, vecCol, k)
      val p = col("__d") * overs / cost
      val coin = pmod(xxhash64(col(idCol), lit(round), lit(seed)), lit(1000000L))
        .cast("double") / 1000000.0
      val picked = assigned.filter(coin < p)
        .select(col(vecCol)).collect().map(_.getAs[Seq[Float]](0).toArray)
      cand ++= picked
    }
    finishSeeds(cand, corpus, idCol, vecCol, k)
  }

  /** One-call IVF index build: k-means‖ seed → `iters` Lloyd refinements →
    * cell assignment. Returns (assigned corpus, trained centroids); persist
    * the DataFrame `partitionBy("centroid_id")` and serve queries with
    * [[ivfSearchTopK]]. Total cost: seed scans + iters kmeansStep passes +
    * one assignment scan — every stage's driver traffic is O(k × dim).
    */
  def ivfBuild(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int = 5, seed: Long = 42L): (DataFrame, Seq[(Int, Array[Float])]) = {
    val seeds = kmeansSeedParallel(corpus, idCol, vecCol, k, seed = seed)
    val cents = kmeansFit(corpus, idCol, vecCol, seeds, iters)
    (ivfAssign(corpus, idCol, vecCol, cents), cents)
  }

  /** Persist an assigned corpus as the SERVING layout: parquet partitioned
    * by cell, so [[ivfSearchTopK]]'s `centroid_id` filter is answered by
    * PARTITION PRUNING at the source — the query job lists and reads only
    * the `nprobe` probed cells' files (nprobe/k of the corpus), never
    * opening the rest (PlanSpec-asserted on the selected file set). This is
    * the step that turns the IVF index from a plan-shape claim into a
    * physical layout.
    *
    * Salt-clustered on the cell before the write
    * ([[IndexLifecycle.clusterForPartitionedWrite]]): `partitionBy` alone emits one
    * file per (input task × cell) — at a 3200-task corpus that was ~25k
    * files and a probe 13× file-bound (SCALE.md "semantic index probe").
    */
  def ivfWrite(assigned: DataFrame, path: String): Unit =
    IndexLifecycle.clusterForPartitionedWrite(assigned, "centroid_id")
      .write.partitionBy("centroid_id").mode("overwrite").parquet(path)

  /** Read back an [[ivfWrite]]-persisted index for [[ivfSearchTopK]] —
    * base tree UNIONED with every published streaming-ingest subtree
    * (same rule as [[Pq.readIndex]]), so a search over a live-ingested
    * index sees every appended vector.
    */
  def ivfRead(spark: org.apache.spark.sql.SparkSession, path: String): DataFrame = {
    val base = spark.read.parquet(path)
    val ingest = IndexLifecycle.listIngestDirs(spark, path)
    if (ingest.isEmpty) base
    else (base +: ingest.map(spark.read.schema(base.schema).parquet(_)))
      .reduce(_ unionByName _)
  }

  /** [[ivfWrite]] plus the trained centroids persisted INSIDE the index at
    * `path/_centroids` — underscore-prefixed, so parquet partition
    * discovery ignores it and [[ivfRead]] still sees only cell data. A
    * serving process then needs nothing but the path: [[ivfReadCentroids]]
    * + [[ivfRead]] + [[ivfJoinTopK]]/[[ivfSearchTopK]].
    */
  def ivfWriteWithCentroids(assigned: DataFrame,
      centroids: Seq[(Int, Array[Float])], path: String): Unit = {
    ivfWrite(assigned, path)
    writeCentroids(assigned.sparkSession, centroids, path)
  }

  /** The ONE definition of the `_centroids` artifact layout (cid/cvec,
    * single file, `$path/_centroids`) — [[ivfWriteWithCentroids]] and
    * [[compactSemIndex]] both write it, [[ivfReadCentroids]] reads it.
    */
  private[operators] def writeCentroids(spark: org.apache.spark.sql.SparkSession,
      centroids: Seq[(Int, Array[Float])], path: String): Unit = {
    import spark.implicits._
    centroids.toDF("cid", "cvec")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/_centroids")
  }

  /** Centroids persisted by [[ivfWriteWithCentroids]], in the driver-side
    * shape every search/build API takes.
    */
  def ivfReadCentroids(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[(Int, Array[Float])] =
    collectCentroids(spark.read.parquet(s"$path/_centroids"), "cid", "cvec")

  /** Reduce k-means|| candidates to k seeds: weight each candidate by its
    * cell population (one distributed count pass), then run deterministic
    * weighted farthest-point selection over the ≤ l·rounds candidates on
    * the driver (candidate sets are tiny at any corpus scale).
    */
  private def finishSeeds(cand: Seq[Array[Float]], corpus: DataFrame,
      idCol: String, vecCol: String, k: Int): Seq[(Int, Array[Float])] = {
    val distinctCand = cand.map(_.toSeq).distinct.map(_.toArray)
    if (distinctCand.length <= k)
      return distinctCand.zipWithIndex.map { case (v, i) => (i, v) }
    val cents = distinctCand.zipWithIndex.map { case (v, i) => (i, v) }
    val weights = ivfAssign(corpus.select(col(idCol), col(vecCol)),
        idCol, vecCol, cents)
      .groupBy("centroid_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    def cosD(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1 }
      if (na == 0 || nb == 0) -1.0 else d / math.sqrt(na * nb)
    }
    // start from the heaviest candidate; repeatedly add the candidate with
    // max weight × distance-to-chosen — the deterministic counterpart of
    // weighted k-means++ sampling
    var chosen = Vector(cents.maxBy(c => (weights.getOrElse(c._1, 0L), -c._1))._1)
    while (chosen.length < k) {
      val next = cents.filterNot(c => chosen.contains(c._1))
        .maxBy { case (cid, v) =>
          val d = chosen.map(cc => 1.0 - cosD(v,
            cents.find(_._1 == cc).get._2)).min
          (weights.getOrElse(cid, 0L) * d, -cid)
        }._1
      chosen :+= next
    }
    chosen.zipWithIndex.map { case (cid, i) =>
      (i, cents.find(_._1 == cid).get._2) }
  }
}

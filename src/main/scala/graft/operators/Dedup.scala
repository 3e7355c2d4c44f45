package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.queries.TextQueries

/** Corpus deduplication operators for training-data pipelines, as reusable
  * DataFrame transforms. Scale shapes:
  *  - exact/fingerprint: one shuffle on a 128-bit hash; state = one row per
  *    distinct content.
  *  - MinHash-LSH: signatures are a narrow projection (doc_id + 32 ints);
  *    candidate generation shuffles on band-hash (bounded buckets); the
  *    verify join touches only candidate pairs. No stage is all-pairs.
  */
object Dedup {

  /** Exact dedup: keep the lowest-id row per identical content.
    *
    * Single-pass shape: `groupBy(md5).agg(min_by(row, id))` — ONE shuffle of
    * the corpus, with the map-side partial aggregate collapsing duplicate
    * content before it ships, no join-back, no sort, and no keep-set to
    * broadcast (at 100 TB that set is corpus-sized — a join-back would be a
    * second full shuffle).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    keepMinBy(df, idCol, md5(col(textCol)))

  /** Fingerprint dedup: normalization-invariant (case/punctuation/word-order)
    * content identity = md5 of sorted distinct tokens.
    */
  def fingerprint(c: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(TextQueries.tokensCol(c)))))

  def byFingerprint(df: DataFrame, idCol: String, textCol: String): DataFrame =
    keepMinBy(df, idCol, fingerprint(col(textCol)))

  /** Shared single-shuffle survivor selection: lowest `idCol` row per
    * `key` value, original columns and order preserved.
    */
  private def keepMinBy(df: DataFrame, idCol: String, key: Column): DataFrame = {
    val cols = df.columns
    df.groupBy(key.as("__k"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("__row"))
      .select(cols.map(c => col(s"__row.$c").as(c)): _*)
  }

  /** MinHash signature columns m0..m{n-1} for a text column (3-word
    * shingles, md5-derived hashes — deterministic, no fitted model).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import TextQueries.{P, hash32, perms, ngramsCol}
    graft.functions.Md5Prefix32.register(df.sparkSession)
    graft.functions.MinHashSigAgg.register(df.sparkSession)
    // docs with <3 tokens drop out: ngramsCol is empty there, explode drops it
    val shingled = df
      .select(col(idCol), explode(ngramsCol(col(textCol), 3)).as("__s"))
      .select(col(idCol), (hash32(col("__s")) % P).as("__h"))
    // one TypedImperativeAggregate computes all minima in a single buffer
    shingled.groupBy(col(idCol))
      .agg(graft.functions.MinHashSigAgg.minhashSig(col("__h")).as("__sig"))
      .select(col(idCol) +: perms.indices.map(j => col("__sig")(j).as(s"m$j")): _*)
  }

  /** Production default for [[Lsh.candidatePairs]]'s hot-bucket guard: far
    * above any organic bucket at test SFs (max observed band-bucket size at
    * sf0.1 is single digits) yet bounding a boilerplate bucket of millions to
    * n−1 star pairs instead of C(n,2).
    */
  val DefaultHotBucketThreshold = 1024

  /** LSH candidate pairs from signatures: bands of `rowsPerBand` minima;
    * pairs sharing any band hash. `bands × rowsPerBand` must equal the
    * signature width. Hot buckets (size > `hotBucketThreshold`, ON by
    * default) star-link to the bucket's lowest id — see
    * [[Lsh.candidatePairs]] for the guard's semantics and why truncation
    * would be wrong.
    */
  def lshCandidates(sigs: DataFrame, idCol: String, bands: Int = 8,
      rowsPerBand: Int = 4,
      hotBucketThreshold: Int = DefaultHotBucketThreshold): DataFrame = {
    val bandHashes = array((0 until bands).map { b =>
      md5(concat_ws(",", (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}")): _*))
    }: _*)
    val exploded = sigs.select(col(idCol), posexplode(bandHashes).as(Seq("band", "bh")))
    Lsh.candidatePairs(exploded, idCol, Seq("band", "bh"), hotBucketThreshold)
  }

  /** Near-duplicate pairs: LSH candidates whose estimated Jaccard (agreeing
    * permutation fraction) passes `minAgreeFraction`.
    */
  def nearDuplicates(df: DataFrame, idCol: String, textCol: String,
      minAgreeFraction: Double = 0.5,
      hotBucketThreshold: Int = DefaultHotBucketThreshold): DataFrame = {
    import TextQueries.NumPerm
    val sigs = minhashSignatures(df, idCol, textCol).persist()
    val cand = lshCandidates(sigs, idCol, hotBucketThreshold = hotBucketThreshold)
    val agree = (0 until NumPerm)
      .map(j => when(col(s"a.m$j") === col(s"b.m$j"), 1).otherwise(0))
      .reduce(_ + _)
    cand.join(sigs.as("a"), col(s"a.$idCol") === col("ida"))
      .join(sigs.as("b"), col(s"b.$idCol") === col("idb"))
      .select(col("ida"), col("idb"), agree.as("agreeing"))
      .filter(col("agreeing") >= math.ceil(minAgreeFraction * NumPerm).toInt)
  }

  /** Connected-components clustering of near-dup pairs: every id in `nodes`
    * gets the MINIMUM id of its undirected component as `rep` — the step
    * that turns pair lists into dedup CLUSTERS (keep the representative,
    * drop or review the rest). Pair-free nodes are their own rep.
    *
    * Algorithm: iterative min-label propagation — each round a node's label
    * becomes the min of its own and its neighbors' labels; `localCheckpoint`
    * keeps the lineage flat; convergence takes component-diameter rounds.
    * Dedup graphs keep that small by construction: hot buckets star-link
    * (diameter ≤ 2 per bucket), so long chains only arise from genuine
    * overlap bridges. Each round is one shuffle join + one aggregation over
    * the edge list — no step is ever quadratic. `maxIter` caps pathological
    * inputs, and non-convergence THROWS instead of returning a wrong
    * clustering. At extreme diameters swap the round body for the
    * large-star/small-star rule (Kiveris et al., "Connected Components in
    * MapReduce and Beyond") — same fixpoint, O(log²) rounds.
    */
  def connectedComponents(pairs: DataFrame, nodes: DataFrame, idCol: String,
      maxIter: Int = 20): DataFrame = {
    val e = pairs.select(col("ida").as("a"), col("idb").as("b"))
      .unionByName(pairs.select(col("idb").as("a"), col("ida").as("b")))
      .localCheckpoint()
    var labels = nodes.select(col(idCol).as("id"), col(idCol).as("rep"))
      .localCheckpoint()
    var changed = 1L
    var i = 0
    while (changed > 0 && i < maxIter) {
      // one join per round: keep (rep, neighbor-min) side by side so the
      // convergence count reads the SAME checkpointed result the next
      // round's labels derive from — no second join, no recompute
      val nbr = e.join(labels, col("b") === col("id"))
        .groupBy("a").agg(min("rep").as("nrep"))
      val merged = labels.join(nbr, col("id") === col("a"), "left")
        .select(col("id"), col("rep"),
          coalesce(col("nrep"), col("rep")).as("nrep"))
        .localCheckpoint()
      changed = merged.filter(col("nrep") < col("rep")).count()
      labels = merged.select(col("id"), least(col("rep"), col("nrep")).as("rep"))
      i += 1
    }
    require(changed == 0,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "component diameter exceeds the cap; raise maxIter or switch the " +
        "round body to large-star/small-star")
    labels.select(col("id").as(idCol), col("rep"))
  }

  /** One-call near-dup DEDUPLICATION: MinHash-LSH pairs →
    * [[connectedComponents]] clusters → keep each cluster's minimum-id doc
    * (and every pair-free doc). The end-to-end form of the pipeline whose
    * stages are individually oracle-checked (`q_dedup_minhash`,
    * `q_dedup_clusters`); semi join keeps the corpus scan narrow.
    */
  def dedupNear(df: DataFrame, idCol: String, textCol: String,
      minAgreeFraction: Double = 0.5,
      hotBucketThreshold: Int = DefaultHotBucketThreshold): DataFrame = {
    val pairs = nearDuplicates(df, idCol, textCol, minAgreeFraction,
      hotBucketThreshold)
    val survivors = connectedComponents(pairs, df, idCol)
      .filter(col("rep") === col(idCol)).select(idCol)
    df.join(survivors, Seq(idCol), "left_semi")
  }

  /** SimHash (16-bit) column pipeline: near-dups differ in few bits. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import TextQueries.{hash32, tokensCol}
    graft.functions.Md5Prefix32.register(df.sparkSession)
    val toks = df.select(col(idCol),
        explode(tokensCol(col(textCol))).as("__tok"))
      .select(col(idCol), hash32(col("__tok")).as("__th"))
    val sums = (0 until 16).map(b =>
      sum(when(shiftright(col("__th"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"s$b"))
    val sig = (0 until 16).map(b => when(col(s"s$b") > 0, 1 << b).otherwise(0)).reduce(_ + _)
    toks.groupBy(col(idCol)).agg(sums.head, sums.tail: _*)
      .select(col(idCol), sig.as("simhash"))
  }
}
